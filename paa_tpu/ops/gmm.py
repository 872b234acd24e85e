"""Vectorized 2-component 1-D Gaussian-mixture EM.

Replaces the reference's per-GT ``sklearn.mixture.GaussianMixture(2).fit``
on CPU numpy (paa_core/modeling/rpn/paa/loss.py:190-203) — the single
biggest host-device serialization point in the reference training loop —
with a batched, fixed-iteration, masked EM that runs on-device inside the
jitted train step over a ``(..., K)`` tensor of candidate losses.

Matches sklearn semantics for this restricted use:
- full covariance on 1-D data, ``reg_covar=1e-6``
- ``weights_init=[.5,.5]``, ``means_init=[[min],[max]]``, precisions 1.0
- ``predict`` = argmax responsibility, ``score_samples`` = logsumexp of
  weighted component log-pdfs.

Instead of sklearn's convergence test we run a fixed number of iterations
(EM on <=45 scalar samples converges in a handful of steps); masked-out
entries carry zero responsibility weight and never affect the fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_REG_COVAR = 1e-6
_LOG_2PI = 1.8378770664093453


def _component_log_prob(x, means, variances, weights):
    """log w_k + log N(x | mu_k, var_k) for k=0,1.

    x: (..., K); means/variances/weights: (..., 2).
    Returns (..., K, 2).
    """
    diff = x[..., :, None] - means[..., None, :]
    var = variances[..., None, :]
    log_pdf = -0.5 * (diff * diff / var + jnp.log(var) + _LOG_2PI)
    return log_pdf + jnp.log(weights[..., None, :])


def gmm_fit_predict(values, valid, num_iters=64):
    """Fit a 2-component 1-D GMM to masked values; classify and score them.

    Args:
        values: (..., K) float — samples (candidate losses).
        valid:  (..., K) bool — which samples participate in the fit.
        num_iters: fixed EM iteration count.

    Returns:
        components: (..., K) int32 — argmax-responsibility component
            (0 = low-mean/foreground, 1 = high-mean/background).
        scores: (..., K) float32 — per-sample log-likelihood
            (sklearn ``score_samples``).
    """
    values = values.astype(jnp.float32)
    validf = valid.astype(jnp.float32)
    n_valid = jnp.maximum(validf.sum(axis=-1), 1.0)  # (...,)

    big = jnp.float32(1e30)
    vmin = jnp.min(jnp.where(valid, values, big), axis=-1)
    vmax = jnp.max(jnp.where(valid, values, -big), axis=-1)
    # Degenerate all-invalid rows: fall back to [0, 1] inits (outputs unused).
    any_valid = valid.any(axis=-1)
    vmin = jnp.where(any_valid, vmin, 0.0)
    vmax = jnp.where(any_valid, vmax, 1.0)

    means = jnp.stack([vmin, vmax], axis=-1)  # (..., 2)
    variances = jnp.ones_like(means)  # precisions_init = 1.0
    weights = jnp.full_like(means, 0.5)

    def em_step(state, _):
        means, variances, weights = state
        # E step
        log_prob = _component_log_prob(values, means, variances, weights)
        resp = jax.nn.softmax(log_prob, axis=-1)  # (..., K, 2)
        resp = resp * validf[..., :, None]
        # M step
        nk = resp.sum(axis=-2) + 1e-12  # (..., 2)
        new_means = (resp * values[..., :, None]).sum(axis=-2) / nk
        diff = values[..., :, None] - new_means[..., None, :]
        new_vars = (resp * diff * diff).sum(axis=-2) / nk + _REG_COVAR
        new_weights = nk / n_valid[..., None]
        return (new_means, new_vars, new_weights), None

    (means, variances, weights), _ = jax.lax.scan(
        em_step, (means, variances, weights), None, length=num_iters
    )

    log_prob = _component_log_prob(values, means, variances, weights)
    components = jnp.argmax(log_prob, axis=-1).astype(jnp.int32)
    scores = jax.scipy.special.logsumexp(log_prob, axis=-1)
    return components, scores
