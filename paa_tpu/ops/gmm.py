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

sklearn's convergence test (mean-log-likelihood change < tol=1e-3,
checked after each M-step) is reproduced per batch row by freezing a
row's parameters once it converges, inside a fixed-length scan; this
matters on near-unimodal candidate sets where running EM to its true
fixed point moves the pos/neg split by a sample or two relative to
sklearn's early stop (validated directly against installed sklearn in
tests/test_gmm.py). Masked-out entries carry zero responsibility weight
and never affect the fit.
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


def gmm_fit_predict(values, valid, num_iters=100, tol=1e-3):
    """Fit a 2-component 1-D GMM to masked values; classify and score them.

    Args:
        values: (..., K) float — samples (candidate losses).
        valid:  (..., K) bool — which samples participate in the fit.
        num_iters: scan length (sklearn ``max_iter`` analogue).
        tol: per-row convergence threshold on the mean log-likelihood
            change (sklearn ``tol``); converged rows freeze.

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
    prev_lb = jnp.full(n_valid.shape, -jnp.inf, jnp.float32)
    converged = jnp.zeros(n_valid.shape, bool)

    def em_step(state, _):
        means, variances, weights, prev_lb, converged = state
        # E step (also yields the pre-update mean log-likelihood, which
        # sklearn uses for its convergence check AFTER the M step)
        log_prob = _component_log_prob(values, means, variances, weights)
        lse = jax.scipy.special.logsumexp(log_prob, axis=-1)  # (..., K)
        lb = (lse * validf).sum(axis=-1) / n_valid
        resp = jax.nn.softmax(log_prob, axis=-1)  # (..., K, 2)
        resp = resp * validf[..., :, None]
        # M step
        nk = resp.sum(axis=-2) + 1e-12  # (..., 2)
        new_means = (resp * values[..., :, None]).sum(axis=-2) / nk
        diff = values[..., :, None] - new_means[..., None, :]
        new_vars = (resp * diff * diff).sum(axis=-2) / nk + _REG_COVAR
        new_weights = nk / n_valid[..., None]
        # rows already converged keep their parameters frozen
        upd = (~converged)[..., None]
        means = jnp.where(upd, new_means, means)
        variances = jnp.where(upd, new_vars, variances)
        weights = jnp.where(upd, new_weights, weights)
        new_prev = jnp.where(converged, prev_lb, lb)
        converged = converged | (jnp.abs(lb - prev_lb) < tol)
        return (means, variances, weights, new_prev, converged), None

    (means, variances, weights, _, _), _ = jax.lax.scan(
        em_step,
        (means, variances, weights, prev_lb, converged),
        None,
        length=num_iters,
    )

    log_prob = _component_log_prob(values, means, variances, weights)
    components = jnp.argmax(log_prob, axis=-1).astype(jnp.int32)
    scores = jax.scipy.special.logsumexp(log_prob, axis=-1)
    return components, scores
