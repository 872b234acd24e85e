"""Tests for the vectorized GMM-EM against a faithful numpy replica of
sklearn.mixture.GaussianMixture as configured by the reference
(paa_core/modeling/rpn/paa/loss.py:192-203): 2 components, 1-D, full
covariance, weights [.5,.5], means [min,max], precisions 1.0."""

import numpy as np
import jax.numpy as jnp

from paa_tpu.ops.gmm import gmm_fit_predict


def sklearn_like_gmm(x, max_iter=100, tol=1e-3, reg_covar=1e-6):
    """Numpy EM mirroring sklearn's GaussianMixture on 1-D data."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    means = np.array([x.min(), x.max()])
    variances = np.array([1.0, 1.0])
    weights = np.array([0.5, 0.5])
    prev_lb = -np.inf
    for _ in range(max_iter):
        log_prob = (
            -0.5 * ((x[:, None] - means[None]) ** 2 / variances[None]
                    + np.log(variances[None]) + np.log(2 * np.pi))
            + np.log(weights[None])
        )
        lse = np.logaddexp(log_prob[:, 0], log_prob[:, 1])
        resp = np.exp(log_prob - lse[:, None])
        lb = lse.mean()
        nk = resp.sum(0) + 1e-12
        means = (resp * x[:, None]).sum(0) / nk
        variances = (resp * (x[:, None] - means[None]) ** 2).sum(0) / nk + reg_covar
        weights = nk / n
        if abs(lb - prev_lb) < tol:
            break
        prev_lb = lb
    log_prob = (
        -0.5 * ((x[:, None] - means[None]) ** 2 / variances[None]
                + np.log(variances[None]) + np.log(2 * np.pi))
        + np.log(weights[None])
    )
    components = log_prob.argmax(1)
    scores = np.logaddexp(log_prob[:, 0], log_prob[:, 1])
    return components, scores


def test_bimodal_split_matches_reference_em():
    rng = np.random.RandomState(0)
    lo = rng.normal(0.5, 0.1, size=20)
    hi = rng.normal(3.0, 0.3, size=25)
    x = np.concatenate([lo, hi])
    x.sort()

    ref_comp, ref_scores = sklearn_like_gmm(x)

    K = 64  # padded capacity
    vals = np.full(K, 1e9, dtype=np.float32)
    vals[: len(x)] = x
    valid = np.zeros(K, dtype=bool)
    valid[: len(x)] = True

    comp, scores = gmm_fit_predict(jnp.asarray(vals), jnp.asarray(valid))
    comp = np.asarray(comp)[: len(x)]
    scores = np.asarray(scores)[: len(x)]

    np.testing.assert_array_equal(comp, ref_comp)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-3, atol=1e-3)


def test_batched_and_masked():
    rng = np.random.RandomState(1)
    B, G, K = 2, 3, 32
    vals = np.full((B, G, K), 1e9, dtype=np.float32)
    valid = np.zeros((B, G, K), dtype=bool)
    refs = {}
    for b in range(B):
        for g in range(G):
            n = rng.randint(2, K)
            x = np.sort(np.concatenate([
                rng.normal(0.3, 0.05, size=n // 2),
                rng.normal(2.0, 0.2, size=n - n // 2),
            ]))
            vals[b, g, :n] = x
            valid[b, g, :n] = True
            refs[(b, g)] = (n, sklearn_like_gmm(x)[0])

    comp, _ = gmm_fit_predict(jnp.asarray(vals), jnp.asarray(valid))
    comp = np.asarray(comp)
    for (b, g), (n, ref_comp) in refs.items():
        np.testing.assert_array_equal(comp[b, g, :n], ref_comp)


def test_degenerate_rows_do_not_nan():
    # All-invalid rows and single-sample rows must produce finite outputs.
    vals = np.zeros((3, 8), dtype=np.float32)
    valid = np.zeros((3, 8), dtype=bool)
    valid[1, 0] = True  # single sample
    vals[2, :4] = 0.5  # identical samples
    valid[2, :4] = True
    comp, scores = gmm_fit_predict(jnp.asarray(vals), jnp.asarray(valid))
    assert np.isfinite(np.asarray(scores)[1, 0])
    assert np.isfinite(np.asarray(scores)[2, :4]).all()
    assert (np.asarray(comp) >= 0).all()


def _sklearn_reference(x):
    """The ACTUAL reference semantics: sklearn GaussianMixture exactly as
    configured by paa_core/modeling/rpn/paa/loss.py:190-203."""
    import sklearn.mixture as skm

    x = np.asarray(x, dtype=np.float64).reshape(-1, 1)
    gmm = skm.GaussianMixture(
        2,
        weights_init=[0.5, 0.5],
        means_init=[[x.min()], [x.max()]],
        precisions_init=[[[1.0]], [[1.0]]],
    )
    gmm.fit(x)
    return gmm.predict(x), gmm.score_samples(x)


def test_matches_sklearn_bimodal():
    """Direct comparison against installed sklearn (not the numpy mirror)
    on bimodal candidate-loss-like inputs."""
    rng = np.random.RandomState(42)
    cases = [
        np.concatenate([rng.normal(0.4, 0.08, 15), rng.normal(2.5, 0.3, 20)]),
        np.concatenate([rng.normal(0.2, 0.02, 5), rng.normal(4.0, 0.5, 40)]),
        np.concatenate([rng.uniform(0.1, 0.5, 10), rng.uniform(2.0, 3.0, 8)]),
    ]
    for x in cases:
        x = np.sort(np.abs(x))
        sk_comp, sk_scores = _sklearn_reference(x)

        K = 64
        vals = np.full(K, 1e9, dtype=np.float32)
        vals[: len(x)] = x
        valid = np.zeros(K, dtype=bool)
        valid[: len(x)] = True
        comp, scores = gmm_fit_predict(jnp.asarray(vals), jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(comp)[: len(x)], sk_comp)
        np.testing.assert_allclose(
            np.asarray(scores)[: len(x)], sk_scores, rtol=5e-3, atol=5e-3
        )


def test_matches_sklearn_edge_cases():
    """Overlapping modes, tiny samples, near-duplicates — the component
    assignment (what PAA consumes for the pos/neg split) must agree."""
    rng = np.random.RandomState(7)
    cases = [
        np.sort(rng.normal(1.0, 0.3, 30)),          # unimodal
        np.sort(np.concatenate([rng.normal(0.9, 0.2, 12),
                                rng.normal(1.4, 0.2, 12)])),  # overlapping
        np.array([0.1, 0.11, 0.12, 3.0]),            # tiny n, one outlier
        np.array([0.5, 0.6]),                         # minimum viable n=2
    ]
    for x in cases:
        x = np.abs(x)
        sk_comp, _ = _sklearn_reference(x)
        K = 64
        vals = np.full(K, 1e9, dtype=np.float32)
        vals[: len(x)] = x
        valid = np.zeros(K, dtype=bool)
        valid[: len(x)] = True
        comp, _ = gmm_fit_predict(jnp.asarray(vals), jnp.asarray(valid))
        np.testing.assert_array_equal(
            np.asarray(comp)[: len(x)], sk_comp, err_msg=f"case {x[:6]}"
        )
