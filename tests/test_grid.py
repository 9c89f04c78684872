"""Likelihood-field / blur / log-odds tests against the NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from gridmap_slam_tpu.ops import grid as G
from gridmap_slam_tpu.oracle import numpy_ref as O


def test_log_odds_roundtrip():
    p = jnp.asarray([0.1, 0.3, 0.5, 0.9, 0.99])
    out = np.asarray(jax.jit(lambda x: G.inv_log_odds(G.log_odds(x)))(p))
    np.testing.assert_allclose(out, np.asarray(p), atol=1e-6)


def test_gaussian_kernel_matches_oracle():
    gm = O.OracleGridMap()
    k = G.gaussian_kernel(np.sqrt(0.05 / 0.05), int(np.ceil(3 * 1.0)))
    np.testing.assert_allclose(k, gm.kernel, atol=1e-6)
    assert abs(k.sum() - 1.0) < 1e-6


def test_blur_matches_oracle_zero_boundary():
    rng = np.random.RandomState(0)
    img = rng.uniform(size=(24, 40))
    k = G.gaussian_kernel(1.0, 3)
    got = np.asarray(jax.jit(lambda x: G.blur_separable(x, k))(jnp.asarray(img)))
    gm = O.OracleGridMap()
    gm.kernel = k.astype(np.float64)
    gm.h, gm.w = img.shape
    want = gm.likelihood(np.where(img > 0.5, 1e3, -1e3))  # exercises threshold
    # compare raw blur path: threshold(oracle) of +-1e3 logodds is a 0/1 image
    img01 = (img > 0.5).astype(np.float64)
    got01 = np.asarray(jax.jit(lambda x: G.blur_separable(x, k))(jnp.asarray(img01)))
    np.testing.assert_allclose(got01, want, atol=1e-5)


def test_likelihood_field_matches_oracle():
    rng = np.random.RandomState(1)
    logodds = np.zeros((32, 32))
    # sprinkle occupied and free evidence
    occ = rng.randint(0, 32, size=(20, 2))
    free = rng.randint(0, 32, size=(60, 2))
    logodds[occ[:, 0], occ[:, 1]] = 2.2
    logodds[free[:, 0], free[:, 1]] = -0.9
    gm = O.OracleGridMap()
    gm.h = gm.w = 32
    want = gm.likelihood(logodds)

    k = G.gaussian_kernel(1.0, 3)
    field, unknown = jax.jit(lambda x: G.likelihood_field(x, k))(
        jnp.asarray(logodds, jnp.float32))
    np.testing.assert_allclose(np.asarray(field), want, atol=1e-5)

    # unknown mask: a cell is unknown iff NO evidence cell lies within the
    # separable kernel footprint (the reference detects this by the exact
    # value 0.5, slam/GridMap.java:285 — equality also fires accidentally on
    # structured regions, which our evidence-blur definition correctly
    # excludes).  Brute-force the footprint definition independently:
    evidence = logodds != 0.0
    r = 3
    want_unknown = np.ones_like(evidence)
    for yy in range(32):
        for xx in range(32):
            y0, y1 = max(0, yy - r), min(32, yy + r + 1)
            x0, x1 = max(0, xx - r), min(32, xx + r + 1)
            if evidence[y0:y1, x0:x1].any():
                want_unknown[yy, xx] = False
    got_unknown = np.asarray(unknown)
    np.testing.assert_array_equal(got_unknown, want_unknown)


def test_effective_field_uniform_value():
    from gridmap_slam_tpu.ops.matcher import effective_field
    field = jnp.asarray([[0.4, 0.5]], jnp.float32)
    unknown = jnp.asarray([[False, True]])
    v = jax.jit(lambda f, u: effective_field(f, u, 0.9, 10.0))(field, unknown)
    # known cell keeps its value; unknown folds to the uniform-equivalent
    assert abs(float(v[0, 0]) - 0.4) < 1e-6
    ll_unknown = 0.9 * float(v[0, 1]) + 0.1 * 0.1
    assert abs(ll_unknown - 0.1) < 1e-6  # = 1/max_range (GridMap.java:285-288)
