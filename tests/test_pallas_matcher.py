"""Pallas matcher-kernel equivalence vs the gather stage scorer.

Interpret-mode (CPU) checks of ops/pallas/matcher.py against
ops/matcher._stage_scores — the same oracle the matmul backend is held to
(tests/test_matcher_matmul.py).  Sizes are tiny: interpret mode emulates
every vector op in Python.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridmap_slam_tpu.config import SlamConfig
from gridmap_slam_tpu.ops.matcher import _stage_scores, correlative_match
from gridmap_slam_tpu.ops.pallas.matcher import (
    correlative_match_pallas_batch, pad_llfield_batch,
    stage_scores_pallas_batch)
from gridmap_slam_tpu.types import Odom, Scan

RES, ORIGIN, MAXR, ZHIT = 0.05, (-1.0, -1.0), 10.0, 0.9
LL_OUT = math.log(1.0 / MAXR)


def _problem(p=2, h=40, w=40, b=24, seed=0):
    rng = np.random.default_rng(seed)
    llf = jnp.asarray(rng.normal(-1.5, 0.5, (p, h, w)).astype(np.float32))
    ang = rng.uniform(-np.pi, np.pi, b)
    dist = rng.uniform(0.2, 1.2, b)
    px = jnp.asarray((dist * np.cos(ang)).astype(np.float32))
    py = jnp.asarray((dist * np.sin(ang)).astype(np.float32))
    use = jnp.asarray(rng.uniform(size=b) > 0.2)
    poses = jnp.asarray(np.stack([rng.uniform(-0.8, 0.8, p),
                                  rng.uniform(-0.8, 0.8, p),
                                  rng.uniform(-np.pi, np.pi, p)],
                                 -1).astype(np.float32))
    # exercise out-of-map clipping on particle 0
    poses = poses.at[0].set(jnp.asarray([0.95, -0.95, 1.0]))
    return llf, px, py, use, poses


@pytest.mark.parametrize("nearest", [False, True])
def test_stage_scores_matches_gather(nearest):
    llf, px, py, use, poses = _problem()
    offs_xy = tuple(np.linspace(-0.1, 0.1, 5))
    offs_t = tuple(np.linspace(-0.1, 0.1, 3))
    fpad, hp, wp = pad_llfield_batch(llf, LL_OUT)
    got = stage_scores_pallas_batch(
        fpad, px, py, use, poses, jnp.zeros((poses.shape[0], 3)),
        offs_x=offs_xy, offs_y=offs_xy, offs_t=offs_t,
        resolution=RES, origin=ORIGIN, pad=2, hp=hp, wp=wp,
        nearest=nearest, interpret=True)
    ref = jax.vmap(lambda f, p: _stage_scores(
        f, px, py, use, p, jnp.asarray(offs_xy, jnp.float32),
        jnp.asarray(offs_xy, jnp.float32), jnp.asarray(offs_t, jnp.float32),
        resolution=RES, origin=ORIGIN, z_hit=ZHIT, max_range=MAXR,
        nearest=nearest))(llf, poses)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_correlative_match_batch_matches_vmapped():
    llf, px, py, use, poses = _problem(p=2, b=20, seed=3)
    b = px.shape[0]
    scan = Scan(angle=jnp.arctan2(py, px),
                dist=jnp.sqrt(px ** 2 + py ** 2),
                hit=use, valid=jnp.ones((b,), bool))
    odom = Odom(d_center=jnp.asarray(0.05), d_theta=jnp.asarray(0.02))
    cfg = SlamConfig().matcher
    # small schedule: interpret mode is slow
    import dataclasses
    # coarse_halfres off: this test pins SCHEDULE equivalence vs the
    # vmapped gather path, which has no half-res basin-finding stage
    cfg = dataclasses.replace(cfg, impl="gather", coarse_nxy=5, coarse_nt=3,
                              fine_nxy=3, fine_nt=3, extra_refine_stages=0,
                              window_xy=0.1, window_theta_deg=6.0,
                              coarse_beam_stride=2, coarse_halfres=False)
    mcfg = SlamConfig().motion
    prior_b = poses + jnp.asarray([0.01, -0.02, 0.03])

    best_p, score_p = correlative_match_pallas_batch(
        llf, scan, poses, odom, matcher_cfg=cfg, motion_cfg=mcfg,
        resolution=RES, origin=ORIGIN, max_range=MAXR,
        prior_center_b=prior_b, interpret=True)
    best_r, score_r = jax.vmap(
        lambda f, p0, pc: correlative_match(
            f, scan, p0, odom, matcher_cfg=cfg, motion_cfg=mcfg,
            resolution=RES, origin=ORIGIN, max_range=MAXR,
            prior_center=pc))(llf, poses, prior_b)
    np.testing.assert_allclose(np.asarray(best_p), np.asarray(best_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(score_p), np.asarray(score_r),
                               rtol=2e-5, atol=2e-4)


def test_stage_scores_all_invalid_scan():
    """Zero valid beams -> zero occupied slot planes -> all-zero stage
    scores (the dynamic plane loop runs 0 iterations), matching the
    gather scorer's all-masked sum."""
    llf, px, py, _, poses = _problem(p=2, b=16, seed=5)
    use = jnp.zeros((16,), bool)
    offs_xy = tuple(np.linspace(-0.1, 0.1, 3))
    offs_t = tuple(np.linspace(-0.1, 0.1, 3))
    fpad, hp, wp = pad_llfield_batch(llf, LL_OUT)
    got = stage_scores_pallas_batch(
        fpad, px, py, use, poses, jnp.zeros((2, 3)),
        offs_x=offs_xy, offs_y=offs_xy, offs_t=offs_t,
        resolution=RES, origin=ORIGIN, pad=2, hp=hp, wp=wp,
        nearest=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)
