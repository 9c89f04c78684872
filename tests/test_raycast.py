"""Dense occupancy update vs the oracle's per-beam DDA integration.

The dense formulation is a documented redesign (ops/raycast.py docstring):
cell *classification* (free / occupied / untouched) matches the DDA walk up to
sub-cell geometry; accumulation magnitude near the sensor differs.  These
tests check the invariants that matter for behavior:
  - endpoint cells of hit beams get occupied updates,
  - cells well inside the ray get free updates,
  - cells beyond the wall band / off-ray cells are untouched,
  - agreement with the oracle's visited-cell classification is high.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridmap_slam_tpu.config import SlamConfig
from gridmap_slam_tpu.ops.raycast import build_beam_lut, integrate_scan
from gridmap_slam_tpu.oracle import numpy_ref as O
from gridmap_slam_tpu.types import Scan

CFG = SlamConfig()
RES = 0.05
ORIGIN = (-3.0, -3.0)


def _integrate(scan, pose, shape=(120, 120)):
    f = jax.jit(lambda s, p: integrate_scan(
        jnp.zeros(shape, jnp.float32), p, s,
        build_beam_lut(s, 2048), resolution=RES, origin=ORIGIN,
        l_free=CFG.sensor.l_free, l_occ=CFG.sensor.l_occ))
    return np.asarray(f(scan, jnp.asarray(pose, jnp.float32)))


def test_single_beam_axis_aligned():
    scan = Scan.from_arrays([0.0], [2.0], [True], max_beams=8)
    # pose y=0.02 keeps the ray strictly inside cell row 60 (y in [0, 0.05))
    delta = _integrate(scan, [0.0, 0.02, 0.0])
    row = delta[60]
    # endpoint at x=2.0 -> cell 100; occupied band = within +-1 cell of 2.0 m
    assert row[100] > 0
    assert row[99] > 0 or row[101] > 0
    # free cells strictly before the band
    assert (row[62:97] < 0).all()
    # beyond wall band: untouched
    assert (row[103:] == 0).all()
    # other rows untouched except near the ray
    assert (delta[70:] == 0).all() and (delta[:50] == 0).all()


def test_non_hit_beam_carves_to_measured_distance_only():
    scan = Scan.from_arrays([math.pi / 2], [1.5], [False], max_beams=8)
    delta = _integrate(scan, [0.0, 0.0, 0.0])
    col = delta[:, 60]
    assert (col[62:88] < 0).all()      # free up to just below 1.5 m
    assert (col[91:] == 0).all()       # nothing at/after measured distance
    assert (delta > 0).sum() == 0      # no occupied cells for a miss


def test_rotation_and_translation_consistency():
    # a beam at local angle a from pose theta lands at world angle theta+a
    scan = Scan.from_arrays([math.pi / 4], [1.0], [True], max_beams=8)
    delta = _integrate(scan, [1.0, -1.0, math.pi / 4])
    # endpoint: world angle pi/2 from (1,-1) -> (1, 0); cell x=80, y=60
    ex, ey = int((1.0 - ORIGIN[0]) / RES), int((0.0 - ORIGIN[1]) / RES)
    assert delta[ey, ex] > 0 or delta[ey - 1, ex] > 0 or delta[ey + 1, ex] > 0


def test_classification_agrees_with_oracle_dda():
    # Geometrically consistent scan from the synthetic raycaster (adversarial
    # random angle/dist combinations make near-parallel beams carry
    # contradictory evidence, where the dense nearest-beam update and the
    # reference's sum-over-beams accumulation legitimately differ; see
    # ops/raycast.py "Known divergence").
    from gridmap_slam_tpu.io.synthetic import default_world, raycast_segments
    n = 60
    pose = (0.35, -0.2, 0.4)
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    dists = raycast_segments(np.asarray(pose[:2]), angles + pose[2],
                             default_world(), 10.0)
    hits = dists < 10.0 - 1e-9

    gm = O.OracleGridMap()
    want = gm.integrate(gm.new_map(), pose, angles, dists, hits)

    scan = Scan.from_arrays(angles, dists, hits, max_beams=64)
    got = _integrate(scan, list(pose))

    # Cells both formulations touched must agree in sign almost always
    # (borderline footprint cells differ, but never free-vs-occupied).
    both = (want != 0) & (got != 0)
    sign_match = (np.sign(got[both]) == np.sign(want[both])).mean()
    assert sign_match > 0.97, sign_match
    # Coverage: comparable carved-cell counts (the dense footprint is the
    # same ~1-cell-wide ray, modulo sub-cell boundary differences).
    ratio = (got != 0).sum() / (want != 0).sum()
    assert 0.6 < ratio < 1.6, ratio
    # occupied cells (endpoints) must agree well: every oracle-occupied cell
    # is non-free in ours and most are occupied
    occ = want > 0
    assert (got[occ] >= 0).mean() > 0.9
    assert (np.sign(got[occ]) > 0).mean() > 0.7
    # we must not mark occupied where the oracle carved free
    free = want < -1e-9
    assert (got[free] > 0).mean() < 0.02


def test_untouched_cells_far_from_rays():
    scan = Scan.from_arrays([0.0], [1.0], [True], max_beams=8)
    delta = _integrate(scan, [0.0, 0.0, 0.0])
    # far corner untouched
    assert delta[:40, :40].sum() == 0
