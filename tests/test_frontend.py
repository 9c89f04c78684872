"""Pose-graph frontend test: loop-closure correction of drifted odometry.

Builds a square-loop dataset with ground truth, feeds DRIFTED odometry poses
+ true scans to the frontend, and checks that closure detection + Gauss-
Newton shrink the loop-closure gap and the rebuilt map is consistent.
"""

import math

import numpy as np
import jax
import pytest

from gridmap_slam_tpu.config import MapConfig, SlamConfig
from gridmap_slam_tpu.io.synthetic import default_world, raycast_segments
from gridmap_slam_tpu.models.frontend import FrontendConfig, PoseGraphSLAM
from gridmap_slam_tpu.types import Scan


def _scan_at(world, pose, n=72, max_range=10.0):
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    dists = raycast_segments(np.asarray(pose[:2]), angles + pose[2], world,
                             max_range)
    hits = dists < max_range - 1e-9
    return Scan.from_arrays(angles, dists, hits,
                            max_beams=96 if n <= 96 else 192)


@pytest.fixture(scope="module")
def loop_dataset():
    """Ground-truth square loop inside the default room + drifted odometry."""
    world = default_world()
    gt = []
    pose = np.asarray([-1.5, -1.5, 0.0])
    for leg in range(4):
        for _ in range(6):
            gt.append(pose.copy())
            pose[0] += 0.5 * math.cos(pose[2])
            pose[1] += 0.5 * math.sin(pose[2])
        pose[2] = math.atan2(math.sin(pose[2] + math.pi / 2),
                             math.cos(pose[2] + math.pi / 2))
    gt.append(gt[0].copy())                  # returns to start
    gt = np.asarray(gt)

    # drifted odometry: constant small bias per step
    drift = np.asarray([0.012, -0.008, 0.012])
    est = [gt[0].copy()]
    for k in range(1, len(gt)):
        dx = gt[k] - gt[k - 1]
        c, s = math.cos(est[-1][2] - gt[k - 1][2]), math.sin(
            est[-1][2] - gt[k - 1][2])
        step = np.asarray([dx[0] * c - dx[1] * s, dx[0] * s + dx[1] * c,
                           dx[2]]) + drift
        est.append(est[-1] + step)
    est = np.asarray(est)
    return world, gt, est


def test_loop_closure_corrects_drift(loop_dataset):
    world, gt, est = loop_dataset
    scfg = SlamConfig(max_beams=96)
    # NB: closure_min_score is left at the calibrated DEFAULT — this test
    # validates that the shipped gate accepts true same-place closures
    # end-to-end (the wrong-place test below validates that it rejects).
    fe = PoseGraphSLAM(scfg, FrontendConfig(
        keyframe_dist=0.4, closure_min_gap=6, closure_max_dist=1.5))

    for pose_est, pose_gt in zip(est, gt):
        fe.add(pose_est, _scan_at(world, pose_gt))
    assert fe.num_keyframes >= 10

    drift_before = np.linalg.norm(fe.kf_poses[-1][:2] - fe.kf_poses[0][:2])
    assert drift_before > 0.15               # odometry has real drift

    n = fe.detect_closures()
    assert n >= 1, "no loop closures accepted"

    opt, chi2 = fe.optimize()
    assert chi2[-1] < chi2[0]
    # the loop endpoints coincide in ground truth; after optimization the
    # estimated loop must close much better than the drifted odometry
    drift_after = np.linalg.norm(opt[-1][:2] - opt[0][:2])
    assert drift_after < drift_before * 0.5, (drift_before, drift_after)

    m = np.asarray(fe.rebuild_map())
    assert (m > 0).sum() > 100
    assert (m < 0).sum() > 1000


def test_wrong_place_closure_rejected():
    """A geometrically-near but visually-wrong candidate (scan from a
    DIFFERENT room) must be rejected by the bidirectional verification gate,
    while the true candidate from the same place passes (VERDICT r1 #3)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from gridmap_slam_tpu.models import posegraph as PG
    from gridmap_slam_tpu.ops.geometry import se2_relative

    room_a = np.asarray([
        [-2.5, -2.5, 2.5, -2.5], [2.5, -2.5, 2.5, 2.5],
        [2.5, 2.5, -2.5, 2.5], [-2.5, 2.5, -2.5, -2.5],
        [-1.0, -1.0, -0.2, -1.0], [-0.2, -1.0, -0.2, -0.2],
        [1.0, 0.5, 1.8, 1.3],
    ], np.float64)
    room_b = np.asarray([
        [-2.5, -1.8, 0.0, -2.5], [0.0, -2.5, 2.5, -1.0],
        [2.5, -1.0, 1.2, 2.4], [1.2, 2.4, -1.5, 2.0],
        [-1.5, 2.0, -2.5, -1.8], [0.3, 0.0, 0.9, 0.9],
    ], np.float64)

    scfg = SlamConfig(max_beams=192)
    fcfg = FrontendConfig()
    from gridmap_slam_tpu.ops.grid import gaussian_kernel
    kernel = gaussian_kernel(scfg.map.likelihood_sigma,
                             scfg.map.likelihood_radius)
    mc = dc.replace(scfg.matcher, window_xy=fcfg.closure_window_xy,
                    window_theta_deg=fcfg.closure_window_theta_deg,
                    coarse_nxy=fcfg.closure_coarse_nxy,
                    coarse_nt=fcfg.closure_coarse_nt,
                    extra_refine_stages=fcfg.closure_refine_stages,
                    prior_weight=0.0)

    pose_i = np.asarray([-1.5, -1.5, 0.0])
    pose_j = np.asarray([-1.3, -1.4, 0.2])
    scan_i = _scan_at(room_a, pose_i, n=180)
    scan_true = _scan_at(room_a, pose_j, n=180)
    scan_false = _scan_at(room_b, pose_j, n=180)  # other room, same guess

    guess = jnp.asarray(np.asarray(se2_relative(
        jnp.asarray(pose_i), jnp.asarray(pose_j)))
        + np.asarray([0.3, -0.2, 0.1]), jnp.float32)

    def gate(scan_j):
        rel, score, consist = PG.verify_closure_bidirectional(
            scan_i, scan_j, guess, map_cfg=scfg.map, matcher_cfg=mc,
            motion_cfg=scfg.motion, sensor_cfg=scfg.sensor, kernel=kernel)
        ok = (float(score) >= fcfg.closure_min_score
              and float(consist) <= fcfg.closure_max_consistency)
        return ok, np.asarray(rel), float(score), float(consist)

    ok_t, rel_t, score_t, cons_t = gate(scan_true)
    ok_f, _, score_f, cons_f = gate(scan_false)

    assert ok_t, f"true closure rejected: score={score_t} consist={cons_t}"
    # the accepted relative pose must be near the actual one
    rel_gt = np.asarray(se2_relative(jnp.asarray(pose_i), jnp.asarray(pose_j)))
    assert np.linalg.norm(rel_t[:2] - rel_gt[:2]) < 0.15, (rel_t, rel_gt)
    assert not ok_f, (
        f"wrong-place closure accepted: score={score_f} consist={cons_f}")


def test_keyframe_promotion_thresholds():
    scfg = SlamConfig(max_beams=96)
    fe = PoseGraphSLAM(scfg, FrontendConfig(keyframe_dist=0.5,
                                            keyframe_angle_deg=30.0))
    world = default_world()
    s = _scan_at(world, np.zeros(3))
    assert fe.add([0.0, 0.0, 0.0], s)            # first always promotes
    assert not fe.add([0.1, 0.0, 0.0], s)        # too close
    assert fe.add([0.6, 0.0, 0.0], s)            # far enough
    assert not fe.add([0.6, 0.0, 0.2], s)        # small turn
    assert fe.add([0.6, 0.0, 0.8], s)            # big turn
    assert fe.num_keyframes == 3
