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
    return Scan.from_arrays(angles, dists, hits, max_beams=96)


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
    fe = PoseGraphSLAM(scfg, FrontendConfig(
        keyframe_dist=0.4, closure_min_gap=6, closure_max_dist=1.5,
        closure_min_score=-500.0))

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
