"""Type-layer tests: odometry-from-encoder-counts, scan padding."""

import numpy as np
import jax.numpy as jnp

from gridmap_slam_tpu.config import RobotConfig
from gridmap_slam_tpu.types import Odom, Scan


def test_odom_from_counts_matches_reference_formula():
    """slam/Odometry.java:41-55: d = counts/960 * pi * 0.063;
    dTheta = (dR - dL) / 0.22."""
    r = RobotConfig()
    o = Odom.from_counts(480, 480, r)          # half a wheel revolution each
    want = 0.5 * np.pi * 0.063
    assert abs(float(o.d_center) - want) < 1e-6
    assert abs(float(o.d_theta)) < 1e-9

    o = Odom.from_counts(0, 960, r)            # right wheel one revolution
    d_right = np.pi * 0.063
    assert abs(float(o.d_center) - d_right / 2) < 1e-6
    assert abs(float(o.d_theta) - d_right / 0.22) < 1e-6

    o = Odom.from_counts(-100, 100, r)         # spin in place
    assert abs(float(o.d_center)) < 1e-9
    assert float(o.d_theta) > 0


def test_scan_padding_and_truncation():
    s = Scan.from_arrays([0.1, 0.2], [1.0, 2.0], [True, False], max_beams=4,
                         max_range=10.0)
    assert s.num_beams == 4
    assert list(np.asarray(s.valid)) == [True, True, False, False]
    assert np.asarray(s.dist)[2] == 10.0       # padding at max range
    assert not np.asarray(s.hit)[1]

    s = Scan.from_arrays(np.zeros(10), np.ones(10), np.ones(10, bool),
                         max_beams=4)
    assert int(np.asarray(s.valid).sum()) == 4  # truncated
