"""Native C++ runtime tests: wire codec, streaming parser, robot sim."""

import numpy as np
import pytest

from gridmap_slam_tpu.config import RobotConfig

native = pytest.importorskip("gridmap_slam_tpu.native")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except Exception as e:                       # toolchain missing
        pytest.skip(f"native build unavailable: {e}")


def test_encode_decode_roundtrip(lib):
    out = np.zeros(8, np.uint8)
    lib.gs_encode_measurement(123, 4567, -2, out)
    # little-endian magic first
    assert out[0] == 0xAA and out[1] == 0x55
    p = native.WireParser()
    p.feed(bytes(out))
    assert p.pending() == 0          # measurement only, no revolution yet
    lib.gs_encode_measurement(-1, 10, 20, out)
    p.feed(bytes(out))
    assert p.pending() == 1
    steps, front, lc, rc = p.pop()
    assert list(steps) == [123] and list(front) == [4567]
    assert (lc, rc) == (10, 20)


def test_parser_resync_on_garbage(lib):
    p = native.WireParser()
    out = np.zeros(8, np.uint8)
    lib.gs_encode_measurement(5, 100, 0, out)
    p.feed(b"\x01\x02\x03")          # garbage prefix
    p.feed(bytes(out))
    lib.gs_encode_measurement(-1, 1, 2, out)
    p.feed(bytes(out)[:3])           # split packet across feeds
    p.feed(bytes(out)[3:])
    assert p.pending() == 1
    steps, front, lc, rc = p.pop()
    assert list(steps) == [5]
    assert (lc, rc) == (1, 2)


def test_command_encoding(lib):
    out = np.zeros(16, np.uint8)
    n = lib.gs_encode_wheel_speeds(1.0, -2.0, out)
    assert n == 9 and out[0] == 0x10
    # big-endian float 1.0 = 3F 80 00 00 (ConnectionManager.sendFloat)
    assert list(out[1:5]) == [0x3F, 0x80, 0x00, 0x00]
    assert list(out[5:9]) == [0xC0, 0x00, 0x00, 0x00]


def test_robot_sim_stream_parses(lib):
    from gridmap_slam_tpu.io.synthetic import default_world

    sim = native.RobotSim(default_world(), seed=7)
    sim.set_speeds(3.0, 3.0)         # equal wheel speeds: drive straight
    parser = native.WireParser()
    for _ in range(3):
        parser.feed(sim.revolution(range_noise_sd=0.0))
    assert parser.pending() == 3
    frames = native.wire_to_frames(parser, RobotConfig())
    assert len(frames) == 3
    f = frames[-1]
    assert len(f.angle) == 180       # 2 deg default resolution
    assert f.hit.all()               # closed room: every beam hits
    assert 0.1 < f.dist.min() and f.dist.max() < 6.0
    # moving forward: odometry says so
    assert f.d_center > 0.001
    assert abs(f.d_theta) < 0.05
    # pose advanced along +x
    assert sim.pose[0] > 0.01 and abs(sim.pose[1]) < 0.2


def test_sim_turning(lib):
    from gridmap_slam_tpu.io.synthetic import default_world

    sim = native.RobotSim(default_world(), seed=3)
    sim.set_speeds(1.0, 4.0)         # right faster: turn left
    parser = native.WireParser()
    parser.feed(sim.revolution())
    frames = native.wire_to_frames(parser, RobotConfig())
    assert frames[0].d_theta > 0.01
    assert sim.pose[2] > 0.01
