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


def test_tfmini_codec_roundtrip_and_resync():
    """TFMini 9-byte frame codec (TFmini.h:230-315): encode -> streaming
    decode across arbitrary chunk boundaries, resync over garbage, and
    checksum rejection."""
    from gridmap_slam_tpu import native

    c = native.TFMiniCodec()
    f1 = native.TFMiniCodec.encode(1234, 567, 3)
    f2 = native.TFMiniCodec.encode(45, 2999, 7)
    assert len(f1) == 9 and f1[:2] == b"\x59\x59"
    # garbage prefix + split feeds
    stream = b"\x12\x34\xab" + f1 + b"\x00" + f2
    c.feed(stream[:7])
    c.feed(stream[7:8])
    c.feed(stream[8:])
    assert c.pending() == 2
    assert c.pop() == (1234, 567, 3)
    assert c.pop() == (45, 2999, 7)
    assert c.pop() is None
    # corrupt checksum is dropped
    bad = bytearray(f1)
    bad[8] ^= 0xFF
    c.feed(bytes(bad))
    assert c.pending() == 0


def test_wire_back_field_carries_strength():
    """The packet's 4th field carries TFMini signal strength
    (esp32/sensor.cpp:219-222): nonzero iff the beam hit."""
    import numpy as np

    from gridmap_slam_tpu import native
    from gridmap_slam_tpu.io.synthetic import default_world

    sim = native.RobotSim(default_world(), seed=3)
    p = native.WireParser()
    p.feed(sim.revolution(0.0))
    steps, front, back, lc, rc = p.pop_full()
    hit = front >= 0
    assert hit.any()
    np.testing.assert_array_equal(back > 0, hit)
    # strength decreases with distance among hits
    d = front[hit].astype(float)
    s = back[hit].astype(float)
    far, near = d > np.median(d), d <= np.median(d)
    assert s[near].mean() > s[far].mean()


def test_sensor_homing():
    """Cmd 0x05 homes the turret (esp32/sensor.cpp:247-276): after a partial
    revolution the turret is mid-rotation; homing returns it to step 0."""
    from gridmap_slam_tpu import native
    from gridmap_slam_tpu.io.synthetic import default_world

    sim = native.RobotSim(default_world(), seed=1)
    sim.set_resolution(7)          # 720*7/360 = 14 steps/meas; 51 meas/rev
    sim.revolution(0.0)
    assert sim.turret_step != 0    # 51*14 = 714 != 720: turret mid-phase
    sim.home()
    assert sim.turret_step == 0


def test_serial_stream_over_pty():
    """SerialStream (conn/SerialConnection.java equivalent) speaks the wire
    protocol over a pty: sendall/recv round-trip + RobotLink compatibility."""
    import os
    import pty

    from gridmap_slam_tpu.app.serial import SerialStream, list_ports
    from gridmap_slam_tpu import native

    assert isinstance(list_ports(), list)
    leader, follower = pty.openpty()
    try:
        s = SerialStream(os.ttyname(follower), dtr_reset=False, timeout=2.0)
        try:
            s.sendall(b"\x02")                     # sensor enable
            assert os.read(leader, 16) == b"\x02"
            # robot -> host: one encoded measurement packet
            out = np.zeros(8, np.uint8)
            native.load().gs_encode_measurement(10, 1500, 700, out)
            os.write(leader, bytes(out))
            got = s.recv(64)
            p = native.WireParser()
            p.feed(got)
            os.write(leader, native_marker())
            p.feed(s.recv(64))
            steps, front, back, lc, rc = p.pop_full()
            assert steps[0] == 10 and front[0] == 1500 and back[0] == 700
            assert (lc, rc) == (33, -7)
        finally:
            s.close()
    finally:
        os.close(leader)
        os.close(follower)


def native_marker():
    """End-of-revolution marker packet with odometry counts (33, -7)."""
    from gridmap_slam_tpu import native

    out = np.zeros(8, np.uint8)
    native.load().gs_encode_measurement(-1, 33, -7, out)
    return bytes(out)


def test_native_recording_reader_matches_python():
    """The C++ recording parser (gs_recording_*) returns frames identical
    to the Python reader on every committed canonical dataset, and raises
    the same error family on a corrupt header."""
    import glob
    from gridmap_slam_tpu.io.recording import read_recording

    recs = sorted(glob.glob("maps/*.rec"))
    assert recs
    for path in recs:
        py = read_recording(path, native="off")
        nat = read_recording(path, native="on")
        assert len(py) == len(nat)
        for a, b in zip(py, nat):
            assert a.t == b.t and a.d_center == b.d_center
            assert a.d_theta == b.d_theta
            np.testing.assert_array_equal(a.angle, b.angle)
            np.testing.assert_array_equal(a.dist, b.dist)
            np.testing.assert_array_equal(a.hit, b.hit)

    data = bytearray(open(recs[0], "rb").read())
    data[0] ^= 0xFF
    bad = "/tmp/bad_native.rec"
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        read_recording(bad, native="on")
