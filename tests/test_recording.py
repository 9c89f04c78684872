"""Recording / map-checkpoint format tests, including a golden byte layout
check against the documented reference format (SURVEY.md §2.9)."""

import struct

import numpy as np

from gridmap_slam_tpu.io import (RecordedFrame, read_map_checkpoint,
                                 read_recording, write_map_checkpoint,
                                 write_recording)


def _frame(t=1.5, n=3):
    rng = np.random.RandomState(int(t * 10))
    return RecordedFrame(
        t=t, d_center=0.123, d_theta=-0.045,
        angle=rng.uniform(-np.pi, np.pi, n),
        dist=rng.uniform(0.1, 9.9, n),
        hit=rng.uniform(size=n) > 0.5)


def test_roundtrip(tmp_path):
    frames = [_frame(0.5, 4), _frame(1.5, 0), _frame(2.5, 7)]
    p = tmp_path / "log.rec"
    write_recording(p, frames)
    out = read_recording(p)
    assert len(out) == 3
    for a, b in zip(frames, out):
        assert abs(a.t - b.t) < 1e-6
        assert a.d_center == b.d_center and a.d_theta == b.d_theta
        np.testing.assert_allclose(a.angle, b.angle)
        np.testing.assert_allclose(a.dist, b.dist)
        np.testing.assert_array_equal(a.hit, b.hit)


def test_golden_byte_layout(tmp_path):
    """Byte-for-byte layout: 0xFF; i16 N; {f32 t; f64 dC; f64 dT; i16 M;
    M x (f64 angle, f64 dist, u8 hit)} big-endian (DataRecorder.java:381-436,
    ObjectSerializer.java:36-83)."""
    f = RecordedFrame(t=2.0, d_center=0.25, d_theta=-0.5,
                      angle=np.asarray([0.75]), dist=np.asarray([3.5]),
                      hit=np.asarray([True]))
    p = tmp_path / "golden.rec"
    write_recording(p, [f])
    data = open(p, "rb").read()
    want = (struct.pack(">B", 0xFF) + struct.pack(">h", 1)
            + struct.pack(">f", 2.0) + struct.pack(">d", 0.25)
            + struct.pack(">d", -0.5) + struct.pack(">h", 1)
            + struct.pack(">d", 0.75) + struct.pack(">d", 3.5)
            + struct.pack(">B", 1))
    assert data == want
    assert len(data) == 1 + 2 + 4 + 8 + 8 + 2 + 17


def test_bad_header_raises(tmp_path):
    p = tmp_path / "bad.rec"
    p.write_bytes(b"\x00\x00\x01")
    try:
        read_recording(p)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_map_checkpoint_roundtrip(tmp_path):
    logodds = np.random.RandomState(0).normal(size=(40, 60))
    params = dict(width_m=3.0, height_m=2.0, resolution=0.05,
                  origin=(-1.5, -1.0))
    p = tmp_path / "map.bin"
    write_map_checkpoint(p, params, logodds)
    got_params, got = read_map_checkpoint(p)
    np.testing.assert_allclose(got, logodds)
    assert abs(got_params["resolution"] - 0.05) < 1e-6
    assert got_params["origin"][0] == -1.5

    # golden header: 0xFF + 5 BE f32
    data = open(p, "rb").read()
    assert data[0] == 0xFF
    w, h, r, px, py = struct.unpack_from(">fffff", data, 1)
    assert (w, h) == (3.0, 2.0) and abs(r - 0.05) < 1e-7
