"""Reader/writer for the reference recording ("maps/") file format.

Format (big-endian, app/DataRecorder.java:381-436 + app/ObjectSerializer.java:
36-83):

    u8  0xFF                      header
    i16 N                         frame count
    N x {
      f32 timeStamp               seconds since recording start
      f64 dCenter; f64 dTheta     odometry (ObjectSerializer.writeOdometry)
      i16 M                       measurement count
      M x { f64 angle; f64 distance; u8 wasHit }
    }

Also the map checkpoint format (slam/GridMapLoader.java:31-135 +
ObjectSerializer.java:86-128):

    u8 0xFF; f32 width_m, height_m, resolution, posX, posY; W*H x f64 logOdds
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class RecordedFrame:
    """Host-side frame: variable-length beams, as stored on disk."""

    t: float
    d_center: float
    d_theta: float
    angle: np.ndarray     # (M,) f64
    dist: np.ndarray      # (M,) f64
    hit: np.ndarray       # (M,) bool


def read_recording(path, native: str = "auto") -> List[RecordedFrame]:
    """Parse a reference-format recording.

    native: "auto" uses the C++ parser (native/protocol.cc
    gs_recording_*, one pass over the file) when the native library
    loads, silently falling back to the Python parser; "on" requires it;
    "off" forces Python.  Both produce identical frames
    (tests/test_native.py::test_native_recording_reader_matches_python).
    """
    data = open(path, "rb").read()
    if native != "off":
        try:
            from ..native import parse_recording
            t, d_center, d_theta, m_counts, angle, dist, hit = \
                parse_recording(data)
        except ValueError:
            raise                      # malformed file: same error family
        except Exception:
            if native == "on":
                raise
        else:
            frames = []
            k = 0
            for i in range(len(t)):
                m = int(m_counts[i])
                frames.append(RecordedFrame(
                    t=float(t[i]), d_center=float(d_center[i]),
                    d_theta=float(d_theta[i]),
                    angle=angle[k:k + m].copy(),
                    dist=dist[k:k + m].copy(),
                    hit=hit[k:k + m].astype(bool)))
                k += m
            return frames
    off = 0
    (header,) = struct.unpack_from(">B", data, off); off += 1
    if header != 0xFF:
        raise ValueError(f"bad header byte {header:#x}, want 0xff")
    (n,) = struct.unpack_from(">h", data, off); off += 2
    frames = []
    for _ in range(n):
        t, d_center, d_theta, m = struct.unpack_from(">fddh", data, off)
        off += 4 + 8 + 8 + 2
        meas = np.frombuffer(data, dtype=">f8", count=2 * m, offset=off)
        # interleaved (angle, dist) pairs with a trailing bool each: the bool
        # breaks the stride, so parse per measurement via a structured dtype.
        rec = np.frombuffer(
            data, dtype=np.dtype([("angle", ">f8"), ("dist", ">f8"),
                                  ("hit", "u1")]),
            count=m, offset=off)
        off += m * 17
        del meas
        frames.append(RecordedFrame(
            t=float(t), d_center=float(d_center), d_theta=float(d_theta),
            angle=rec["angle"].astype(np.float64),
            dist=rec["dist"].astype(np.float64),
            hit=rec["hit"].astype(bool)))
    return frames


def write_recording(path, frames: Sequence[RecordedFrame]) -> None:
    import os
    parent = os.path.dirname(os.fspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)
    out = bytearray()
    out += struct.pack(">B", 0xFF)
    out += struct.pack(">h", len(frames))
    for f in frames:
        m = len(f.angle)
        out += struct.pack(">fddh", f.t, f.d_center, f.d_theta, m)
        rec = np.empty(m, dtype=np.dtype([("angle", ">f8"), ("dist", ">f8"),
                                          ("hit", "u1")]))
        rec["angle"] = f.angle
        rec["dist"] = f.dist
        rec["hit"] = f.hit.astype(np.uint8)
        out += rec.tobytes()
    with open(path, "wb") as fh:
        fh.write(out)


def read_map_checkpoint(path) -> Tuple[dict, np.ndarray]:
    """Read a reference map checkpoint; returns (params, logodds (H, W))."""
    data = open(path, "rb").read()
    (header,) = struct.unpack_from(">B", data, 0)
    if header != 0xFF:
        raise ValueError(f"bad header byte {header:#x}, want 0xff")
    width, height, res, px, py = struct.unpack_from(">fffff", data, 1)
    w = int(np.ceil(width / res))
    h = int(np.ceil(height / res))
    logodds = np.frombuffer(data, dtype=">f8", count=w * h, offset=21)
    params = dict(width_m=width, height_m=height, resolution=res,
                  origin=(px, py))
    return params, logodds.reshape(h, w).astype(np.float64)


def write_map_checkpoint(path, params: dict, logodds: np.ndarray) -> None:
    with open(path, "wb") as fh:
        fh.write(struct.pack(">B", 0xFF))
        fh.write(struct.pack(">fffff", params["width_m"], params["height_m"],
                             params["resolution"], params["origin"][0],
                             params["origin"][1]))
        fh.write(logodds.astype(">f8").tobytes())


def frames_to_arrays(frames: Sequence[RecordedFrame], max_beams: int,
                     max_range: float = 10.0):
    """Stack host frames into fixed-width arrays for device transfer.

    Returns a dict of numpy arrays with leading axis = frame count:
    t (F,), d_center (F,), d_theta (F,), angle/dist (F, B) f32,
    hit/valid (F, B) bool.
    """
    n = len(frames)
    t = np.zeros((n,), np.float32)
    dc = np.zeros((n,), np.float32)
    dt = np.zeros((n,), np.float32)
    angle = np.zeros((n, max_beams), np.float32)
    dist = np.full((n, max_beams), max_range, np.float32)
    hit = np.zeros((n, max_beams), bool)
    valid = np.zeros((n, max_beams), bool)
    for i, f in enumerate(frames):
        m = min(len(f.angle), max_beams)
        t[i], dc[i], dt[i] = f.t, f.d_center, f.d_theta
        angle[i, :m] = f.angle[:m]
        dist[i, :m] = f.dist[:m]
        hit[i, :m] = f.hit[:m]
        valid[i, :m] = True
    return dict(t=t, d_center=dc, d_theta=dt, angle=angle, dist=dist,
                hit=hit, valid=valid)
