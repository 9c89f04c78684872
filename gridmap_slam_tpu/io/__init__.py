"""Log I/O: reference recording/map formats, synthetic data, device transfer."""

import jax.numpy as jnp
import numpy as np

from ..types import Frame, Odom, Scan
from .recording import (RecordedFrame, frames_to_arrays, read_map_checkpoint,
                        read_recording, write_map_checkpoint, write_recording)


def frames_to_device(frames, max_beams: int, max_range: float = 10.0):
    """Convert host RecordedFrames into a stacked device `Frame` batch with a
    leading frame axis (suitable for indexing per step or lax.scan replay)."""
    a = frames_to_arrays(frames, max_beams, max_range)
    return Frame(
        scan=Scan(angle=jnp.asarray(a["angle"]), dist=jnp.asarray(a["dist"]),
                  hit=jnp.asarray(a["hit"]), valid=jnp.asarray(a["valid"])),
        odom=Odom(d_center=jnp.asarray(a["d_center"]),
                  d_theta=jnp.asarray(a["d_theta"])),
        t=jnp.asarray(a["t"]),
    )


def frame_at(batch: Frame, i: int) -> Frame:
    """Select frame i from a stacked Frame batch."""
    import jax
    return jax.tree.map(lambda x: x[i], batch)


__all__ = ["RecordedFrame", "read_recording", "write_recording",
           "read_map_checkpoint", "write_map_checkpoint", "frames_to_arrays",
           "frames_to_device", "frame_at"]
