"""Sharded SLAM-state checkpoint/restore via Orbax.

The reference checkpoints only maps and recordings (slam/GridMapLoader.java,
app/DataRecorder.java) and cannot serialize mid-run filter state (SURVEY.md
§5).  Here the full SlamState pytree — particle poses, log-weights, all
per-particle occupancy grids, and the PRNG key — is saved/restored, including
sharded arrays on a device mesh (Orbax handles per-shard layout natively),
which is the recovery story for multi-host runs: on failure, restart from the
last checkpoint.
"""

from __future__ import annotations

import os

import jax

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                                    # pragma: no cover
    _HAVE_ORBAX = False


def save_state(path: str, state) -> None:
    """Save a SlamState (or any pytree of arrays) to `path`."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax-checkpoint is not available")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, template):
    """Restore a pytree saved with save_state; `template` is an abstract or
    concrete pytree with the target structure/sharding."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax-checkpoint is not available")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None)),
        template)
    return ckptr.restore(path, abstract)
