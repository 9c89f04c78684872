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


def run_with_recovery(step_fn, state, frames, *, checkpoint_dir: str,
                      every: int = 10, max_restarts: int = 3,
                      is_healthy=None, on_event=None):
    """Failure-detecting replay driver: checkpoint every `every` scans,
    detect faults (exceptions from the step/device AND non-finite state,
    checked at checkpoint cadence), and resume from the last good
    checkpoint.

    The reference has no recovery story at all (SURVEY.md §5: IO errors just
    print stack traces); this is the checkpoint-restart loop that SURVEY
    prescribes for multi-host runs, usable on one chip too.

    step_fn(state, frame) -> (state, info);  frames: indexable sequence.
    is_healthy(state) -> bool overrides the default finite-pose check.
    on_event(kind, detail) observes 'checkpoint'/'fault'/'restore' events.
    Returns (state, infos, report_dict).
    """
    import math

    import numpy as np

    def default_healthy(s):
        poses = np.asarray(jax.device_get(s.poses))
        return bool(np.isfinite(poses).all())

    healthy = is_healthy or default_healthy
    notify = on_event or (lambda kind, detail: None)
    os.makedirs(checkpoint_dir, exist_ok=True)
    ckpt_path = os.path.join(checkpoint_dir, "latest")

    save_state(ckpt_path, state)
    last_good = 0
    restarts = 0
    infos = []
    i = 0
    n = len(frames)
    while i < n:
        try:
            state2, info = step_fn(state, frames[i])
            checkpoint_due = (i + 1) % every == 0 or i + 1 == n
            if checkpoint_due and not healthy(state2):
                raise FloatingPointError(
                    f"non-finite filter state after scan {i}")
            state = state2
            infos.append(info)
            i += 1
            if checkpoint_due:
                save_state(ckpt_path, state)
                notify("checkpoint", {"scan": i})
                last_good = i
        except Exception as e:                       # device fault, NaNs, ...
            restarts += 1
            notify("fault", {"scan": i, "error": repr(e),
                             "restart": restarts})
            if restarts > max_restarts:
                raise RuntimeError(
                    f"run_with_recovery: {restarts - 1} restarts exhausted "
                    f"at scan {i}") from e
            state = restore_state(ckpt_path, state)
            infos = infos[:last_good]
            i = last_good
            notify("restore", {"scan": i})
    report = {"scans": n, "restarts": restarts, "last_checkpoint": last_good}
    return state, infos, report
