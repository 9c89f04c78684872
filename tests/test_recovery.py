"""Failure detection + checkpoint-restart recovery (SURVEY.md §5: the
reference has none; the build's story is restart-from-checkpoint)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gridmap_slam_tpu import RBPF, SlamConfig
from gridmap_slam_tpu.io import frame_at, frames_to_device
from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                           simulate_log,
                                           square_path_controls)
from gridmap_slam_tpu.utils.checkpoint import run_with_recovery

pytest.importorskip("orbax.checkpoint")


@pytest.fixture(scope="module")
def setup():
    cfg = SlamConfig(num_particles=8, max_beams=64)
    eng = RBPF(cfg)
    frames, _ = simulate_log(default_world(), square_path_controls(6),
                             params=SimParams(beams_per_rev=60), seed=5)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    flist = [frame_at(batch, i) for i in range(len(frames))]
    return cfg, eng, flist


def test_recovery_resumes_from_checkpoint(tmp_path, setup):
    """A transient device fault mid-run is retried from the last checkpoint
    and the run completes; the final state matches a fault-free run."""
    cfg, eng, flist = setup
    step = jax.jit(eng.step)
    events = []
    fail_at = {4}            # fault once, on first visit to scan 4

    def flaky_step(state, frame):
        idx = len(flaky_step.seen)
        flaky_step.seen.append(idx)
        if idx in fail_at:
            fail_at.clear()
            raise RuntimeError("injected device fault")
        return step(state, frame)

    flaky_step.seen = []

    state, infos, report = run_with_recovery(
        flaky_step, eng.init(jax.random.key(0)), flist,
        checkpoint_dir=str(tmp_path / "ck"), every=2,
        on_event=lambda k, d: events.append(k))
    assert report["restarts"] == 1
    assert len(infos) == len(flist)
    assert "fault" in events and "restore" in events

    # fault-free reference run from the same key
    state_ref, _ = eng.run_log(eng.init(jax.random.key(0)), flist)
    np.testing.assert_allclose(np.asarray(state.poses),
                               np.asarray(state_ref.poses), atol=1e-5)


def test_recovery_detects_nonfinite_state(tmp_path, setup):
    """Health check: a step that silently produces NaN poses is detected at
    checkpoint cadence and retried; persistent corruption exhausts restarts."""
    cfg, eng, flist = setup
    step = jax.jit(eng.step)

    def poisoning_step(state, frame):
        s, info = step(state, frame)
        return s.replace(poses=s.poses * jnp.nan), info

    with pytest.raises(RuntimeError, match="restarts exhausted"):
        run_with_recovery(poisoning_step, eng.init(jax.random.key(0)),
                          flist, checkpoint_dir=str(tmp_path / "ck2"),
                          every=2, max_restarts=2)
