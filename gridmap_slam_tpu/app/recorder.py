"""Record / replay of timestamped frames — the dataset system.

Reference behavior: app/DataRecorder.java.  States IDLE/RECORD/REPLAY;
recording captures frames with elapsed timestamps; replay republishes frames
when their timestamp elapses (or immediately on single-step), reading/writing
the binary format in io/recording.py.  Replay output is indistinguishable
from live data (SURVEY.md §3.4)."""

from __future__ import annotations

import enum
import time
from pathlib import Path
from typing import Callable, List, Optional

from ..io.recording import RecordedFrame, read_recording, write_recording


class State(enum.Enum):
    IDLE = 0
    RECORD = 1
    REPLAY = 2


class DataRecorder:
    """Frame recorder/replayer (app/DataRecorder.java:62-436)."""

    def __init__(self, publish: Callable[[RecordedFrame], None],
                 directory: str = "maps"):
        self.publish = publish
        self.directory = Path(directory)
        self.state = State.IDLE
        self.frames: List[RecordedFrame] = []
        self.current_time = 0.0
        self.frame_counter = 0
        self.paused = False
        self._force_next = False

    # ---- recording ----
    def begin_record(self) -> None:
        self.state = State.RECORD
        self.frames = []
        self.current_time = 0.0
        self.frame_counter = 0

    def on_frame(self, frame: RecordedFrame) -> None:
        """Call for every live frame; captured while recording
        (app/DataRecorder.java:367-378)."""
        if self.state is State.RECORD and not self.paused:
            frame.t = self.current_time
            self.frames.append(frame)
            self.frame_counter += 1

    def save(self, name: str) -> Path:
        self.directory.mkdir(parents=True, exist_ok=True)
        path = self.directory / name
        write_recording(path, self.frames)
        return path

    # ---- replay ----
    def load(self, path) -> int:
        self.frames = read_recording(path)
        return len(self.frames)

    def begin_replay(self) -> None:
        self.state = State.REPLAY
        self.current_time = 0.0
        self.frame_counter = 0

    def step_once(self) -> None:
        """Force-publish the next frame regardless of its timestamp
        (the reference's "Step" button, app/DataRecorder.java:330-333)."""
        if self.state is State.REPLAY:
            self._force_next = True

    def stop(self) -> None:
        self.state = State.IDLE
        self.paused = False

    def update(self, delta: float) -> Optional[RecordedFrame]:
        """Advance the clock by `delta` seconds and publish at most one due
        frame (app/DataRecorder.java:336-364).  Returns it if published."""
        if not self.paused:
            self.current_time += delta
        if self.state is not State.REPLAY:
            return None
        if self.frame_counter >= len(self.frames):
            self.stop()
            return None
        frame = self.frames[self.frame_counter]
        if self.current_time >= frame.t or self._force_next:
            if self._force_next:
                self.current_time = frame.t
            self._force_next = False
            self.frame_counter += 1
            self.publish(frame)
            return frame
        return None

    def replay_all(self, realtime: bool = False) -> int:
        """Convenience: replay every loaded frame through `publish`.
        With realtime=True, sleeps to honor inter-frame timestamps."""
        self.begin_replay()
        n = 0
        last_t = 0.0
        for frame in self.frames[self.frame_counter:]:
            if realtime and frame.t > last_t:
                time.sleep(frame.t - last_t)
            last_t = frame.t
            self.frame_counter += 1
            self.publish(frame)
            n += 1
        self.stop()
        return n

    def list_recordings(self) -> List[str]:
        """Available recording files (app/DataRecorder.java:267-273)."""
        if not self.directory.is_dir():
            return []
        return sorted(p.name for p in self.directory.iterdir() if p.is_file())
