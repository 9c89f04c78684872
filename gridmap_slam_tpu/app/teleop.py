"""Interactive teleoperation: keyboard -> wheel-speed references.

The reference drives the robot from an ImGui panel of arrow buttons that set
the two wheel speed references via command 0x10 + two BE floats
(conn/ConnectionManager.java:143-215).  Headless equivalent: raw-mode
keyboard input on stdin mapped to (left, right) wheel speeds, sent through
RobotLink.set_speeds each time the key state changes.

Key map (WASD or arrows; space = stop, q = quit, +/- = speed trim):

    w / up      forward         (v, v)
    s / down    reverse         (-v, -v)
    a / left    spin left       (-v, v)
    d / right   spin right      (v, -v)
"""

from __future__ import annotations

import os
import select
import sys
from typing import Optional, Tuple

# Arrow keys arrive as ESC [ A/B/C/D; normalize to these tokens.
_ARROWS = {"A": "up", "B": "down", "C": "right", "D": "left"}


def key_to_speeds(key: str, speed: float) -> Optional[Tuple[float, float]]:
    """Pure key -> (left, right) wheel-speed mapping (rad/s); None = not a
    drive key.  Mirrors the reference's four arrow buttons + stop
    (conn/ConnectionManager.java:185-215)."""
    k = key.lower()
    if k in ("w", "up"):
        return (speed, speed)
    if k in ("s", "down"):
        return (-speed, -speed)
    if k in ("a", "left"):
        return (-speed, speed)
    if k in ("d", "right"):
        return (speed, -speed)
    if k == " ":
        return (0.0, 0.0)
    return None


def trim_speed(key: str, speed: float, step: float = 0.5,
               lo: float = 0.5, hi: float = 20.0) -> float:
    """+/- keys adjust the teleop speed magnitude (the reference exposes a
    speed slider next to its arrow buttons, conn/ConnectionManager.java:62)."""
    if key == "+":
        return min(speed + step, hi)
    if key == "-":
        return max(speed - step, lo)
    return speed


class StdinKeys:
    """Non-blocking raw-mode key reader for the teleop loop.

    Context manager: puts the controlling terminal in cbreak mode on entry
    and restores it on exit.  `poll()` returns a list of normalized key
    tokens ('w', 'up', ' ', 'q', ...) available right now.  When stdin is
    not a tty (tests, pipes) it reads whatever bytes are available without
    touching terminal modes.
    """

    def __init__(self, fd: Optional[int] = None):
        self.fd = sys.stdin.fileno() if fd is None else fd
        self._saved = None

    def __enter__(self):
        if os.isatty(self.fd):
            import termios
            import tty
            self._saved = termios.tcgetattr(self.fd)
            tty.setcbreak(self.fd)
        return self

    def __exit__(self, *exc):
        if self._saved is not None:
            import termios
            termios.tcsetattr(self.fd, termios.TCSADRAIN, self._saved)
        return False

    def poll(self) -> list:
        keys = []
        buf = b""
        while select.select([self.fd], [], [], 0)[0]:
            chunk = os.read(self.fd, 64)
            if not chunk:
                break
            buf += chunk
        i = 0
        while i < len(buf):
            b = buf[i]
            if b == 0x1B and i + 2 < len(buf) and buf[i + 1:i + 2] == b"[":
                tok = _ARROWS.get(chr(buf[i + 2]))
                if tok:
                    keys.append(tok)
                i += 3
                continue
            keys.append(chr(b))
            i += 1
        return keys


class TeleopController:
    """Stateful teleop: feed keys, it issues set_speeds on changes only.

    `send` is any callable(left, right) — RobotLink.set_speeds in the live
    CLI, a recording stub in tests.  Returns False from handle() when the
    operator quits ('q')."""

    def __init__(self, send, speed: float = 5.0):
        self.send = send
        self.speed = speed
        self.current = (0.0, 0.0)

    def handle(self, key: str) -> bool:
        if key.lower() == "q":
            self.stop()
            return False
        new_speed = trim_speed(key, self.speed)
        if new_speed != self.speed:
            self.speed = new_speed
            # re-scale an active motion to the new magnitude
            if self.current != (0.0, 0.0):
                sl = 1.0 if self.current[0] > 0 else -1.0
                sr = 1.0 if self.current[1] > 0 else -1.0
                self._set((sl * self.speed, sr * self.speed))
            return True
        speeds = key_to_speeds(key, self.speed)
        if speeds is not None:
            self._set(speeds)
        return True

    def stop(self):
        self._set((0.0, 0.0))

    def _set(self, speeds):
        if speeds != self.current:
            self.current = speeds
            self.send(*speeds)
