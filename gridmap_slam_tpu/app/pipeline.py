"""Host-side data pipeline: live robot connection -> frames -> SLAM engine.

The reference's transport/plumbing layers (SURVEY.md L3/L4): a reader thread
parses the wire protocol into TimeFrames (conn/ConnectionThread.java), a
bounded queue hands them to the processing loop (app/DataEventHandler.java,
ArrayBlockingQueue(20)), and ConnectionManager sends command bytes back
(conn/ConnectionManager.java).

Here: `RobotLink` wraps a TCP socket (or any byte stream) with the native C++
streaming parser on the read side and the native command encoders on the
write side; `SlamPipeline` runs the reader in a thread feeding a bounded
queue and drains frames into the engine on the caller's thread (single
producer / single consumer, mirroring the reference's threading-by-
construction safety).  `LoopbackRobot` serves the native robot simulator
over a socketpair so the whole live path is testable without hardware.
"""

from __future__ import annotations

import queue
import socket
import struct
import threading
import time
from typing import Callable, List, Optional

import numpy as np

from ..config import RobotConfig
from .. import native

# Command bytes (conn/ConnectionManager.java:40-44, esp32/sensor.cpp:70-109).
CMD_SENSOR_ONCE = 0x01
CMD_SENSOR_ENABLE = 0x02
CMD_SENSOR_DISABLE = 0x04
CMD_SENSOR_HOME = 0x05
CMD_SET_RESOLUTION = 0x08
CMD_SET_SPEEDS = 0x10
CMD_PID_KP, CMD_PID_KI, CMD_PID_KD, CMD_PID_TF = 0x15, 0x16, 0x17, 0x18

DEFAULT_PORT = 5555          # esp32/esp32.ino:12


class RobotLink:
    """Bidirectional link to a robot: parses measurement packets, encodes
    commands.  `sock` is any connected socket-like with send/recv."""

    def __init__(self, sock, robot: RobotConfig = RobotConfig(),
                 max_range: float = 10.0):
        self.sock = sock
        self.robot = robot
        self.max_range = max_range
        self.parser = native.WireParser()
        self._lib = native.load()

    @classmethod
    def connect(cls, host: str, port: int = DEFAULT_PORT, timeout: float = 10.0,
                **kw) -> "RobotLink":
        s = socket.create_connection((host, port), timeout=timeout)
        s.settimeout(1.0)
        return cls(s, **kw)

    @classmethod
    def connect_serial(cls, port: str, baud: int = 115200,
                       dtr_reset: bool = True, **kw) -> "RobotLink":
        """Serial transport (reference conn/SerialConnection.java): same
        parser/command path over a termios serial stream."""
        from .serial import SerialStream
        return cls(SerialStream(port, baud, dtr_reset=dtr_reset), **kw)

    # ---- commands (host -> robot) ----
    def _send(self, data: bytes) -> None:
        self.sock.sendall(data)

    def sensor_once(self):   self._send(bytes([CMD_SENSOR_ONCE]))
    def sensor_enable(self): self._send(bytes([CMD_SENSOR_ENABLE]))
    def sensor_disable(self): self._send(bytes([CMD_SENSOR_DISABLE]))
    def sensor_home(self):   self._send(bytes([CMD_SENSOR_HOME]))

    def set_resolution(self, degrees: int) -> None:
        self._send(bytes([CMD_SET_RESOLUTION, degrees & 0xFF]))

    def set_speeds(self, left: float, right: float) -> None:
        out = np.zeros(16, np.uint8)
        n = self._lib.gs_encode_wheel_speeds(left, right, out)
        self._send(bytes(out[:n]))

    def set_pid(self, kp=None, ki=None, kd=None, tf=None) -> None:
        for cmd, v in ((CMD_PID_KP, kp), (CMD_PID_KI, ki),
                       (CMD_PID_KD, kd), (CMD_PID_TF, tf)):
            if v is not None:
                self._send(bytes([cmd]) + struct.pack(">f", v))

    # ---- data (robot -> host) ----
    def poll(self) -> List:
        """Read available bytes, return any completed frames
        (io.recording.RecordedFrame, t=arrival time)."""
        try:
            data = self.sock.recv(65536)
        except (socket.timeout, BlockingIOError):
            data = b""
        if data:
            self.parser.feed(data)
        frames = native.wire_to_frames(self.parser, self.robot,
                                       self.max_range)
        now = time.monotonic()
        for f in frames:
            f.t = now
        return frames

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class SlamPipeline:
    """Reader thread -> bounded queue -> caller-side drain.

    Mirrors DataEventHandler's contract: `publish` blocks when the queue is
    full (app/DataEventHandler.java:64-70) and subscribers run only on the
    draining thread (:75-89)."""

    def __init__(self, link: RobotLink, maxsize: int = 20):
        self.link = link
        self.queue: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.subscribers: List[Callable] = []

    def subscribe(self, fn: Callable) -> None:
        self.subscribers.append(fn)

    def start(self) -> None:
        self._thread = threading.Thread(target=self._reader, daemon=True)
        self._thread.start()

    def _reader(self) -> None:
        while not self._stop.is_set():
            for f in self.link.poll():
                self.queue.put(f)          # blocking put = backpressure
            time.sleep(0.001)

    def handle_events(self, max_events: int = 1) -> int:
        """Drain up to max_events frames into the subscribers on THIS thread
        (the reference processes 1 frame per render frame,
        app/GridMapApp.java:217).  Returns the number handled."""
        n = 0
        while n < max_events:
            try:
                f = self.queue.get_nowait()
            except queue.Empty:
                break
            for fn in self.subscribers:
                fn(f)
            n += 1
        return n

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)


class LoopbackRobot:
    """The native robot simulator served over a socketpair: a live robot for
    tests and demos (the reference's firmware stack, minus the hardware).

    Handles the command subset that matters for data flow: 0x02/0x04
    enable/disable streaming, 0x01 one revolution, 0x08 resolution,
    0x10 wheel speed references."""

    def __init__(self, world: np.ndarray, seed: int = 1,
                 range_noise_sd: float = 0.01):
        self.sim = native.RobotSim(world, seed=seed)
        self.range_noise_sd = range_noise_sd
        self.host_sock, self._robot_sock = socket.socketpair()
        self.host_sock.settimeout(1.0)
        self._robot_sock.settimeout(0.05)
        self._stop = threading.Event()
        self._streaming = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        buf = b""
        while not self._stop.is_set():
            try:
                data = self._robot_sock.recv(4096)
                buf += data
            except socket.timeout:
                pass
            except OSError:
                break
            buf = self._handle_commands(buf)
            if self._streaming.is_set():
                try:
                    self._robot_sock.sendall(
                        self.sim.revolution(self.range_noise_sd))
                except OSError:
                    break

    def _handle_commands(self, buf: bytes) -> bytes:
        i = 0
        while i < len(buf):
            c = buf[i]
            if c == CMD_SENSOR_ENABLE:
                self._streaming.set(); i += 1
            elif c == CMD_SENSOR_DISABLE:
                self._streaming.clear(); i += 1
            elif c == CMD_SENSOR_ONCE:
                try:
                    self._robot_sock.sendall(
                        self.sim.revolution(self.range_noise_sd))
                except OSError:
                    pass
                i += 1
            elif c == CMD_SENSOR_HOME:
                self.sim.home(); i += 1
            elif c == CMD_SET_RESOLUTION:
                if i + 1 >= len(buf):
                    break
                self.sim.set_resolution(buf[i + 1]); i += 2
            elif c == CMD_SET_SPEEDS:
                if i + 8 >= len(buf):
                    break
                left, right = struct.unpack_from(">ff", buf, i + 1)
                self.sim.set_speeds(left, right); i += 9
            elif c in (CMD_PID_KP, CMD_PID_KI, CMD_PID_KD, CMD_PID_TF):
                if i + 4 >= len(buf):
                    break
                i += 5
            else:
                i += 1                     # unknown byte: skip (resync)
        return buf[i:]

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)
        for s in (self.host_sock, self._robot_sock):
            try:
                s.close()
            except OSError:
                pass
