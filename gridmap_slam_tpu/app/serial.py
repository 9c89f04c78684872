"""Serial-port transport: the reference's second IConnection.

Reference behavior: conn/SerialConnection.java — port enumeration (:59-74),
baud selection with 115200 default (:18-19), a DTR reset dance on connect
(:50-56, clears then raises DTR so Arduino-style boards reboot into a known
state), and byte streams handed to the same parser as the TCP transport.

This implementation uses POSIX termios directly (no third-party dependency;
pyserial is not in the image) and exposes the socket-like surface
(`recv`/`sendall`/`settimeout`/`close`) that `app.pipeline.RobotLink`
expects, so serial robots ride the exact same native parser/command path as
network robots.
"""

from __future__ import annotations

import fcntl
import glob
import os
import select
import struct
import termios
from typing import List, Optional

DEFAULT_BAUD = 115200       # conn/SerialConnection.java:18

_BAUD_CONSTANTS = {
    9600: termios.B9600, 19200: termios.B19200, 38400: termios.B38400,
    57600: termios.B57600, 115200: termios.B115200,
    230400: getattr(termios, "B230400", termios.B115200),
}

# TIOCM DTR bit for the reset dance (SerialConnection.java:50-56).
_TIOCM_DTR = 0x002
_TIOCMBIS = getattr(termios, "TIOCMBIS", 0x5416)
_TIOCMBIC = getattr(termios, "TIOCMBIC", 0x5417)


def list_ports() -> List[str]:
    """Enumerate candidate serial devices (SerialConnection.java:59-74)."""
    out: List[str] = []
    for pattern in ("/dev/ttyUSB*", "/dev/ttyACM*", "/dev/ttyAMA*",
                    "/dev/cu.usbserial*", "/dev/cu.usbmodem*"):
        out.extend(sorted(glob.glob(pattern)))
    return out


class SerialStream:
    """A serial port with the socket-like surface RobotLink expects."""

    def __init__(self, port: str, baud: int = DEFAULT_BAUD,
                 dtr_reset: bool = True, timeout: Optional[float] = 1.0):
        if baud not in _BAUD_CONSTANTS:
            raise ValueError(f"unsupported baud {baud}; "
                             f"choose from {sorted(_BAUD_CONSTANTS)}")
        self.port = port
        self._timeout = timeout
        self.fd = os.open(port, os.O_RDWR | os.O_NOCTTY | os.O_NONBLOCK)
        try:
            self._configure(_BAUD_CONSTANTS[baud])
            if dtr_reset:
                self._dtr_reset()
        except Exception:
            os.close(self.fd)
            raise

    def _configure(self, baud_const: int) -> None:
        """Raw 8N1 mode at the requested baud."""
        attrs = termios.tcgetattr(self.fd)
        iflag, oflag, cflag, lflag, _, _, cc = attrs
        iflag = 0
        oflag = 0
        lflag = 0
        cflag = (cflag & ~(termios.CSIZE | termios.PARENB | termios.CSTOPB)
                 ) | termios.CS8 | termios.CREAD | termios.CLOCAL
        cc = list(cc)
        cc[termios.VMIN] = 0
        cc[termios.VTIME] = 0
        termios.tcsetattr(self.fd, termios.TCSANOW,
                          [iflag, oflag, cflag, lflag,
                           baud_const, baud_const, cc])
        termios.tcflush(self.fd, termios.TCIOFLUSH)

    def _dtr_reset(self) -> None:
        """Drop then raise DTR so Arduino-style boards reset
        (SerialConnection.java:50-56)."""
        import time
        bit = struct.pack("I", _TIOCM_DTR)
        fcntl.ioctl(self.fd, _TIOCMBIC, bit)
        time.sleep(0.1)
        fcntl.ioctl(self.fd, _TIOCMBIS, bit)
        time.sleep(0.5)
        termios.tcflush(self.fd, termios.TCIFLUSH)

    # ---- socket-like surface (what RobotLink/SlamPipeline use) ----
    def settimeout(self, timeout: Optional[float]) -> None:
        self._timeout = timeout

    def recv(self, n: int) -> bytes:
        r, _, _ = select.select([self.fd], [], [], self._timeout)
        if not r:
            raise TimeoutError(f"serial read timeout on {self.port}")
        return os.read(self.fd, n)

    def sendall(self, data: bytes) -> None:
        view = memoryview(data)
        while view:
            _, w, _ = select.select([], [self.fd], [], self._timeout)
            if not w:
                raise TimeoutError(f"serial write timeout on {self.port}")
            sent = os.write(self.fd, view)
            view = view[sent:]

    def close(self) -> None:
        if self.fd >= 0:
            try:
                os.close(self.fd)
            finally:
                self.fd = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
