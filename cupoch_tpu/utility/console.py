"""Logging / verbosity, mirroring the reference's spdlog wrapper
(src/cupoch/utility/console.h:30-93) with Python stdlib logging."""
from __future__ import annotations

import enum
import logging
import sys
import time


class VerbosityLevel(enum.IntEnum):
    Off = 0
    Fatal = 1
    Error = 2
    Warning = 3
    Info = 4
    Debug = 5


_LEVEL_MAP = {
    VerbosityLevel.Off: logging.CRITICAL + 10,
    VerbosityLevel.Fatal: logging.CRITICAL,
    VerbosityLevel.Error: logging.ERROR,
    VerbosityLevel.Warning: logging.WARNING,
    VerbosityLevel.Info: logging.INFO,
    VerbosityLevel.Debug: logging.DEBUG,
}

logger = logging.getLogger("cupoch_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[cupoch_tpu %(levelname)s] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.WARNING)

_verbosity = VerbosityLevel.Warning


def set_verbosity_level(level: VerbosityLevel) -> None:
    global _verbosity
    _verbosity = VerbosityLevel(level)
    logger.setLevel(_LEVEL_MAP[_verbosity])


def get_verbosity_level() -> VerbosityLevel:
    return _verbosity


def log_error(msg, *args):
    logger.error(msg, *args)
    raise RuntimeError(msg % args if args else msg)


def log_warning(msg, *args):
    logger.warning(msg, *args)


def log_info(msg, *args):
    logger.info(msg, *args)


def log_debug(msg, *args):
    logger.debug(msg, *args)


class ConsoleProgressBar:
    """Text progress bar (reference: utility/console.h ConsoleProgressBar)."""

    def __init__(self, expected_count: int, progress_info: str = "", active: bool = True):
        self.expected = max(int(expected_count), 1)
        self.info = progress_info
        self.active = active
        self.count = 0
        self._last = 0.0

    def step(self, n: int = 1):
        self.count += n
        now = time.time()
        if self.active and (now - self._last > 0.1 or self.count >= self.expected):
            frac = min(self.count / self.expected, 1.0)
            bar = "=" * int(frac * 40)
            sys.stderr.write(f"\r{self.info} [{bar:<40}] {frac*100:5.1f}%")
            if self.count >= self.expected:
                sys.stderr.write("\n")
            sys.stderr.flush()
            self._last = now
        return self

    __iadd__ = step
