"""Leveled console logging.

TPU-native equivalent of the reference's Verbose class
(/root/reference/include/System.h:44-69: VERBOSITY_QUIET/NORMAL/VERBOSE/
VERY_VERBOSE/DEBUG with PrintMess, default QUIET set at System.cc:239).
"""
from __future__ import annotations

import enum
import sys


class Level(enum.IntEnum):
    QUIET = 0
    NORMAL = 1
    VERBOSE = 2
    VERY_VERBOSE = 3
    DEBUG = 4


_level = Level.QUIET


def set_level(level: Level):
    global _level
    _level = Level(level)


def get_level() -> Level:
    return _level


def print_mess(msg: str, level: Level = Level.NORMAL):
    """Print when the configured verbosity admits `level` (reference
    Verbose::PrintMess)."""
    if level <= _level:
        print(msg, file=sys.stderr, flush=True)
