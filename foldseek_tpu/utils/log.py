"""Logging + timers. The reference has 4 debug levels and per-command wall
time reporting (reference: lib/mmseqs/src/commons/Debug.h:46-49,
Application.cpp:44-49); we map those onto the stdlib logger."""
from __future__ import annotations

import logging
import sys
import time

logger = logging.getLogger("foldseek_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[%(levelname).1s %(asctime)s] %(message)s", "%H:%M:%S"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

VERBOSITY_TO_LEVEL = {0: logging.CRITICAL, 1: logging.ERROR, 2: logging.WARNING, 3: logging.INFO}


def set_verbosity(v: int):
    logger.setLevel(VERBOSITY_TO_LEVEL.get(int(v), logging.INFO))


class Timer:
    def __init__(self, label: str = ""):
        self.label = label

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        if self.label:
            logger.info("Time for %s: %.3fs", self.label, self.elapsed)
