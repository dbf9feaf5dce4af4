"""Logging/observability.

The reference logs through glog (structured LOG(INFO) lines, e.g. the loss
decomposition at ials.h:297-304 and per-epoch timers at
run_model.cc:263-266). We mirror the same line formats through Python
logging so downstream log parsers keep working.
"""

from __future__ import annotations

import logging
import sys
import time

LOGGER_NAME = "safer2_recommender_tpu"


def get_logger() -> logging.Logger:
    return logging.getLogger(LOGGER_NAME)


def setup(level: int = logging.INFO) -> logging.Logger:
    log = get_logger()
    if not log.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(levelname).1s%(asctime)s %(name)s] %(message)s",
            datefmt="%m%d %H:%M:%S"))
        log.addHandler(h)
    # our handler owns these lines; propagating to a configured root
    # logger would emit every line twice in embedding applications
    log.propagate = False
    log.setLevel(level)
    return log


class Timer:
    """Wall-clock span in milliseconds (reference uses
    std::chrono::steady_clock, run_model.cc:259-266)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = int((time.perf_counter() - self.start) * 1000)
        return False
