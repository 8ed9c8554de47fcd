"""Step timing + profiler hooks.

The reference's only instrument is a wall-clock print around validation
(main_target.py:806,1035-1037). Here: a rate meter for steps/sec (used by the
trainers' stdout lines and bench.py) and a jax.profiler trace context for
capturing device traces (SURVEY.md section 5.1).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.count = 0

    def tick(self, n: int = 1):
        self.count += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def rate(self) -> float:
        e = self.elapsed
        return self.count / e if e > 0 else 0.0


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace when a logdir is given, no-op otherwise."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
