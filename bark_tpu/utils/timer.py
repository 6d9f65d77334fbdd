"""Phase-keyed wall timers and BO-trace loggers.

Parity: src/bark/utils/timer.py:6-22 (dict-based context-manager Timer used
by the BO driver to record fit/optimize seconds per iteration) and
src/bark/utils/logger.py:12-103 (loss/BO-history recorders). Device work is
timed correctly by synchronizing on block_until_ready at phase exit.
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer(dict):
    """``with timer(key="fit"): ...`` accumulates seconds per phase."""

    @contextlib.contextmanager
    def __call__(self, key: str, sync: bool = True):
        start = time.perf_counter()
        try:
            yield self
        finally:
            if sync:
                # flush async-dispatched device work before stopping the clock
                jax.effects_barrier()
            self[key] = self.get(key, 0.0) + (time.perf_counter() - start)


class BOLogger:
    """Records the BO trace: proposals, observations, best-so-far, times."""

    def __init__(self):
        self.candidates = []
        self.observations = []
        self.best = []
        self.times = []

    def log_iteration(self, candidate, y, timer: Timer):
        self.candidates.append(candidate)
        y = float(y)
        self.observations.append(y)
        prev = self.best[-1] if self.best else float("inf")
        self.best.append(min(prev, y))
        self.times.append(dict(timer))

    def as_rows(self):
        for i, (y, b, t) in enumerate(
            zip(self.observations, self.best, self.times)
        ):
            yield {"iteration": i, "y": y, "best": b, **t}
