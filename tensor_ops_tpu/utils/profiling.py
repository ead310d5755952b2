"""Tracing / profiling helpers (SURVEY.md §5).

The reference's only instrumentation is a wall-clock ``time`` helper with
deepseq forcing (``app/Dots.hs:158-166``).  The rebuild pairs honest
block-until-ready step timing with ``jax.profiler`` device traces for
TensorBoard/xprof."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall timing with device sync; reports p50/p90/mean."""

    def __init__(self):
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            try:
                import jax

                jax.block_until_ready(result)
            except Exception:
                pass
        assert self._t0 is not None, "StepTimer.stop() without start()"
        self.samples.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        out = {}
        try:
            yield out
        finally:
            self.stop(out.get("result"))

    def summary(self) -> dict:
        if not self.samples:
            return {"n": 0}
        s = sorted(self.samples)
        n = len(s)
        return {
            "n": n,
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p90_s": s[min(n - 1, int(0.9 * n))],
            "total_s": sum(s),
        }


def enable_nan_checks(enable: bool = True) -> None:
    """Turn on jax's NaN debugging (``jax_debug_nans``) — the numerical
    analog of the race detection the reference gets for free from purity
    (SURVEY.md §5)."""
    import jax

    jax.config.update("jax_debug_nans", bool(enable))
