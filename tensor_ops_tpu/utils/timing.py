"""Wall-clock phase timing (the reference's ``time`` helper,
``app/Dots.hs:158-166`` / ``app/MNIST.hs:413-421``), made honest on an
async accelerator with ``jax.block_until_ready``."""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple


def block(x: Any) -> Any:
    try:
        import jax

        return jax.block_until_ready(x)
    except Exception:
        return x


def timed(f: Callable) -> Tuple[Any, float]:
    """Run ``f()``, force the result, return (result, seconds)."""
    t0 = time.perf_counter()
    out = block(f())
    t1 = time.perf_counter()
    return out, t1 - t0
