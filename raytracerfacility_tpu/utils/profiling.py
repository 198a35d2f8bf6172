"""Tracing / profiling / observability.

The reference has essentially none of this (SURVEY.md section 5: an OptiX
log callback and PTX line info are the closest artifacts). The rebuild adds
first-class observability:

* :func:`trace` — wrap a block in a ``jax.profiler`` trace (view in
  TensorBoard / Perfetto)
* :class:`PassTimer` — cheap wall-clock timing of named device passes with
  ``block_until_ready`` fencing (the CUDA_SYNC_CHECK analog,
  ref Optix7.hpp:47-56, minus the exit(2))
* :func:`log` — the UNIENGINE_LOG/ERROR stand-in on Python logging
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger("raytracerfacility_tpu")


def log(message: str, level: int = logging.INFO) -> None:
    logger.log(level, message)


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: ``with trace('/tmp/rtf-trace'): render(...)``."""
    with jax.profiler.trace(log_dir):
        yield


class PassTimer:
    """Accumulates per-pass wall times.

    Usage::

        timer = PassTimer()
        with timer.time("render"):
            frame = render_frame_jit(...)
        timer.report()
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        start = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            value = box.get("result", result)
            if value is not None:
                jax.block_until_ready(value)
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, dict]:
        out = {}
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            out[name] = {"total_s": total, "count": n, "mean_ms": total / n * 1e3}
            log(f"pass {name}: {n}x, mean {total / n * 1e3:.2f} ms")
        return out

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
