"""Profiling / observability hooks.

The reference hand-rolls wall-clock spans per phase (reference:
engine/trainer.py:333-425, evaluator.py:322-327) and reports static FLOPs via
ptflops.  TPU-native equivalents:

* phase timing dicts with the same key schema (data_time / forward_time /
  batch_time ...) — kept by the engines;
* :class:`TraceSession` wraps ``jax.profiler`` so any engine loop can dump an
  XPlane trace (viewable in TensorBoard / xprof) via config
  ``training.profile_dir`` — device timelines replace the reference's
  CUDA-event guesswork;
* :func:`enable_nan_checks` flips jax_debug_nans (config
  ``training.debug_nans``), the jit-world analogue of anomaly detection.
"""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    if enable:
        logger.info("jax_debug_nans enabled: any NaN under jit raises immediately")


class TraceSession:
    """Profile a bounded number of steps into an xprof trace directory."""

    def __init__(self, trace_dir: Optional[str], num_steps: int = 5,
                 skip_steps: int = 1):
        self.trace_dir = trace_dir
        self.num_steps = num_steps
        self.skip_steps = skip_steps  # let compiles/warmup pass first
        self._step = 0
        self._active = False

    def step(self) -> None:
        """Call once per engine step; starts/stops the trace at the bounds."""
        if not self.trace_dir:
            return
        self._step += 1
        if self._step == self.skip_steps + 1 and not self._active:
            Path(self.trace_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            logger.info(f"profiler trace started -> {self.trace_dir}")
        elif self._active and self._step > self.skip_steps + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            logger.info(f"profiler trace written to {self.trace_dir}")

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def phase_timer(timing: Dict[str, float], key: str) -> Iterator[None]:
    """Accumulate a wall-clock span under the reference's timing-key schema."""
    t0 = time.time()
    try:
        yield
    finally:
        timing[key] = timing.get(key, 0.0) + (time.time() - t0)
