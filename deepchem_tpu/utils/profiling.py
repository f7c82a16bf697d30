"""Tracing/profiling hooks (SURVEY.md section 5: the reference has only
wall-clock fit logs; the TPU equivalent is jax.profiler traces + per-step
timing)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax-trace'):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info('profiler trace written to %s', log_dir)


class StepTimer:
    """Per-step timing callback for JaxModel.fit(callbacks=[...]).

    Records wall-clock per training step and prints a summary; use
    ``timer.summary()`` for (mean, p50, p95) milliseconds.
    """

    def __init__(self, warmup_steps: int = 3):
        self.warmup_steps = warmup_steps
        self._last: Optional[float] = None
        self.times: List[float] = []
        self._step0: Optional[int] = None

    def __call__(self, model, step: int) -> None:
        now = time.time()
        if self._step0 is None:
            self._step0 = step
        if self._last is not None and \
                step - self._step0 >= self.warmup_steps:
            self.times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        import numpy as np
        if not self.times:
            return {'mean_ms': 0.0, 'p50_ms': 0.0, 'p95_ms': 0.0}
        t = np.asarray(self.times) * 1000
        return {'mean_ms': float(t.mean()),
                'p50_ms': float(np.percentile(t, 50)),
                'p95_ms': float(np.percentile(t, 95))}


def device_memory_stats() -> Dict[str, int]:
    """Best-effort device memory usage (bytes)."""
    import jax
    try:
        stats = jax.devices()[0].memory_stats()
        return {k: int(v) for k, v in (stats or {}).items()}
    except Exception:
        return {}


#: bf16 MXU peak FLOP/s per chip by device kind (public specs)
PEAK_FLOPS = {
    'TPU v5 lite': 197e12,     # v5e: 197 TFLOPS bf16
    'TPU v5': 459e12,          # v5p
    'TPU v4': 275e12,
    'TPU v6 lite': 918e12,     # v6e (Trillium)
}


def flops_of(fn, *args, **kwargs) -> float:
    """XLA's FLOP estimate for one call of ``jit(fn)(*args)``."""
    import jax
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get('flops', 0.0))


def mfu(flops_per_step: float, step_time_s: float,
        device_kind: str = None) -> float:
    """Model FLOPs utilization vs the chip's bf16 MXU peak."""
    import jax
    kind = device_kind or jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 197e12)
    return flops_per_step / step_time_s / peak
