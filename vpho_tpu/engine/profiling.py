"""Profiling/tracing utilities: FLOPs, params, device timers, XLA traces.

First-class replacements for the reference's ad-hoc instrumentation
(SURVEY.md §5): thop-based FLOPs at eval batch 0
(train_diff_hand_obj.py:888-911), the ``gpu_running_timer`` context manager
(misc_fn.py:389-407), and the captured-but-never-printed ``time.time`` pairs
inside forward.  Here:
  * ``flops_of``: XLA cost analysis of any jitted function (exact, per graph)
  * ``param_count``: trainable parameter total
  * ``device_timer``: wall time with ``block_until_ready`` fencing
  * ``trace``: jax.profiler TensorBoard trace context
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def flops_of(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile ``fn`` for the given args and read XLA's cost analysis.

    Returns {'flops': ..., 'bytes accessed': ...} (keys as XLA reports them;
    missing entries are 0).  The analogue of thop.profile at eval batch 0.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-device list
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }


@contextlib.contextmanager
def device_timer(name: str = "", result: dict | None = None):
    """Wall-time a device computation with proper completion fencing
    (gpu_running_timer analogue; cuda.synchronize -> block_until_ready)."""
    holder: Dict[str, Any] = {"outputs": None}
    t0 = time.perf_counter()
    yield holder
    if holder["outputs"] is not None:
        jax.block_until_ready(holder["outputs"])
    dt = time.perf_counter() - t0
    if result is not None:
        result[name or "elapsed"] = dt
    else:
        print(f"[timer] {name}: {dt * 1000:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vpho_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
