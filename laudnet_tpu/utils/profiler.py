"""Profiling / tracing helpers (SURVEY.md §5 "tracing / profiling").

The reference profiles three ways: monkey-patched FLOPs counting
(`models/op_counter.py:147-192`), in-graph bookkeeping threaded through
every block, and the analytic simulator. This framework keeps the last two
(`utils/flops.py`, `sim/`) and adds the TPU-native first-class tools the
reference lacks:

* :func:`trace` — a context manager around ``jax.profiler`` producing a
  TensorBoard/XProf trace directory of everything dispatched inside.
* :func:`compiled_cost` — XLA's own cost analysis of a jitted function
  (FLOPs, HBM bytes accessed, peak memory), i.e. what the compiler will
  actually execute after fusion — the ground truth the analytic
  `sim.tpu.TPUPredictor` approximates.
* :func:`roofline_summary` — combines both into achievable-latency bounds
  on a given :class:`~laudnet_tpu.sim.hardware.TPUSpec`.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/tb"): fn(...)`` writes an XProf trace viewable in
    TensorBoard (Profile tab) or xprof. Works on TPU and CPU backends."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn: Callable, *args, static_argnums=(), **kwargs) -> dict:
    """Lower + compile ``fn`` and return XLA's cost analysis.

    Returns a dict with at least ``flops`` and ``bytes accessed`` when the
    backend reports them (keys mirror XLA's cost-analysis properties;
    missing entries default to 0.0).
    """
    lowered = jax.jit(fn, static_argnums=static_argnums).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # some backends wrap per-computation
        cost = cost[0] if cost else {}
    cost = dict(cost or {})
    mem = compiled.memory_analysis()
    if mem is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                cost[k] = float(v)
    return cost


def roofline_summary(fn: Callable, *args, spec: Optional[Any] = None,
                     **kwargs) -> dict:
    """XLA-reported FLOPs/bytes of ``fn`` plus roofline latency bounds on
    ``spec`` (a :class:`~laudnet_tpu.sim.hardware.TPUSpec`; defaults to the
    v5e preset). ``bound`` names the limiting resource."""
    if spec is None:
        from laudnet_tpu.sim.hardware import TPU_PRESETS

        spec = TPU_PRESETS["v5e"]
    cost = compiled_cost(fn, *args, **kwargs)
    flops = float(cost.get("flops", 0.0))
    in_bytes = float(cost.get("bytes accessed", 0.0))
    t_compute = flops / (spec.peak_bf16 * spec.sustained_frac)
    t_memory = in_bytes / spec.mem_bandwidth
    return {
        "flops": flops,
        "bytes_accessed": in_bytes,
        "compute_bound_s": t_compute,
        "memory_bound_s": t_memory,
        "roofline_s": max(t_compute, t_memory),
        "bound": "compute" if t_compute >= t_memory else "memory",
        "arithmetic_intensity": flops / max(in_bytes, 1.0),
    }
