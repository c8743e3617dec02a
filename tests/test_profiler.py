"""Profiler helpers + SimulationReport cfg dump."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.sim.report import SimulationReport
from laudnet_tpu.utils.profiler import compiled_cost, roofline_summary, trace


def test_print_cfg_emits_defines():
    rep = SimulationReport(
        latency=1.0, cfg=[dict(op="patch_conv", k=8, ks=3),
                          dict(op="token_select", k=98), {}],
    )
    dump = rep.print_cfg()
    assert "#define PATCH_CONV_0_K 8" in dump
    assert "#define PATCH_CONV_0_KS 3" in dump
    assert "#define TOKEN_SELECT_1_K 98" in dump


def test_compiled_cost_reports_flops():
    def f(a, b):
        return a @ b

    a = jnp.ones((256, 256), jnp.float32)
    cost = compiled_cost(f, a, a)
    # 2*256^3 multiply-adds; XLA counts fused multiply-add as 2 flops
    assert cost.get("flops", 0) >= 2 * 256**3 * 0.5


def test_roofline_summary_bounds():
    def f(a, b):
        return a @ b

    a = jnp.ones((512, 512), jnp.float32)
    s = roofline_summary(f, a, a)
    assert s["flops"] > 0
    assert s["roofline_s"] >= max(s["compute_bound_s"], s["memory_bound_s"]) - 1e-12
    assert s["bound"] in ("compute", "memory")


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "tb")
    with trace(d):
        jnp.asarray(np.ones(16)).sum().block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found  # some trace artifact was written
