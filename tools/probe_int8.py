"""int8 capability + rate probe (v5e) for the W8A8 serving paths.

Answers, on the real chip, the three questions the int8 design rests on:

  1. XLA s8 matmul: does `dot_general(int8, int8, preferred=int32)` hit
     the MXU's double-rate path? (8192^3 vs the measured bf16 anchor
     ~139 TFLOP/s.)
  2. Mosaic/Pallas s8 dot: does the same dot compile and run INSIDE a
     pallas_call (the fused block kernel's qmm)?
  3. XLA s8 conv: does `conv_general_dilated(int8, int8)` run at the s8
     rate (the quantized static export's hot op)?

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     timeout 1500 python tools/probe_int8.py
(First pallas execution pays the one-time ~2-5 min Mosaic warm-up.)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _chain_time


def _dev_operand(shape, dtype, seed=0):
    """Operand generated ON DEVICE inside the jit: closure-constant
    operands of this size get embedded in the HLO and the axon tunnel's
    remote_compile rejects the payload (HTTP 413). Generation is
    loop-invariant, so XLA hoists it out of the timing loop."""
    key = jax.random.PRNGKey(seed)
    if dtype == jnp.int8:
        return jax.random.randint(key, shape, -127, 127, jnp.int8)
    return jax.random.normal(key, shape, dtype)


def rate_matmul(dtype, n=8192):
    def step(x):
        a = _dev_operand((n, n), dtype, 0)
        b = _dev_operand((n, n), dtype, 1)
        # fold the loop carry INTO an operand (not just the output): a
        # dot over loop-invariant operands is hoisted out of the chained
        # fori_loop, timing an empty loop. The carried scalar is ~0 so
        # values are unchanged, but being data-dependent it defeats
        # invariant code motion (the generation itself still hoists).
        bump = (x[0, 0, 0, 0] * 1e-30).astype(a.dtype)
        acc = jax.lax.dot_general(
            a + bump, b, (((1,), (0,)), ((), ())),
            preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                    else jnp.float32))
        return x + acc[0, 0].astype(x.dtype) * 1e-30

    t = _chain_time(lambda x: step(x), jnp.zeros((1, 1, 1, 1), jnp.float32))
    return 2 * n**3 / t / 1e12  # T(FL)OP/s


def rate_pallas_s8(n=4096):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    blk = 512

    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(n // blk, n // blk),
            in_specs=[
                pl.BlockSpec((blk, n), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, blk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, blk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.int32),
        )(a, b)

    def step(x):
        a = _dev_operand((n, n), jnp.int8, 0)
        b = _dev_operand((n, n), jnp.int8, 1)
        bump = (x[0, 0, 0, 0] * 1e-30).astype(a.dtype)  # defeat hoisting
        acc = run(a + bump, b)
        return x + acc[0, 0].astype(x.dtype) * 1e-30

    t = _chain_time(lambda x: step(x), jnp.zeros((1, 1, 1, 1), jnp.float32))
    return 2 * n**3 / t / 1e12


def rate_conv(dtype, b=128, h=14, cin=1024, cout=512):
    pref = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def step(z):
        x = _dev_operand((b, h, h, cin), dtype, 0)
        k = _dev_operand((3, 3, cin, cout), dtype, 1)
        bump = (z[0, 0, 0, 0] * 1e-30).astype(x.dtype)  # defeat hoisting
        y = jax.lax.conv_general_dilated(
            x + bump, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref)
        return z + y[0, 0, 0, 0].astype(z.dtype) * 1e-30

    t = _chain_time(lambda z: step(z), jnp.zeros((1, 1, 1, 1), jnp.float32))
    return 2 * b * h * h * cin * cout * 9 / t / 1e12


def rate_qconv_pipeline(b=128, h=14, cin=1024, cout=512):
    """End-to-end W8A8 conv PIPELINE rate (logical bf16 flops/s): the
    dynamic per-IMAGE abs-max + quantize + s8 conv + dequant sequence of
    `infer/export_pruned.py::_qconv` / `ops/quant.py::QuantConv` (one
    scale per image, axis=(1,2,3) reduce + (B,1,1,1) broadcast), timed
    against a bf16 activation stream — what the int8 CNN serving paths
    actually pay per conv, including everything around the MXU op."""

    def step(z):
        x = _dev_operand((b, h, h, cin), jnp.bfloat16, 0)
        k = _dev_operand((3, 3, cin, cout), jnp.int8, 1)
        ks = _dev_operand((cout,), jnp.float32, 2)  # per-channel w scales
        bump = (z[0, 0, 0, 0] * 1e-30).astype(x.dtype)
        xf = (x + bump).astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3),
                                 keepdims=True), 1e-6) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        # full dequant: activation scale AND the rank-1 per-output-channel
        # weight-scale broadcast QuantConv/_qconv pay
        y = (y.astype(jnp.float32) * xs * ks).astype(jnp.bfloat16)
        return z + y[0, 0, 0, 0].astype(z.dtype) * 1e-30

    t = _chain_time(lambda z: step(z), jnp.zeros((1, 1, 1, 1), jnp.float32))
    return 2 * b * h * h * cin * cout * 9 / t / 1e12


def main():
    out = {}
    out["xla_bf16_matmul_tflops"] = round(rate_matmul(jnp.bfloat16), 1)
    out["xla_s8_matmul_tops"] = round(rate_matmul(jnp.int8), 1)
    out["xla_bf16_conv_tflops"] = round(rate_conv(jnp.bfloat16), 1)
    try:
        out["xla_s8_conv_tops"] = round(rate_conv(jnp.int8), 1)
    except Exception as e:  # noqa: BLE001 - probe reports, never crashes
        out["xla_s8_conv_tops"] = f"FAILED: {type(e).__name__}: {e}"[:200]
    try:
        out["xla_qconv_pipeline_tflops"] = round(rate_qconv_pipeline(), 1)
    except Exception as e:  # noqa: BLE001
        out["xla_qconv_pipeline_tflops"] = (
            f"FAILED: {type(e).__name__}: {e}"[:200])
    try:
        out["pallas_s8_matmul_tops"] = round(rate_pallas_s8(), 1)
    except Exception as e:  # noqa: BLE001
        out["pallas_s8_matmul_tops"] = (
            f"FAILED: {type(e).__name__}: {e}"[:200])
    print(json.dumps(out, indent=1))
    os._exit(0)  # the axon tunnel hangs python exit


if __name__ == "__main__":
    main()
