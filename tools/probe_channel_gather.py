"""Channel-gather geometry probe (v5e) for the `channel_gather`
predictor mode (`sim/tpu.py::tpu_channel_gather_block`).

Per-image capacity-gathered channel execution of a bottleneck (take-
gathered weights, per-image batched matmuls, conv2 as 9 taps) vs the
dense bottleneck, mirroring the r2 probe (R101 stage-3: 14x14 cin1024
w256 rho .5 -> 0.69x, implied bmm_frac ~0.45).

Geometries here:
  A: R50/101 stage-2  28x28 cin 512  width 128  (K=64 at rho .5)
  B: R101 stage-4      7x7  cin 2048 width 512  (K=256)

Measured 2026-08-17 (bs128 bf16, axon tunnel):
  stage2 rho0.5 : 0.60x dense (gathered 1.81ms vs 1.09ms), frac ~0.06
  stage4 rho0.5 : 0.11x dense (9.37ms vs 1.06ms), frac ~0.01
  stage4 rho0.25: 0.13x dense (8.00ms vs 1.05ms)
i.e. the stage-3-calibrated bmm_frac=0.45 is an upper bound — per-image
contraction shrinking collapses the MXU even harder at small row counts.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/probe_channel_gather.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import DTYPE, _chain_time

B = 128

def bottleneck_probe(h, cin, width, cout, rho, seed=0):
    rng = np.random.default_rng(seed)
    K = int(width * rho)
    x = jnp.asarray(rng.standard_normal((B, h, h, cin)), DTYPE)
    w1 = jnp.asarray(rng.standard_normal((cin, width)) * 0.02, DTYPE)
    w2 = jnp.asarray(rng.standard_normal((3, 3, width, width)) * 0.02, DTYPE)
    w3 = jnp.asarray(rng.standard_normal((width, cout)) * 0.02, DTYPE)
    idx = jnp.asarray(
        np.stack([rng.choice(width, K, replace=False) for _ in range(B)]),
        jnp.int32)

    def dense(x):
        hX = jnp.einsum("bhwc,cd->bhwd", x, w1)
        hX = jax.lax.conv_general_dilated(
            hX, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.einsum("bhwd,dc->bhwc", hX, w3)

    def gathered(x):
        w1g = jnp.take(w1, idx, axis=1).transpose(1, 0, 2)   # (B,cin,K)
        w3g = jnp.take(w3, idx, axis=0)                      # (B,K,cout)
        # (B,3,3,K,K) per-image conv2 weights
        w2g = w2[None]
        w2g = jnp.take_along_axis(
            jnp.broadcast_to(w2g, (B, 3, 3, width, width)),
            idx[:, None, None, :, None], axis=3)
        w2g = jnp.take_along_axis(
            w2g, idx[:, None, None, None, :], axis=4)        # (B,3,3,K,K)
        hX = jnp.einsum("bhwc,bck->bhwk", x, w1g)
        xp = jnp.pad(hX, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                tap = jnp.einsum("bhwk,bkl->bhwl",
                                 xp[:, dy:dy + h, dx:dx + h], w2g[:, dy, dx])
                acc = tap if acc is None else acc + tap
        return jnp.einsum("bhwk,bkc->bhwc", acc, w3g)

    td = _chain_time(dense, x)
    tg = _chain_time(gathered, x)
    gflops_g = 2.0 * B * (h * h * cin * K + h * h * 9 * K * K
                          + h * h * K * cout) / 1e9
    # implied sustained fraction after subtracting modeled weight traffic
    wb = 2.0 * B * (cin * K + 9 * K * K + K * cout)
    wmem = wb / 819e9
    frac = (gflops_g * 1e9) / max(tg - wmem, 1e-9) / 197e12
    return dict(ratio=round(td / tg, 4), dense_ms=round(td * 1e3, 3),
                gath_ms=round(tg * 1e3, 3), K=K,
                implied_frac=round(frac, 3))

res = {}
res["stage2_rho0.5"] = bottleneck_probe(28, 512, 128, 512, 0.5)
print("stage2", res["stage2_rho0.5"], flush=True)
res["stage4_rho0.5"] = bottleneck_probe(7, 2048, 512, 2048, 0.5)
print("stage4", res["stage4_rho0.5"], flush=True)
res["stage4_rho0.25"] = bottleneck_probe(7, 2048, 512, 2048, 0.25)
print("stage4_q", res["stage4_rho0.25"], flush=True)
print(json.dumps(res))
os._exit(0)
