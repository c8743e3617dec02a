"""Measure the multi-layer segment kernel vs the per-block kernel path.

Run on the real TPU (background; first Pallas execution pays the one-time
Mosaic warm-up):

    nohup timeout 1500 python tools/probe_segments.py \
        > /tmp/seg_probe.json 2> /tmp/seg_probe_err.log &

Sweep mode (``--sweep``): segment-length sweep on dense DeiT-S/B and
snapped-select DeiT-S, to find the boundary-amortization vs
VMEM-pressure sweet spot. Default mode: segments-on (full) vs per-block
across the bench geometries.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from bench import BATCH, DTYPE, SIZE, _cast, _throughput
from laudnet_tpu.infer.fused_vit import build_fused_vit
from laudnet_tpu.models import laud_deit_base, laud_deit_small


def _init(model, x):
    return _cast(
        jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)},
                                   x.astype(jnp.float32), 1.0,
                                   training=False))(),
        DTYPE,
    )


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 3)), DTYPE)
    out = {}

    geom_s = dict(depth=12, dim=384, num_heads=6)
    caps = (1.0, 1.0, 1.0) + (0.7,) * 4 + (0.5,) * 5

    plain_s = laud_deit_small(token_skip=False, head_skip=False,
                              layer_skip=False)
    vp = _init(plain_s, x)
    laud_s = laud_deit_small()
    v = _init(laud_s, x)
    geom_b = dict(depth=12, dim=768, num_heads=12)
    plain_b = laud_deit_base(token_skip=False, head_skip=False,
                             layer_skip=False)
    vb = _init(plain_b, x)

    if "--sweep" in sys.argv:
        for seg in (2, 3, 4, 6):
            out[f"deit_s_dense_seg{seg}"] = round(_throughput(
                build_fused_vit(vp, segments=seg, **geom_s), x), 1)
        for seg in (2, 3, 4, 5):
            out[f"deit_s_snap_seg{seg}"] = round(_throughput(
                build_fused_vit(v, token_capacity=caps,
                                snap_capacities=True, segments=seg,
                                **geom_s), x), 1)
        for seg in (2, 3, 4):
            out[f"deit_b_dense_seg{seg}"] = round(_throughput(
                build_fused_vit(vb, segments=seg, **geom_b), x), 1)
        print(json.dumps(out))
        return

    for seg in (True, False):
        tag = "seg" if seg else "blk"
        # dense rows must force an int cap: segments=True only engages
        # with token selection active (seg_ok in infer/fused_vit.py), so
        # a True/False sweep on the dense paths would time the per-block
        # kernel twice and report a false ~1.0 ratio
        dense_seg = 5 if seg else False
        out[f"deit_s_dense_{tag}"] = round(_throughput(
            build_fused_vit(vp, segments=dense_seg, **geom_s), x), 1)
        out[f"deit_s_select_{tag}"] = round(_throughput(
            build_fused_vit(v, token_capacity=caps, segments=seg,
                            **geom_s), x), 1)
        out[f"deit_s_snap_{tag}"] = round(_throughput(
            build_fused_vit(v, token_capacity=caps, snap_capacities=True,
                            segments=seg, **geom_s), x), 1)
        out[f"deit_b_dense_{tag}"] = round(_throughput(
            build_fused_vit(vb, segments=dense_seg, **geom_b), x), 1)

    out["deit_s_dense_ratio"] = round(
        out["deit_s_dense_seg"] / out["deit_s_dense_blk"], 4)
    out["deit_s_snap_ratio"] = round(
        out["deit_s_snap_seg"] / out["deit_s_snap_blk"], 4)
    out["deit_b_dense_ratio"] = round(
        out["deit_b_dense_seg"] / out["deit_b_dense_blk"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
