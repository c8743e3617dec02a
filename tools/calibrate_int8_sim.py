"""Compare sim/tpu.py's STRUCTURAL int8 pricing with measured TPU anchors.

Run after ``tools/tpu_int8_session.sh`` has produced its result files:

    python tools/calibrate_int8_sim.py [--dir /tmp]

For every int8 anchor the session measures, this prints measured vs
predicted img/s (and the int8-vs-bf16 ratios both ways) so the structural
terms in `sim/tpu.py::TPUPredictor.fused_block(int8=True)` (``peak_int8``,
the per-row quantize / rank-1 dequantize VPU op counts) and the CNN plan
terms in `sim/plan.py` (dense-masked-int8 / static-export-int8) can be
calibrated in one pass and then re-pinned in `tests/test_sim.py`.

Anchors with no structural model (T2T's QuantDense-in-attention-fused
graph) are printed measured-only and labeled UNMODELED.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laudnet_tpu.sim.hardware import TPU_PRESETS  # noqa: E402
from laudnet_tpu.sim.tpu import TPUPredictor, tpu_predict_vit  # noqa: E402

BATCH = 128
# the bench's lane-snapped DeiT-S/B schedule (1.0 x3, 0.7 x4, 0.5 x5 with
# snap_capacities=True → k=128 of 197 and k=96 of 197 for the last five)
SNAPPED_S = (1.0,) * 3 + (128.5 / 197,) * 4 + (96.5 / 197,) * 5
CAPS = (1.0,) * 3 + (0.7,) * 4 + (0.5,) * 5


def _load(path: str):
    """Last parseable JSON object line in the file (bench prints one line,
    but the log may carry stray warnings)."""
    if not os.path.exists(path):
        return None
    obj = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
    return obj


def _row(name, measured, predicted=None, note=""):
    if measured is None:
        print(f"  {name:44s} -- no measurement --")
        return
    if predicted is None:
        print(f"  {name:44s} measured {measured:9.1f}  (UNMODELED {note})")
        return
    err = (predicted - measured) / measured * 100.0
    print(f"  {name:44s} measured {measured:9.1f}  predicted {predicted:9.1f}"
          f"  err {err:+6.1f}%  {note}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp", help="directory with int8_*.json")
    args = ap.parse_args()
    d = args.dir

    p = TPUPredictor(TPU_PRESETS["v5e"])

    def ips(**kw):
        return BATCH / tpu_predict_vit(p, **kw).latency

    vit = _load(os.path.join(d, "int8_vit.json"))
    print("== DeiT-S block engine (bench --int8)")
    if vit:
        _row("int8 dense", vit.get("value"),
             ips(mode="dense", fused_block=True, int8=True))
        _row("int8 snapped select", vit.get("int8_snapped_select_img_s"),
             ips(mode="token", token_capacity=SNAPPED_S,
                 fused_block=True, int8=True))
        bf16 = (vit.get("value") / vit["vs_baseline"]
                if vit.get("vs_baseline") else None)
        _row("bf16 dense (context)", bf16,
             ips(mode="dense", fused_block=True))
        agree = {k: v for k, v in vit.items()
                 if "agreement" in k or "logit" in k}
        print(f"  accuracy proxies: {agree}")
    else:
        print("  -- int8_vit.json missing --")

    deitb = _load(os.path.join(d, "int8_deitb.json"))
    print("== DeiT-B block engine (bench --deit-b --int8)")
    if deitb:
        geo = dict(depth=12, dim=768, num_heads=12)
        _row("int8 dense", deitb.get("int8_dense_img_s"),
             ips(mode="dense", fused_block=True, int8=True, **geo))
        _row("int8 snapped select", deitb.get("int8_snapped_select_img_s"),
             ips(mode="token", token_capacity=SNAPPED_S, fused_block=True,
                 int8=True, **geo))
        _row("bf16 dense (context)", deitb.get("dense_fused_block_img_s"),
             ips(mode="dense", fused_block=True, **geo))
    else:
        print("  -- int8_deitb.json missing --")

    t2t = _load(os.path.join(d, "int8_t2t.json"))
    print("== T2T-ViT-19 trunk (bench --t2t [--int8])")
    if t2t:
        geo = dict(depth=14, dim=448, num_heads=7, mlp_ratio=3.0)
        snap_t2t = (1.0,) * 3 + (128.5 / 197,) * 5 + (96.5 / 197,) * 6
        # r3: the block engine admits T2T via fake-head padding, so the
        # bf16 and int8 trunk anchors are all fused_block-modeled now
        _row("bf16 dense (block engine)",
             t2t.get("dense_fused_block_img_s"),
             ips(mode="dense", fused_block=True, **geo))
        _row("bf16 snapped select", t2t.get("value"),
             ips(mode="token", token_capacity=snap_t2t,
                 fused_block=True, **geo))
        _row("int8 dense", t2t.get("int8_dense_img_s"),
             ips(mode="dense", fused_block=True, int8=True, **geo))
        _row("int8 snapped select", t2t.get("int8_snapped_img_s"),
             ips(mode="token", token_capacity=snap_t2t, fused_block=True,
                 int8=True, **geo))
    else:
        print("  -- int8_t2t.json missing --")

    r101 = _load(os.path.join(d, "int8_r101.json"))
    print("== R101 static export (bench --r101-static --int8)")
    if r101:
        from laudnet_tpu.sim.plan import plan_resnet_serving

        plan = plan_resnet_serving(
            "resnet101", dyn_mode="channel", act_rate=0.5,
            allow_static_export=True, allow_int8=True)
        rank = plan.ranking
        _row("int8 static export", r101.get("int8_export_img_s"),
             BATCH / rank["static-export-int8"]
             if "static-export-int8" in rank else None)
        _row("fp static export (context)", r101.get("value"),
             BATCH / rank["static-export"]
             if "static-export" in rank else None)
    else:
        print("  -- int8_r101.json missing --")

    masked = _load(os.path.join(d, "int8_masked.json"))
    print("== R101 dense-masked dynamic int8 (bench --resnet-masked --int8)")
    if masked:
        from laudnet_tpu.sim.plan import plan_resnet_serving

        plan = plan_resnet_serving(
            "resnet101", dyn_mode="channel", act_rate=0.5,
            allow_int8=True)
        _row("int8 dense-masked", masked.get("int8_masked_img_s"),
             BATCH / plan.ranking["dense-masked-int8"])
        _row("bf16 dense-masked (context)", masked.get("value"),
             BATCH / plan.ranking["dense-masked"])
    else:
        print("  -- int8_masked.json missing --")

    head = _load(os.path.join(d, "int8_headline.json"))
    print("== bf16 headline sanity (bench)")
    if head:
        print(f"  {json.dumps(head)}")
    else:
        print("  -- int8_headline.json missing --")


if __name__ == "__main__":
    main()
