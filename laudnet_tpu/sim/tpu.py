"""TPU latency model — the hardware model the reference lacks.

Models *our* execution engine on a TPU chip (MXU systolic array + VPU + HBM
+ XLA fusion), not the GPU gather/scatter kernels: under XLA everything in a
jit is one executable, so per-op cost is ``max(FLOPs/effective_MXU,
bytes/HBM_BW) + fusion_overhead`` where effective MXU throughput is derated
by 128-lane channel alignment and sublane row alignment, and the dynamic
paths are costed at their **static capacity** (the TPU engine computes
``capacity`` patch slots regardless of realized density — predictability by
construction, the property LAUDNet's granularity analysis is after).

Calibration anchors (measured on v5e through this repo's bench harness):
8192^3 bf16 matmul ~139/197 TFLOP/s; ResNet-101 bs128 bf16 conv stack
~120/197 -> sustained_frac 0.70 with alignment derates on top.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from laudnet_tpu.sim.hardware import TPUSpec
from laudnet_tpu.sim.models import MODEL_GEOMETRY, BlockGeom
from laudnet_tpu.sim.report import SimulationReport
from laudnet_tpu.sim.tiles import ceil_eff

# W8A8 int8 calibration (fused block engine, measured v5e r3; see
# tools/calibrate_int8_sim.py and tests/test_sim.py int8 anchors).
# _INT8_MM_MULT: effective s8-vs-bf16 MXU multiplier for the engine's
# weight matmuls when the spec sets no peak_int8. The chip's nominal s8
# peak is 2x bf16, but the measured XLA s8 8192^3 matmul reaches only
# ~1.32x (tools/probe_int8.py: 154 vs 117 T(FL)OPS same-method), and the
# six measured engine anchors (DeiT-S/B, T2T dense+snapped-select) fit an
# in-kernel effective multiplier below nominal too.
# _INT8_STEP_OVERHEAD: extra per-grid-step cost of the int8 kernel
# (operand re-layouts around the s8 MXU ops that don't scale with rows).
# Jointly fitted over the six anchors: max |err| 2.9% at (1.8, 0.4 us)
# vs +4.5..+14.3% at the nominal (2.0, 0).
_INT8_MM_MULT = 1.8
_INT8_STEP_OVERHEAD = 0.4e-6

# fast_math serving-kernel calibration (`fused_vit_block(fast_math=True)`,
# the `build_fused_vit` serving default since r5). Jointly fitted r5 over
# nine measured v5e anchors (DeiT-S dense/nominal/snapped/flat-0.5,
# DeiT-B dense/nominal/snapped, T2T dense/snapped select; max |err| 8.3%,
# 7 of 9 within 6%). The measured kernel ablations say the fast stages
# save MORE than their op-count deltas (exact GELU costs 1.10 us/img/layer
# at DeiT-S where pure elems/vpu_flops prices 0.61 us; swapping in the
# tanh GELU saves only 0.51 us but deferred-softmax + one-pass LN save
# 0.99 us — beyond the removed passes alone), i.e. the real win is
# SHORTER DEPENDENCY STALLS between the VPU stages and the MXU matmuls,
# not fewer VPU flops. The fit therefore expresses fast_math as: reduced
# *effective* VPU op counts, its own (higher, flatter) sustained-MXU
# curve — small dims gain most because they were stall-bound —
# and a halved per-grid-step boundary (less pipeline fill per step).
# These are end-to-end effective constants, not per-stage attributions.
_FM_SOFTMAX_OPS = 1.5   # exact: 6.0 — the (L,L) divide pass moves out
_FM_SOFTMAX_DIV_OPS = 2.0  # ...to the (rows, 2dh) output (div + row sums)
_FM_LN_OPS = 3.0        # exact: 6.0 — var = E[x^2] - mu^2, one data pass
_FM_GELU_OPS = 3.0      # exact: 8.0 — tanh poly vs erf
# sustained MXU fraction for the fast kernel: min(.99, BASE+SLOPE*log2(d/192))
_FM_MM_EFF_BASE = 1.05
_FM_MM_EFF_SLOPE = -0.06
_FM_BOUNDARY = 0.5      # multiplier on the per-grid-step boundary cost

# Unfused (reference-graph) ViT calibration, re-measured r5 against five
# fresh bs128 anchors (the r2 select anchors had gone stale: the unfused
# select path measures ~11% slower than r2, dense unchanged).
# _UF_WIDE_MM: the unfused graph's weight matmuls sustain LESS of peak as
# layers widen (measured us/layer: 1363 at D=384, ~1807 at 448, 4333 at
# 768 — the per-op model tracked 384 but under-priced 768 by 16%; wide
# layers' bias/activation fusions keep larger f32 working sets, degrading
# XLA's scheduling). Modeled as a derate on the block's weight matmuls:
# 1 / (1 + _UF_WIDE_MM * log2(dim/384)) for dim > 384. The fused block
# engine does NOT inherit this (its weights are VMEM-resident; its own
# mm_eff curve is calibrated separately above).
# _SORT_RATE: effective sorted elems/s of XLA's top_k lowering
# (token_select docstring).
_UF_WIDE_MM = 0.275
_SORT_RATE = 2e8


class TPUPredictor:
    """Analytic latency model of this framework's ops on one TPU chip."""

    def __init__(self, spec: TPUSpec, dtype_bytes: int = 2):
        self.spec = spec
        self.dtype_bytes = dtype_bytes

    # --- core cost model ---------------------------------------------------

    def _mxu_eff(self, rows: float, cin: int, cout: int) -> float:
        """Utilization of the systolic array: contraction and output channel
        dims pad to 128 lanes; row dim pads to 8 sublanes."""
        d = self.spec.mxu_dim
        return (ceil_eff(cin, d) * ceil_eff(cout, d) * ceil_eff(rows, 8))

    def _op(self, flops: float, bytes_moved: float, mxu_eff: float = 1.0,
            cfg: Optional[dict] = None) -> SimulationReport:
        s = self.spec
        peak = s.peak_bf16 if self.dtype_bytes == 2 else s.peak_fp32
        compute = flops / (peak * s.sustained_frac * max(mxu_eff, 1e-3))
        memory = bytes_moved / s.mem_bandwidth
        return SimulationReport(
            latency=max(compute, memory) + s.fusion_overhead,
            compute_latency=compute,
            memory_latency=memory,
            cfg=[cfg or {}],
        )

    def _vpu(self, elems: float, reads: int = 2) -> SimulationReport:
        s = self.spec
        bytes_moved = elems * (reads + 1) * self.dtype_bytes
        return SimulationReport(
            latency=max(elems / s.vpu_flops, bytes_moved / s.mem_bandwidth),
            compute_latency=elems / s.vpu_flops,
            memory_latency=bytes_moved / s.mem_bandwidth,
            cfg=[dict(op="vpu")],
        )

    # --- operators (per image geometry x batch) ----------------------------

    def conv(self, cin, cout, inh, inw, ks, groups=1, stride=1,
             fused_epilogue=True) -> SimulationReport:
        """Dense conv. BN/ReLU/mask-multiply epilogues are fused by XLA and
        ride in the same HBM pass (fused_epilogue)."""
        b = self.spec.batch_size
        outh, outw = inh // stride, inw // stride
        flops = 2 * b * (cin // groups) * cout * outh * outw * ks * ks
        bytes_moved = self.dtype_bytes * (
            b * cin * inh * inw
            + (cin // groups) * cout * ks * ks
            + b * cout * outh * outw
        )
        rows = b * outh * outw
        return self._op(flops, bytes_moved,
                        self._mxu_eff(rows, cin // groups, cout),
                        dict(op="conv", cin=cin, cout=cout, ks=ks))

    def fc(self, cin, cout) -> SimulationReport:
        return self.conv(cin, cout, 1, 1, 1)

    def global_avg_pool(self, c, h, w) -> SimulationReport:
        return self._vpu(self.spec.batch_size * c * h * w, reads=1)

    def add(self, c, h, w) -> SimulationReport:
        """Residual add: XLA fuses it into the producing conv's epilogue, so
        the only extra HBM traffic is one read of the identity tensor."""
        s = self.spec
        elems = s.batch_size * c * h * w
        mem = elems * self.dtype_bytes / s.mem_bandwidth
        return SimulationReport(
            latency=max(elems / s.vpu_flops, mem),
            compute_latency=elems / s.vpu_flops,
            memory_latency=mem,
            cfg=[dict(op="fused_add")],
        )

    def se(self, c, h, w, reduction=4) -> SimulationReport:
        mid = max(int(c // reduction), 1)
        return (self.global_avg_pool(c, h, w) + self.fc(c, mid)
                + self.fc(mid, c) + self.add(c, h, w))

    def masker(self, cin, mask_size, h, w, spatial=True,
               hid=16, n_groups=1) -> SimulationReport:
        """Gating head: pooled map + tiny conv/MLP — VPU + one skinny matmul.

        The channel masker's global-average pool is a plain reduction XLA
        fuses into the producing conv's epilogue, so it re-reads NOTHING
        (measured: dense-masked channel R101 runs 1.00x dense, bench.py
        --resnet-masked). The spatial masker pools to a GRID
        (adaptive_avg_pool to mask_size) — a strided window reduction XLA
        materializes as its own pass, so it pays the feature-map re-read
        (measured: spatial-masked R101 0.91x dense; the re-read model
        gives 0.84x — conservative)."""
        b = self.spec.batch_size
        elems = b * cin * h * w
        ms = mask_size if isinstance(mask_size, int) else mask_size[0]
        # both pools write only the pooled map; a GRID pool (spatial masker
        # with mask_size > 1) additionally re-reads the feature map (a
        # strided window reduction XLA materializes on its own), while a
        # global pool — the channel masker's GAP and the layer masker's
        # mask_size=1 pool — fuses into the producer's epilogue
        out_bytes = b * cin * max(ms * ms, 1) * self.dtype_bytes
        in_bytes = elems * self.dtype_bytes if (spatial and ms > 1) else 0.0
        mem = (in_bytes + out_bytes) / self.spec.mem_bandwidth
        pool = SimulationReport(
            latency=max(elems / self.spec.vpu_flops, mem),
            compute_latency=elems / self.spec.vpu_flops,
            memory_latency=mem,
            cfg=[dict(op="vpu")],
        )
        proj = self.conv(cin, max(2 * n_groups, 2), mask_size, mask_size, 1)
        return pool + proj

    # --- capacity-based dynamic ops (this framework's engine) -------------

    def gather_patches(self, c, h, w, granul, capacity_frac,
                       halo=1) -> SimulationReport:
        """XLA gather of (capacity) windows with halo: pure HBM traffic."""
        b = self.spec.batch_size
        cells = (h // granul) * (w // granul)
        k = max(1, math.ceil(capacity_frac * cells))
        size = granul + 2 * halo
        moved = b * k * size * size * c * self.dtype_bytes
        # read source once + write gathered buffer (+ later re-read by conv)
        bytes_moved = b * c * h * w * self.dtype_bytes + 2 * moved
        return SimulationReport(
            latency=bytes_moved / self.spec.mem_bandwidth
            + self.spec.fusion_overhead,
            memory_latency=bytes_moved / self.spec.mem_bandwidth,
            compute_latency=0.0,
            cfg=[dict(op="gather", k=k)],
        )

    def patch_conv(self, cin, cout, granul, capacity_frac, cells, ks,
                   halo_in=True) -> SimulationReport:
        """Conv over gathered patches: rows = B*K*granul^2."""
        b = self.spec.batch_size
        k = max(1, math.ceil(capacity_frac * cells))
        size = granul + 2 * (1 if halo_in and ks == 3 else 0)
        flops = 2 * b * k * granul * granul * cin * cout * ks * ks
        bytes_moved = self.dtype_bytes * (
            b * k * size * size * cin
            + cin * cout * ks * ks
            + b * k * granul * granul * cout
        )
        rows = b * k * granul * granul
        return self._op(flops, bytes_moved, self._mxu_eff(rows, cin, cout),
                        dict(op="patch_conv", k=k, ks=ks))

    def scatter_add_patches(self, c, h, w, granul,
                            capacity_frac) -> SimulationReport:
        b = self.spec.batch_size
        cells = (h // granul) * (w // granul)
        k = max(1, math.ceil(capacity_frac * cells))
        moved = b * k * granul * granul * c * self.dtype_bytes
        bytes_moved = 2 * b * c * h * w * self.dtype_bytes + moved
        return SimulationReport(
            latency=bytes_moved / self.spec.mem_bandwidth
            + self.spec.fusion_overhead,
            memory_latency=bytes_moved / self.spec.mem_bandwidth,
            compute_latency=0.0,
            cfg=[dict(op="scatter_add", k=k)],
        )


    # --- transformer ops (ViT paradigms — reference analog:
    #     `hardware_models/predictor_transformer.py:6-106`) ----------------

    def matmul(self, rows: float, cin: int, cout: int) -> SimulationReport:
        """(rows, cin) @ (cin, cout) on the MXU; rows folds batch/heads."""
        flops = 2.0 * rows * cin * cout
        bytes_moved = self.dtype_bytes * (
            rows * cin + cin * cout + rows * cout
        )
        return self._op(flops, bytes_moved, self._mxu_eff(rows, cin, cout),
                        dict(op="matmul", rows=rows, cin=cin, cout=cout))

    def batched_matmul(self, batch: float, m: int, k: int,
                       n: int) -> SimulationReport:
        """batch x (m,k)@(k,n) — attention scores / attention-values. XLA
        keeps the batch dim; MXU alignment applies per instance."""
        flops = 2.0 * batch * m * k * n
        bytes_moved = self.dtype_bytes * batch * (m * k + k * n + m * n)
        return self._op(flops, bytes_moved, self._mxu_eff(m, k, n),
                        dict(op="bmm", batch=batch, m=m, k=k, n=n))

    def softmax(self, elems: float) -> SimulationReport:
        """Non-flash softmax between two HBM-materialized matmuls: one
        fused read+write pass over the score matrix (max/sub/exp/sum/div
        fuse into one region under XLA), ~6 VPU ops per element."""
        bytes_moved = 2.0 * elems * self.dtype_bytes
        comp = 6.0 * elems / self.spec.vpu_flops
        mem = bytes_moved / self.spec.mem_bandwidth
        return SimulationReport(
            latency=max(comp, mem) + self.spec.fusion_overhead,
            compute_latency=comp, memory_latency=mem,
            cfg=[dict(op="softmax")],
        )

    def layernorm(self, elems: float) -> SimulationReport:
        bytes_moved = 2.0 * elems * self.dtype_bytes
        comp = 6.0 * elems / self.spec.vpu_flops
        mem = bytes_moved / self.spec.mem_bandwidth
        return SimulationReport(
            latency=max(comp, mem) + self.spec.fusion_overhead,
            compute_latency=comp, memory_latency=mem,
            cfg=[dict(op="layernorm")],
        )

    def gelu(self, elems: float) -> SimulationReport:
        """Fuses into the producing matmul's epilogue: no extra HBM pass,
        only VPU work overlapping the next op's prologue."""
        return SimulationReport(
            latency=8.0 * elems / self.spec.vpu_flops,
            compute_latency=8.0 * elems / self.spec.vpu_flops,
            cfg=[dict(op="gelu")],
        )

    def transpose(self, elems: float) -> SimulationReport:
        """HBM-materialized layout change (e.g. the (B,L,3,H,dh) ->
        (3,B,H,L,dh) head split around attention): one read + one write
        pass. On TPU these reorganizes are real copies, not free views."""
        bytes_moved = 2.0 * elems * self.dtype_bytes
        mem = bytes_moved / self.spec.mem_bandwidth
        return SimulationReport(
            latency=mem + self.spec.fusion_overhead,
            memory_latency=mem, compute_latency=0.0,
            cfg=[dict(op="transpose")],
        )

    def residual_add(self, elems: float) -> SimulationReport:
        """x + branch fused into the producer's epilogue: the only extra
        HBM traffic is one read of the identity tensor."""
        mem = elems * self.dtype_bytes / self.spec.mem_bandwidth
        return SimulationReport(
            latency=max(elems / self.spec.vpu_flops, mem),
            compute_latency=elems / self.spec.vpu_flops,
            memory_latency=mem,
            cfg=[dict(op="residual_add")],
        )

    def fused_attention(self, l: int, dim: int, heads: int
                        ) -> SimulationReport:
        """The qkv-direct fused attention kernel
        (`ops/pallas/vit_attention.py`): one VMEM-resident pass — HBM
        touches only the packed qkv read and the merged output write (the
        head-split/merge transposes and the score-tensor round trips of
        the unfused path vanish). The lane-masked head-pair trick runs
        both matmul stages at contraction/output width 2*dh with half the
        lanes zeroed, so MXU work is 2x the logical attention FLOPs at
        full K=128 rate — structurally priced, validated against the
        measured kernel (DeiT-S bs128 ~0.22 ms pred 0.21, DeiT-B ~0.41 ms
        pred 0.41 on v5e)."""
        s = self.spec
        b = s.batch_size
        dh = dim // heads
        pw = 2 * dh
        bytes_moved = self.dtype_bytes * b * l * (3 * dim + dim)
        peak = s.peak_bf16 if self.dtype_bytes == 2 else s.peak_fp32
        f1 = 2.0 * b * heads * l * l * pw  # scores (q*mask)@k
        f2 = 2.0 * b * heads * l * l * pw  # probs@(v*mask)
        t1 = f1 / (peak * s.sustained_frac * self._mxu_eff(l, pw, l))
        t2 = f2 / (peak * s.sustained_frac * self._mxu_eff(l, l, pw))
        vpu = 6.0 * b * heads * l * l / s.vpu_flops  # in-VMEM softmax
        compute = t1 + t2 + vpu
        mem = bytes_moved / s.mem_bandwidth
        # Inside a pallas_call the per-step compute depends on its own DMA
        # and the kernel cannot cross-fuse with neighbors, so HBM time adds
        # to compute instead of hiding under it, plus a per-grid-step
        # boundary cost (launch + pipeline fill + lost cross-fusion;
        # ~5.6 us/step at the kernel's block_b=8, i.e. ~90 us at bs128 —
        # fitted once across the three fused model-level anchors, which
        # land within 2.5%; max() instead under-prices every one by ~20%).
        boundary = 5.6e-6 * max(1, -(-b // 8))
        return SimulationReport(
            latency=compute + mem + s.fusion_overhead + boundary,
            compute_latency=compute, memory_latency=mem,
            cfg=[dict(op="fused_attention", l=l, dim=dim, heads=heads)],
        )

    def fused_block(self, l: int, dim: int, heads: int,
                    mlp_ratio: float, int8: bool = False,
                    fast_math: bool = False) -> SimulationReport:
        """The fully fused transformer block kernel
        (`ops/pallas/vit_block.py`): per layer, HBM touches only x
        in/out + one weight fetch; LN/softmax/gelu run on the VPU in
        VMEM. VPU time ADDS to MXU time (Mosaic serializes the dependent
        LN -> matmul -> softmax chain; the additive form lands all three
        block-engine anchors within ~3%, an overlap model under-prices
        every one).

        ``int8`` prices the W8A8 variant (`fused_vit_block_int8`): the
        four weight matmuls run at the s8 MXU rate (``peak_int8``, 2x
        bf16 when unset) with per-row quantize (~5 VPU ops/operand elem)
        and rank-1 dequantize (~3 ops/output elem) passes added, and the
        weight DMA halved; attention stays bf16. STRUCTURAL pricing —
        not yet calibrated against measured int8 anchors.

        ``fast_math`` prices the serving-default fast-math kernel body
        (deferred softmax normalization, one-pass LN, tanh GELU — see
        `ops/pallas/vit_block.py` and the _FM_* calibration note above);
        False prices the exact kernel the r3 anchors pinned. int8
        IGNORES the flag: measured r5, the int8 engine is insensitive to
        fast_math (11247 vs the r3 exact-era 11276 img/s at DeiT-S dense
        — its bottleneck is the quant/dequant VPU chain and s8 MXU work,
        not the stages fast_math cheapens), so the r3-calibrated int8
        pricing stays valid for both kernel bodies."""
        s = self.spec
        b = s.batch_size
        dh = dim // heads
        # odd head counts ride the kernel's zero-padded fake head
        # (`ops/pallas/vit_block.py`): attention and qkv/proj run at the
        # padded width da = (H + H%2) * dh (T2T: 7 heads/448 -> 8/512)
        n_up = heads + heads % 2
        da = n_up * dh
        hidden = int(dim * mlp_ratio)
        if int8:
            fast_math = False  # measured insensitive (docstring)
        peak = s.peak_bf16 if self.dtype_bytes == 2 else s.peak_fp32
        # MXU tile quantization: token counts pad to 8 sublanes in matmul
        # rows and to 128 lanes in the score/prob tiles — this is why
        # lane-snapped capacities (k=128 not 137) measure ~8% faster and
        # what lets the predictor RECOMMEND snapping (the engine's
        # snap_capacity_to_tiles); see tools-measured anchors in
        # tests/test_sim.py.
        l_sub = -(-l // 8) * 8
        l_lane = -(-l // 128) * 128
        rows = b * l_sub
        mm_flops = 2.0 * rows * dim * (3 * da + da + 2 * hidden)
        attn_flops = 2.0 * (2.0 * b * n_up * l_sub * l_lane * (2 * dh))
        # sustained MXU fraction rises with contraction depth (two-point
        # fit: ~0.85 at K=384/DeiT-S, ~0.95 at K=768/DeiT-B — deeper
        # accumulation chains hide more pipeline bubbles)
        mm_eff = min(0.97, max(0.75, 0.75 + 0.1 * math.log2(dim / 192)))
        if fast_math:
            mm_eff = min(0.99, max(0.70, _FM_MM_EFF_BASE
                                   + _FM_MM_EFF_SLOPE * math.log2(dim / 192)))
        mm_peak = peak
        w_bytes = self.dtype_bytes
        if int8:
            mm_peak = s.peak_int8 or _INT8_MM_MULT * s.peak_bf16
            w_bytes = 1
        mxu = (mm_flops / (mm_peak * mm_eff)
               + attn_flops / (peak * s.sustained_frac))
        if fast_math:
            vpu_ops = (_FM_SOFTMAX_OPS * b * n_up * l_sub * l_lane
                       + _FM_SOFTMAX_DIV_OPS * rows * da  # deferred divide
                       + 2 * _FM_LN_OPS * rows * dim      # one-pass LNs
                       + _FM_GELU_OPS * rows * hidden)    # tanh gelu
        else:
            vpu_ops = (6.0 * b * n_up * l_sub * l_lane  # softmax
                       + 2 * 6.0 * rows * dim        # two LayerNorms
                       + 8.0 * rows * hidden)        # gelu
        if int8:
            # per-row operand quantize (abs/max-reduce/div/round/clip) and
            # rank-1 dequantize + bias on every matmul output
            vpu_ops += (5.0 * rows * (2 * dim + da + hidden)
                        + 3.0 * rows * (3 * da + 2 * dim + hidden))
        vpu = vpu_ops / self.spec.vpu_flops  # serial with the MXU chain
        weights = (dim * 3 * da + da * dim + 2 * dim * hidden) * w_bytes
        mem = (2 * rows * dim * self.dtype_bytes + weights) \
            / s.mem_bandwidth
        # per-grid-step boundary at the kernel's batch-block 1 (the
        # measured v5e optimum — minimal per-step working sets pipeline
        # deepest; see `ops/pallas/vit_block.py`). ~0.8 us/step plus a
        # fixed ~3.3 us/kernel launch, fitted jointly with the
        # tile-quantization and mm-efficiency terms across seven bs128
        # anchors (all within 4.6%) and the measured batch-1 dense point
        # (4573 img/s, predicted within 4%). At batch 1 the model is
        # CONSERVATIVE on selection: it prices the per-layer policy/gate
        # dispatches at ~0.97x dense where the served engine measures
        # 1.10x (1.16x snapped) — XLA fuses those tiny ops more cheaply
        # than the per-op floors assume.
        boundary = 3.3e-6 + (_FM_BOUNDARY if fast_math else 1.0) * 0.8e-6 * b
        if int8:
            boundary += _INT8_STEP_OVERHEAD * b
        return SimulationReport(
            latency=mxu + vpu + mem + s.fusion_overhead + boundary,
            compute_latency=mxu + vpu, memory_latency=mem,
            cfg=[dict(op="fused_block", l=l, dim=dim, int8=int8)],
        )

    def token_select(self, l_from: int, l_to: int, d: int) -> SimulationReport:
        """Fixed-capacity top-k token selection: rank build + top_k over the
        mask + gathers of x/mask/score rows, lowering to ~4 fused regions
        (so dispatch overhead is charged 4x — negligible at bs128, decisive
        at batch 1 where every matmul is tiny).

        The dominant term at batch is the SORT: XLA lowers top_k to a
        variadic bitonic sort that runs nearly scalar on the VPU —
        re-measured r5 (the r2 anchors flattered it): the unfused select
        path costs ~23% more end-to-end than rank+gather traffic alone
        explains, which backs out to ~_SORT_RATE sorted elements/s. The
        fused engines dodge most of this by selecting once per capacity
        stage on a (B, L) score vector, but the cost is real in the
        reference-graph path this op prices."""
        b = self.spec.batch_size
        comp = (8.0 * b * l_from / self.spec.vpu_flops
                + b * l_from / _SORT_RATE)
        bytes_moved = 2.0 * b * l_to * d * self.dtype_bytes
        mem = bytes_moved / self.spec.mem_bandwidth
        return SimulationReport(
            latency=max(comp, mem) + 4.0 * self.spec.fusion_overhead,
            compute_latency=comp, memory_latency=mem,
            cfg=[dict(op="token_select", k=l_to)],
        )


def tpu_vit_block(p: TPUPredictor, l: int, dim: int, heads: int,
                  mlp_ratio: float, *, token_policy=False, head_policy=False,
                  layer_policy=False,
                  fused_attention=False) -> SimulationReport:
    """One LAUD-ViT block at token count ``l`` (dense-shape execution; the
    gating masks fuse for free, policy heads are skinny matmuls). Mirrors
    `models/laud_vit.py::LAUDViTBlock` op-for-op. ``fused_attention``
    prices the ``attn_impl='fused'`` path (one kernel replaces the
    head-split transpose, two HBM-bound bmms, softmax pass and merge
    transpose)."""
    b = p.spec.batch_size
    dh = dim // heads
    hidden = int(dim * mlp_ratio)
    rows = b * l
    # wide-layer derate on the unfused graph's weight matmuls (see the
    # _UF_WIDE_MM calibration note at the top of the module)
    wide = 1.0 + _UF_WIDE_MM * max(0.0, math.log2(dim / 384.0))
    rep = SimulationReport()
    if layer_policy:
        rep = rep + p.matmul(b, dim, 4)
    if head_policy:
        rep = rep + p.matmul(b, dim, 2 * heads)
    if token_policy:
        rep = rep + p.matmul(rows, dim, 2)
        # gate compose + key-mask add + output-mask multiplies: one more
        # fused elementwise region (its dispatch cost matters at batch 1)
        gate_mem = rows * p.dtype_bytes / p.spec.mem_bandwidth
        rep = rep + SimulationReport(
            latency=p.spec.fusion_overhead + gate_mem,
            memory_latency=gate_mem, cfg=[dict(op="token_gate")],
        )
        if not fused_attention:
            # the attention KEY mask: XLA materializes the broadcast
            # (B, H, L, L) f32 additive mask before the softmax region
            # instead of fusing the (B, 1, 1, L) source row — one f32
            # write + one f32 read of the full score shape. Re-measured
            # r5: this is the bulk of the unfused select path's cost over
            # dense (the fused kernels build the same mask in VMEM for
            # free), and the 8-bytes/elem traffic fit lands all five
            # fresh select anchors; see the _UF_* calibration note.
            km = 8.0 * b * heads * l * l / p.spec.mem_bandwidth
            rep = rep + SimulationReport(
                latency=km, memory_latency=km, cfg=[dict(op="key_mask")],
            )
    rep = rep + p.layernorm(rows * dim)  # norm1
    rep = rep + p.matmul(rows, dim, 3 * dim).scaled(wide)  # qkv
    if fused_attention:
        rep = rep + p.fused_attention(l, dim, heads)
    else:
        rep = rep + p.transpose(rows * 3 * dim)  # (B,L,3,H,dh)->(3,B,H,L,dh)
        rep = rep + p.batched_matmul(b * heads, l, dh, l)  # scores
        rep = rep + p.softmax(b * heads * l * l)
        rep = rep + p.batched_matmul(b * heads, l, l, dh)  # attn * values
        rep = rep + p.transpose(rows * dim)  # (B,H,L,dh)->(B,L,D) merge
    rep = rep + p.matmul(rows, dim, dim).scaled(wide)  # proj
    rep = rep + p.residual_add(rows * dim)  # x + attn branch
    rep = rep + p.layernorm(rows * dim)  # norm2
    rep = rep + p.matmul(rows, dim, hidden).scaled(wide)  # fc1
    rep = rep + p.gelu(rows * hidden)
    rep = rep + p.matmul(rows, hidden, dim).scaled(wide)  # fc2
    rep = rep + p.residual_add(rows * dim)  # x + mlp branch
    return rep


def tpu_predict_vit(p: TPUPredictor, *, depth: int = 12, dim: int = 384,
                    num_heads: int = 6, mlp_ratio: float = 4.0,
                    input_size: int = 224, patch_size: int = 16,
                    num_classes: int = 1000, mode: str = "dense",
                    token_capacity: Optional[Sequence[float]] = None,
                    fused_attention: bool = False,
                    fused_block: bool = False,
                    int8: bool = False,
                    fast_math: bool = True,
                    ) -> SimulationReport:
    """LAUD-ViT serving latency on TPU (the op set `models/laud_vit.py`
    actually executes; VERDICT r1 missing #5).

    Modes:
      * ``dense``  — all gates off.
      * ``token``  — fixed-capacity token selection: at block ``i``'s entry
        (right after its token gate) the token count shrinks to
        ``int(token_capacity[i] * (N+1))``, so block ``i``'s own matmuls and
        everything downstream shrink (quadratically for attention) —
        matching the in-block selection `models/laud_vit.py` executes.
      * ``head`` / ``layer`` / ``mask`` — gating without selection: masks
        multiply into fused epilogues, so the body runs at dense shapes and
        only the policy heads add cost. The model predicting ~1.0x here IS
        the finding (these paradigms don't pay off on TPU under batching).

    ``int8`` prices the W8A8 block engine (requires ``fused_block``).
    ``fast_math`` (default True, matching `build_fused_vit`'s serving
    default) prices the fast-math kernel body; only meaningful with
    ``fused_block``.

    Aggregation is the SUM of per-op latencies: unlike the CNN conv stack,
    the transformer alternates MXU matmuls with HBM/VPU-bound softmax and
    layernorm phases that XLA cannot overlap across the dependency chain.
    """
    if int8 and not fused_block:
        raise ValueError("int8 pricing requires fused_block=True "
                         "(the W8A8 path is the block engine)")
    n = (input_size // patch_size) ** 2
    b = p.spec.batch_size
    # patch embed: XLA lowers the stride==kernel patchify conv to a
    # (B*N, 3*ps^2) @ (3*ps^2, D) matmul after one im2col reorganize pass
    total = (p.transpose(b * 3 * input_size * input_size)
             + p.matmul(b * n, 3 * patch_size * patch_size, dim))
    l = n + 1
    caps = list(token_capacity) if token_capacity is not None else None
    for i in range(depth):
        if mode == "token" and caps is not None:
            k = min(max(2, int(caps[min(i, len(caps) - 1)] * (n + 1))), l)
            if k < l:
                total = total + p.token_select(l, k, dim)
                l = k
        if fused_block:
            if mode in ("token", "mask"):
                total = total + p.matmul(b * l, dim, 2)  # token policy
            if mode == "head":
                # head policy runs on the class token only (b rows); the
                # gate itself is a lane-expanded multiply inside the kernel
                total = total + p.matmul(b, dim, 2 * num_heads)
            total = total + p.fused_block(l, dim, num_heads, mlp_ratio,
                                          int8=int8, fast_math=fast_math)
        else:
            total = total + tpu_vit_block(
                p, l, dim, num_heads, mlp_ratio,
                token_policy=mode in ("token", "mask"),
                head_policy=mode == "head",
                layer_policy=mode == "layer",
                fused_attention=fused_attention,
            )
    total = total + p.layernorm(b * l * dim)
    total = total + p.matmul(b, dim, num_classes)
    return total


def tpu_channel_gather_block(p: TPUPredictor, g: BlockGeom,
                             rho: float) -> SimulationReport:
    """Per-image capacity-gathered channel execution: every image keeps
    K = rho*width channels; weights are take-gathered per image and the
    convs become per-image batched matmuls (conv2 as nine taps).

    Measured r2 on v5e (R101 stage-3 geometry: bs128, 14x14, cin 1024,
    width 256, rho 0.5/0.25): the weight gathers are nearly free but the
    fragmented per-image matmuls sustain only ~0.47 of peak (vs 0.85 for
    dense convs), so rho 0.5 LOSES at 0.69x and rho 0.25 is marginal at
    1.14x. The TPU lesson this mode encodes: shrink the ROW dimension
    (token/patch selection), not the contraction dimension (channels) —
    per-image contraction shrinking fragments the MXU.

    ``bmm_frac`` is calibrated at that one stage-3 point and is an UPPER
    BOUND elsewhere: an r3 probe (`tools/probe_channel_gather.py`) at two
    more geometries measured the per-image bmm chains sustaining far
    less — 28x28/K=64 (R50 stage-2) ran 0.60x dense (implied frac
    ~0.06), 7x7/K=256 (stage-4) 0.11x (frac ~0.01; 49-row per-image
    matmuls barely touch the MXU). The mode therefore OVERESTIMATES
    channel-gather away from stage-3 — conservative in the only
    direction that matters, since it already ranks the paradigm a loss.
    """
    bmm_frac = 0.45  # stage-3-calibrated upper bound (see docstring)
    s = p.spec
    b = s.batch_size
    k = max(1, int(g.width * rho))
    hw = g.h * g.h
    in_hw = (g.h * g.stride) ** 2
    flops = 2.0 * b * (
        in_hw * g.cin * k  # conv1 gathered outputs
        + hw * 9 * k * k  # conv2 taps
        + hw * k * g.cout  # conv3 gathered contraction
    )
    peak = s.peak_bf16 if p.dtype_bytes == 2 else s.peak_fp32
    compute = flops / (peak * bmm_frac)
    # per-image gathered weights sit on the critical path (measured: the
    # fixed cost between capacities equals exactly their HBM traffic);
    # activation traffic overlaps the matmul chain.
    weight_bytes = p.dtype_bytes * b * (g.cin * k + 9 * k * k + k * g.cout)
    act_bytes = p.dtype_bytes * b * (in_hw * g.cin + 2 * hw * g.cout)
    weight_mem = weight_bytes / s.mem_bandwidth
    act_mem = act_bytes / s.mem_bandwidth
    rep = SimulationReport(
        latency=max(compute, act_mem) + weight_mem + 13 * s.fusion_overhead,
        compute_latency=compute, memory_latency=weight_mem + act_mem,
        cfg=[dict(op="channel_gather_block", k=k)],
    )
    # the gating GAP: in THIS engine the producer is the previous block's
    # per-image bmm/scatter chain, which XLA does not fuse a reduction
    # into — the masker pays the full feature-map read (unlike dense-masked
    # serving, where the GAP fuses into the conv epilogue; `p.masker`)
    read = (p.dtype_bytes * b * in_hw * g.cin) / s.mem_bandwidth
    rep = rep + SimulationReport(
        latency=read, memory_latency=read, cfg=[dict(op="masker_read")],
    ) + p.masker(g.cin, 1, g.h * g.stride, g.h * g.stride, spatial=False)
    if g.has_downsample:
        rep = rep + p.conv(g.cin, g.cout, g.h * g.stride, g.h * g.stride, 1,
                           stride=g.stride)
    return rep + p.add(g.cout, g.h, g.h)


def tpu_static_block(p: TPUPredictor, g: BlockGeom) -> SimulationReport:
    inh = g.h * g.stride
    rep = p.conv(g.cin, g.width, inh, inh, 1)
    rep = rep + p.conv(g.width, g.width, inh, inh, 3, groups=g.groups,
                       stride=g.stride)
    if g.se_ratio:
        rep = rep + p.se(g.width, g.h, g.h, reduction=int(1 / g.se_ratio))
    rep = rep + p.conv(g.width, g.cout, g.h, g.h, 1)
    if g.has_downsample:
        rep = rep + p.conv(g.cin, g.cout, inh, inh, 1, stride=g.stride)
    rep = rep + p.add(g.cout, g.h, g.h)
    return rep


def tpu_pallas_spatial_block(p: TPUPredictor, g: BlockGeom, granul: int,
                             capacity: float) -> SimulationReport:
    """The fused Pallas engine (`ops/pallas/masked_block.py`): dense conv1 +
    masker, then per-patch fused conv2+conv3 in VMEM. Latency = per-patch
    DMA issue cost (2 window DMAs: in + out) + MXU patch compute + the
    zeros-init/residual epilogue — no HBM materialization of gathers."""
    s = p.spec
    inh = g.h * g.stride
    rep = p.masker(g.cin, max(g.h // granul, 1), inh, inh)
    rep = rep + p.conv(g.cin, g.width, inh, inh, 1)
    if g.stride != 1:
        rep = rep + p.conv(g.width, g.width, inh, inh, 3, stride=2,
                           groups=g.groups)
        rep = rep + p.conv(g.width, g.cout, g.h, g.h, 1)
        if g.has_downsample:
            rep = rep + p.conv(g.cin, g.cout, inh, inh, 1, stride=g.stride)
        return rep + p.add(g.cout, g.h, g.h)

    cells = (g.h // granul) ** 2
    k = max(1, math.ceil(capacity * cells))
    rep = rep + p.patch_conv(g.width, g.width, granul, capacity, cells, 3)
    rep = rep + p.patch_conv(g.width, g.cout, granul, capacity, cells, 1,
                             halo_in=False)
    dma = 2 * s.batch_size * k * s.dma_issue_overhead
    # epilogue: zeros init + relu(identity + scattered) fused pass
    epilogue = 3 * s.batch_size * g.cout * g.h * g.h * p.dtype_bytes \
        / s.mem_bandwidth
    if g.has_downsample:
        rep = rep + p.conv(g.cin, g.cout, inh, inh, 1, stride=g.stride)
    return rep + SimulationReport(latency=dma + epilogue,
                                  memory_latency=dma + epilogue,
                                  cfg=[dict(op="pallas_overhead", k=k)])


def tpu_spatial_block(p: TPUPredictor, g: BlockGeom, granul: int,
                      capacity: float) -> SimulationReport:
    """The XLA gather/scatter engine: dense conv1, gather, patch conv2+conv3,
    scatter (all via HBM buffers)."""
    inh = g.h * g.stride
    cells = (g.h // granul) ** 2
    rep = p.masker(g.cin, g.h // granul, inh, inh)
    rep = rep + p.conv(g.cin, g.width, inh, inh, 1)
    if g.stride != 1:
        # stride-2 blocks run dense in the current engine; record that in
        # the cfg trail so per-block reports are honest about it
        rep = rep + SimulationReport(cfg=[dict(op="dense_stride2_block")])
        rep = rep + p.conv(g.width, g.width, inh, inh, 3, stride=2,
                           groups=g.groups)
        rep = rep + p.conv(g.width, g.cout, g.h, g.h, 1)
    else:
        rep = rep + p.gather_patches(g.width, g.h, g.h, granul, capacity)
        rep = rep + p.patch_conv(g.width, g.width, granul, capacity, cells, 3)
        rep = rep + p.patch_conv(g.width, g.cout, granul, capacity, cells, 1,
                                 halo_in=False)
        rep = rep + p.scatter_add_patches(g.cout, g.h, g.h, granul, capacity)
    if g.has_downsample:
        rep = rep + p.conv(g.cin, g.cout, inh, inh, 1, stride=g.stride)
    if g.stride != 1:
        rep = rep + p.add(g.cout, g.h, g.h)
    return rep


def tpu_predict_network(p: TPUPredictor, model: str,
                        mode: str | Sequence[str] = "static",
                        act_rates: Optional[Sequence[float]] = None,
                        granularity: Optional[Sequence[int]] = None
                        ) -> SimulationReport:
    """Whole-network latency. ``mode`` is one paradigm name or a per-BLOCK
    sequence of names — the reference configures ``dyn_mode`` per stage
    (`train/main.py --dyn_mode channel-channel-layer-layer`), and mixed
    models price each block at its own stage's paradigm. Extra per-block
    names beyond the uniform paradigms: ``spatial_masked`` (dense-masked
    serving of a spatial stage: static body + spatial masker, the 0/1
    multiplies fuse for free) and ``both_masked`` (spatial + channel
    maskers on a static body)."""
    blocks = MODEL_GEOMETRY[model]
    n = len(blocks)
    act_rates = list(act_rates) if act_rates is not None else [1.0] * n
    granularity = list(granularity) if granularity is not None else [4] * n
    modes = [mode] * n if isinstance(mode, str) else list(mode)
    if len(modes) != n:
        raise ValueError(
            f"per-block mode list has {len(modes)} entries, model has {n}")
    total = SimulationReport()
    for g, rate, gran, m in zip(blocks, act_rates, granularity, modes):
        if m == "static":
            total = total + tpu_static_block(p, g)
        elif m == "spatial":
            total = total + tpu_spatial_block(p, g, min(gran, g.h), rate)
        elif m == "pallas":
            total = total + tpu_pallas_spatial_block(
                p, g, min(gran, g.h), rate
            )
        elif m == "channel":
            # channel mode runs dense on TPU today (masks fuse for free)
            total = total + tpu_static_block(p, g) + p.masker(
                g.cin, 1, g.h * g.stride, g.h * g.stride, spatial=False
            )
        elif m == "channel_gather":
            total = total + tpu_channel_gather_block(p, g, rate)
        elif m in ("spatial_masked", "both_masked"):
            total = total + tpu_static_block(p, g) + p.masker(
                g.cin, max(g.h // gran, 1), g.h * g.stride, g.h * g.stride
            )
            if m == "both_masked":
                total = total + p.masker(
                    g.cin, 1, g.h * g.stride, g.h * g.stride, spatial=False
                )
        elif m == "layer":
            masker = p.masker(g.cin, 1, g.h * g.stride, g.h * g.stride)
            body = tpu_static_block(p, g)
            total = total + masker + body.scaled(
                rate if p.spec.batch_size == 1 else 1.0
            )
        else:
            raise ValueError(m)
    # Under one jit, DMA and MXU overlap across the whole executable: the
    # network is bound by the larger of total compute and total traffic,
    # plus per-fusion scheduling overheads (one per recorded op).
    n_ops = len(total.cfg)
    return SimulationReport(
        latency=max(total.compute_latency, total.memory_latency)
        + n_ops * p.spec.fusion_overhead,
        compute_latency=total.compute_latency,
        memory_latency=total.memory_latency,
        cfg=total.cfg,
    )
