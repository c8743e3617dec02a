"""Hardware specifications for the latency predictor.

GPU presets match the reference's published targets
(`DyNetSimulator/eval_example.py:135-156`): V100, RTX3090, RTX3060, Jetson
TX2, Jetson Nano. The TPU specs are new (the capability BASELINE.json asks
for): TPU v5e / v5p with MXU/VPU/HBM parameters and XLA dispatch overhead in
place of CUDA kernel-launch time.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class DeviceSpec:
    """A multi-core SIMT-style device (GPU) for the roofline model."""

    name: str
    n_cores: int  # streaming multiprocessors
    lanes: int  # fp32 lanes per core
    frequency: float  # Hz
    mem_bandwidth: float  # bytes/s
    cache_speed_frac: float = 4.0  # L2 bandwidth as multiple of HBM
    issue_cycles: float = 4.0  # pipeline slots per lane (fp32_cycles)
    mem_concurrent: float = 8.0  # fp32 words per coalesced sector
    memory_efficiency: float = 0.9
    launch_time: float = 8e-6  # per-kernel launch overhead, seconds
    latency_mode: str = "add"  # 'add' | 'max' of compute/memory
    batch_size: int = 1

    @property
    def mem_fp32_bandwidth(self) -> float:
        return self.mem_bandwidth / 4.0

    @property
    def cache_fp32_bandwidth(self) -> float:
        return self.mem_fp32_bandwidth * self.cache_speed_frac

    @property
    def peak_parallelism(self) -> float:
        return self.lanes * self.issue_cycles

    def with_batch(self, batch_size: int) -> "DeviceSpec":
        return replace(self, batch_size=batch_size)


# Reference GPU targets (`eval_example.py:135-156`).
GPU_PRESETS = {
    "v100": DeviceSpec(
        "v100", n_cores=80, lanes=64, frequency=1.5e9,
        mem_bandwidth=700e9, batch_size=128,
    ),
    "rtx3090": DeviceSpec(
        "rtx3090", n_cores=82, lanes=128, frequency=1.25e9,
        mem_bandwidth=936e9, cache_speed_frac=1.0, batch_size=128,
    ),
    "rtx3060": DeviceSpec(
        "rtx3060", n_cores=28, lanes=128, frequency=1.777e9,
        mem_bandwidth=360e9, batch_size=128,
    ),
    "tx2": DeviceSpec(
        "tx2", n_cores=2, lanes=128, frequency=1.3e9,
        mem_bandwidth=59.7e9, batch_size=1,
    ),
    "nano": DeviceSpec(
        "nano", n_cores=1, lanes=128, frequency=921e6,
        mem_bandwidth=25.6e9, batch_size=1,
    ),
}


@dataclass(frozen=True)
class TPUSpec:
    """A TPU chip for the TPU latency model.

    ``peak_bf16``/``peak_fp32`` are MXU throughputs; ``vpu_flops`` the vector
    unit; ``fusion_overhead`` replaces kernel launch time — the per-fused-
    region scheduling cost inside one XLA executable (measured, not 8 us).
    ``sustained_frac`` is the measured fraction of peak a well-tiled conv
    stack achieves (calibrated on v5e with overhead-corrected timing:
    ResNet-101 bs128 bf16 = 14.1 ms/batch = 141 TFLOP/s sustained; combined
    with the per-op MXU alignment derates this gives 0.85).
    """

    name: str
    peak_bf16: float  # FLOP/s
    peak_fp32: float
    vpu_flops: float  # FLOP/s, elementwise
    mem_bandwidth: float  # bytes/s HBM
    vmem_bytes: float
    fusion_overhead: float = 1.5e-6
    sustained_frac: float = 0.70
    mxu_dim: int = 128
    batch_size: int = 128
    # s8 x s8 -> s32 MXU rate; 0.0 means "derive from bf16 x the
    # v5e-calibrated effective multiplier" (sim/tpu.py::_INT8_MM_MULT,
    # 1.8 — the nominal 2x is not reached on the measured anchors)
    peak_int8: float = 0.0
    # Per-DMA issue cost for dynamically-indexed Pallas window copies
    # (measured on v5e: total kernel time tracks 3 * B * K DMAs at ~0.27 us
    # each regardless of patches-per-step or double buffering).
    dma_issue_overhead: float = 0.27e-6

    def with_batch(self, batch_size: int) -> "TPUSpec":
        return replace(self, batch_size=batch_size)


TPU_PRESETS = {
    # v5e: 197 bf16 TFLOPs, 16 GB HBM @ 819 GB/s, ~128 MB VMEM.
    "v5e": TPUSpec(
        "v5e", peak_bf16=197e12, peak_fp32=49e12, vpu_flops=4e12,
        mem_bandwidth=819e9, vmem_bytes=128e6, batch_size=128,
        sustained_frac=0.85,
    ),
    # v5p: 459 bf16 TFLOPs, 95 GB HBM @ 2765 GB/s.
    "v5p": TPUSpec(
        "v5p", peak_bf16=459e12, peak_fp32=115e12, vpu_flops=8e12,
        mem_bandwidth=2765e9, vmem_bytes=128e6, batch_size=128,
    ),
    # v6e (Trillium): 918 bf16 TFLOPs, 32 GB HBM @ 1640 GB/s (published
    # chip specs). Projection-only preset — no v6e chip in this container;
    # sustained_frac carries over the v5e-MEASURED 0.85 rather than a
    # chip-calibrated value. peak_int8 is deliberately left 0 so the int8
    # rate derives as the v5e-calibrated 1.8x bf16 (_INT8_MM_MULT) rather
    # than the nominal 2x (1836 TOPS) no measured chip has reached.
    "v6e": TPUSpec(
        "v6e", peak_bf16=918e12, peak_fp32=230e12, vpu_flops=8e12,
        mem_bandwidth=1640e9, vmem_bytes=128e6, batch_size=128,
        sustained_frac=0.85,
    ),
}
