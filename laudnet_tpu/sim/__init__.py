"""DyNetSimulator rebuild: analytic latency prediction for dynamic networks.

GPU multi-core roofline model (reference presets: V100 / RTX3090 / RTX3060 /
TX2 / Nano) plus a TPU hardware model (MXU systolic utilization, VPU lanes,
VMEM tiling, HBM bandwidth, XLA dispatch overhead) the reference lacks.
"""

from laudnet_tpu.sim.report import SimulationReport  # noqa: F401
