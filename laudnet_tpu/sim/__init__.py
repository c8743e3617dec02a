"""DyNetSimulator rebuild: analytic latency prediction for dynamic networks.

GPU multi-core roofline model (reference presets: V100 / RTX3090 / RTX3060 /
TX2 / Nano) plus a TPU hardware model (MXU systolic utilization, VPU lanes,
VMEM tiling, HBM bandwidth, XLA dispatch overhead) the reference lacks.
"""

from laudnet_tpu.sim.report import SimulationReport  # noqa: F401
from laudnet_tpu.sim.hardware import (  # noqa: F401
    GPU_PRESETS,
    TPU_PRESETS,
    DeviceSpec,
    TPUSpec,
)
from laudnet_tpu.sim.roofline import Predictor  # noqa: F401
from laudnet_tpu.sim.dynamic import DynamicPredictor  # noqa: F401
from laudnet_tpu.sim.tpu import TPUPredictor, tpu_predict_network  # noqa: F401
from laudnet_tpu.sim.models import predict_network, MODEL_GEOMETRY  # noqa: F401
from laudnet_tpu.sim.plan import (  # noqa: F401
    ExecutionPlan,
    plan_resnet_serving,
    plan_vit_serving,
    rank_vit_paradigms,
)
