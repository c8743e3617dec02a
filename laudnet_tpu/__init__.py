"""laudnet-tpu: TPU-native (JAX/XLA/Pallas) latency-aware unified dynamic networks.

A ground-up rebuild of the capabilities of LeapLabTHU/LAUDNet (TPAMI 2024):
spatial-wise, channel-wise and layer-wise adaptive inference via Gumbel-softmax
gating heads, FLOPs-targeted sparsity training with knowledge distillation,
an analytic hardware latency predictor (GPU presets + a TPU model), and
block-sparse Pallas inference kernels that skip MXU work per mask.

Everything is static-shape and jit-friendly: masks are dense 0/1 arrays in the
training graph, and the inference fast path uses fixed-capacity gather/scatter.
Data layout is NHWC throughout (TPU-native), unlike the reference's NCHW.
"""

__version__ = "0.1.0"

from laudnet_tpu import ops, models, train, parallel, sim, utils  # noqa: F401
