"""Feature Pyramid Network (standard RetinaNet P3-P7 variant)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class FPN(nn.Module):
    """Lateral 1x1 + top-down upsample + 3x3 smoothing; extra P6/P7 levels
    from the last backbone feature (RetinaNet convention)."""

    out_channels: int = 256
    num_extra_levels: int = 2  # P6, P7
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (None = exact f32 promotion)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        n = len(features)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}",
                    dtype=self.dtype, param_dtype=self.param_dtype)(f)
            for i, f in enumerate(features)
        ]
        for i in range(n - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"smooth_{i}",
                    dtype=self.dtype, param_dtype=self.param_dtype)(l)
            for i, l in enumerate(laterals)
        ]
        extra = features[-1]
        for j in range(self.num_extra_levels):
            extra = nn.Conv(self.out_channels, (3, 3), strides=2, padding=1,
                            name=f"extra_{j}", dtype=self.dtype,
                            param_dtype=self.param_dtype)(
                extra if j == 0 else nn.relu(extra)
            )
            outs.append(extra)
        return tuple(outs)
