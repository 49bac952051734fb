"""Dense 2D BEV backbone (reference BaseBEVBackbone, backbone2d.py:6).

Conv blocks [5,5] at strides [1,2] with filters [128,256], each upsampled back
with a transposed conv and channel-concatenated into the 512-channel
`spatial_features_2d` map. NHWC layout (TPU-native); BN+ReLU after every conv.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.models.layers import ConvBNReLU, MaskedBatchNorm


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    num_filters: Sequence[int] = (128, 256)
    upsample_strides: Sequence[int] = (1, 2)
    num_upsample_filters: Sequence[int] = (256, 256)
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(use_running_average=self.use_running_average,
                  axis_names=self.axis_names, dtype=self.dtype)
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBNReLU(self.num_filters[i], 3, self.layer_strides[i], **kw)(x)
            for _ in range(n_layers):
                x = ConvBNReLU(self.num_filters[i], 3, 1, **kw)(x)
            s = self.upsample_strides[i]
            if s > 1:
                u = nn.ConvTranspose(
                    self.num_upsample_filters[i], (s, s), strides=(s, s),
                    use_bias=False, dtype=self.dtype,
                )(x)
            else:
                u = nn.Conv(
                    self.num_upsample_filters[i], (s, s), strides=(s, s),
                    use_bias=False, dtype=self.dtype,
                )(x)
            u = MaskedBatchNorm(
                use_running_average=self.use_running_average,
                axis_names=self.axis_names, dtype=self.dtype,
            )(u)
            ups.append(nn.relu(u))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
