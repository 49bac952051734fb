"""Shared flax building blocks.

Replaces the reference's torch layer builders (model_utils.py:81-135
make_linear/fc/conv_layers: Linear/Conv + BN(eps 1e-3, momentum 0.01) + ReLU)
with TPU-idiomatic equivalents. Two departures from stock flax:

  * MaskedBatchNorm — sparse voxel tables are padded to a static budget, so
    batch statistics must be computed over *valid rows only*; stats are
    synchronized over vmap/data axes via lax.pmean (the reference's
    SyncBatchNorm, train.py:126, becomes free).
  * compute dtype is a knob (bfloat16 on TPU), params/stats stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the leading (row) axis with a row-validity mask.

    Matches the reference BN hyperparams (eps 1e-3, torch momentum 0.01 ==
    decay 0.99). axis_names: collective axes (vmap batch axis and/or the data
    mesh axis) to average statistics over.
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32
    # channel axis of x: -1 for the (rows, ..., C) voxel layouts, 2 for the
    # transposed row-padded pillar layout (ny, nz, C, B) of ops/pallas_pillar
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, mask=None, return_affine=False):
        ch = self.channel_axis % x.ndim
        c = x.shape[ch]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if return_affine:
            # folded eval-mode affine IN FLOAT32 (probing the module's
            # bf16 outputs instead suffers catastrophic cancellation when
            # |bias| >> |scale|): y = x * sc2 + bi2
            if not self.use_running_average:
                raise ValueError("return_affine requires running averages")
            sc2 = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            bi2 = bias - ra_mean.value * sc2
            return sc2, bi2

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(i for i in range(x.ndim) if i != ch)
            if mask is not None:
                m = mask.astype(jnp.float32)
                if ch == x.ndim - 1:
                    while m.ndim < xf.ndim:
                        m = m[..., None]
                # else: caller passes a mask already broadcastable to x
                cnt = m.sum()
                s = (xf * m).sum(axis=reduce_axes)
                ss = (xf * xf * m).sum(axis=reduce_axes)
            else:
                n_rows = 1
                for i, d in enumerate(x.shape):
                    if i != ch:
                        n_rows *= d
                cnt = jnp.asarray(float(n_rows))
                s = xf.sum(axis=reduce_axes)
                ss = (xf * xf).sum(axis=reduce_axes)
            for ax in self.axis_names:
                cnt = jax.lax.psum(cnt, ax)
                s = jax.lax.psum(s, ax)
                ss = jax.lax.psum(ss, ax)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        bshape = [1] * x.ndim
        bshape[ch] = c
        mean_b = mean.reshape(bshape)
        var_b = var.reshape(bshape)
        y = (x.astype(jnp.float32) - mean_b) * jax.lax.rsqrt(
            var_b + self.epsilon)
        y = y * scale.reshape(bshape) + bias.reshape(bshape)
        return y.astype(self.dtype)


class MLP(nn.Module):
    """Dense+BN+ReLU stack (reference make_linear_layers / make_fc_layers)."""

    features: Sequence[int]
    use_running_average: bool = False
    final_act: bool = True
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=False, dtype=self.dtype, name=f"dense{i}")(x)
            x = MaskedBatchNorm(
                use_running_average=self.use_running_average,
                axis_names=self.axis_names, dtype=self.dtype, name=f"bn{i}",
            )(x, mask)
            if self.final_act or i + 1 < len(self.features):
                x = nn.relu(x)
        return x


class ConvBNReLU(nn.Module):
    """2D conv + BN + ReLU on NHWC BEV maps (reference make_conv_layers)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_running_average: bool = False
    act: bool = True
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME", use_bias=False,
            dtype=self.dtype,
        )(x)
        x = MaskedBatchNorm(
            use_running_average=self.use_running_average,
            axis_names=self.axis_names, dtype=self.dtype,
        )(x)
        return nn.relu(x) if self.act else x
