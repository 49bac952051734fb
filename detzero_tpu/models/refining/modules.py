"""Shared bricks for the refining transformers.

Re-designs the reference's vendored transformer stack
(models/modules/transformer/: TransformerDecoderLayer, MultiheadAttention,
FFN, PositionEmbeddingLearned) on flax attention with explicit key-padding
masks. Attention sizes here (<=200 query tokens, <=9600 memory tokens) fit
VMEM-tiled XLA attention; no ring/sequence parallelism needed (SURVEY §5
long-context note).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class PositionEmbeddingLearned(nn.Module):
    """MLP over coordinates -> d_model embedding (reference
    PositionEmbeddingLearned, transformer/__init__ bricks)."""

    d_model: int
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords):
        x = nn.Dense(self.hidden, dtype=self.dtype)(coords)
        x = nn.relu(x)
        return nn.Dense(self.d_model, dtype=self.dtype)(x)


class FFN(nn.Module):
    d_model: int
    d_ff: int = 256
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return x + h


class DecoderLayer(nn.Module):
    """Pre-computed positional-embedding decoder layer: optional self-attn
    over queries, cross-attn to memory with key padding mask, FFN.
    Post-norm residual wiring like the reference decoder.py:48-92."""

    d_model: int
    n_heads: int = 4
    d_ff: int = 256
    with_self_attn: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, memory, query_pos=None, memory_pos=None,
                 query_mask=None, memory_mask=None, deterministic=True):
        """query (Q, D), memory (M, D); masks are bool validity (True=keep)."""
        q = query if query_pos is None else query + query_pos
        if self.with_self_attn:
            sa_mask = None
            if query_mask is not None:
                sa_mask = query_mask[None, None, :] & query_mask[None, :, None]
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model,
                dtype=self.dtype, name="self_attn",
            )(inputs_q=q, inputs_k=q, inputs_v=query, mask=sa_mask)
            query = nn.LayerNorm(dtype=self.dtype, name="norm_sa")(query + attn)
            q = query if query_pos is None else query + query_pos

        k = memory if memory_pos is None else memory + memory_pos
        ca_mask = None
        if memory_mask is not None:
            qm = (query_mask if query_mask is not None
                  else jnp.ones(query.shape[0], bool))
            ca_mask = qm[None, :, None] & memory_mask[None, None, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dtype=self.dtype, name="cross_attn",
        )(inputs_q=q, inputs_k=k, inputs_v=memory, mask=ca_mask)
        query = nn.LayerNorm(dtype=self.dtype, name="norm_ca")(query + attn)
        query = FFN(self.d_model, self.d_ff, self.dropout, dtype=self.dtype)(
            query, deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm_ffn")(query)
        return query


class PointNetEncoder(nn.Module):
    """Shared-MLP + masked max-pool point encoder with intermediate-feature
    concat (the reference's memory/query encoders, geometry_transformer
    forward:118-137 are this shape)."""

    features: Sequence[int] = (64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, mask=None):
        """points (..., N, F) -> global (..., C_out), pointwise (..., N, C)."""
        x = points.astype(self.dtype)
        inter = []
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"mlp{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
            inter.append(x)
        if mask is not None:
            m = mask[..., None]
            x_masked = jnp.where(m, x, -jnp.inf)
        else:
            x_masked = x
        pooled = x_masked.max(axis=-2)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        # concat pooled global back onto per-point features
        n = points.shape[-2]
        glob = jnp.broadcast_to(pooled[..., None, :], (*x.shape[:-1], pooled.shape[-1]))
        pointwise = jnp.concatenate([inter[0], glob], axis=-1)
        return pooled, pointwise
