"""GRM — Geometry Refining Model.

Re-designs the reference GeometryTransformer (geometry_transformer.py:11 +
geometry_head.py): per-object-track size refinement. The top-Q highest-score
proposals become query tokens (PointNet over 256 box-local points each); the
memory is the WHOLE track's point cloud (4096 points pooled across all
frames); a decoder layer (self-attn over Q tokens, cross-attn to memory)
predicts residuals to the nearest of K size anchors plus anchor
classification. Decode averages over queries (generate_predicted_boxes:91).

One object per call; batch via vmap — every shape is static (queries padded
by construction, memory carries a validity mask).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.core.registry import REFINE_MODULES
from detzero_tpu.models.refining.modules import (
    DecoderLayer, PointNetEncoder, PositionEmbeddingLearned,
)
from detzero_tpu.models.refining.target_assign import decode_size, encode_size


@REFINE_MODULES.register("GeometryTransformer")
class GeometryTransformer(nn.Module):
    d_model: int = 256
    n_heads: int = 4
    num_anchors: int = 3
    num_decoder_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_pts, query_sizes, memory_pts, memory_mask,
                 query_mask=None):
        """query_pts (Q, Np, F) box-local points per proposal;
        query_sizes (Q, 3) proposal sizes (positional prior);
        memory_pts (M, F) full-track points; memory_mask (M,) validity.
        Returns dict(anchor_logits (L, Q, K), size_res (L, Q, K, 3))."""
        q_tok, _ = PointNetEncoder(
            (64, 128, self.d_model), dtype=self.dtype, name="query_enc"
        )(query_pts)  # (Q, D)
        q_pos = PositionEmbeddingLearned(self.d_model, dtype=self.dtype,
                                         name="query_pos")(query_sizes)

        m = memory_pts.astype(self.dtype)
        for i, f in enumerate((64, 128, self.d_model)):
            m = nn.Dense(f, dtype=self.dtype, name=f"mem{i}")(m)
            m = nn.LayerNorm(dtype=self.dtype, name=f"mem_ln{i}")(m)
            m = nn.relu(m)
        m_pos = PositionEmbeddingLearned(self.d_model, dtype=self.dtype,
                                         name="mem_pos")(memory_pts[:, :3])

        outs = []
        x = q_tok
        for li in range(self.num_decoder_layers):
            x = DecoderLayer(self.d_model, self.n_heads, dtype=self.dtype,
                             name=f"dec{li}")(
                x, m, query_pos=q_pos, memory_pos=m_pos,
                query_mask=query_mask, memory_mask=memory_mask,
            )
            h = nn.Dense(self.d_model, dtype=self.dtype, name=f"out_mlp{li}")(x)
            h = nn.relu(h)
            outs.append({
                "anchor_logits": nn.Dense(self.num_anchors, dtype=jnp.float32,
                                          name=f"cls{li}")(h),
                "size_res": nn.Dense(self.num_anchors * 3, dtype=jnp.float32,
                                     name=f"reg{li}")(h).reshape(
                    -1, self.num_anchors, 3),
            })
        return {
            "anchor_logits": jnp.stack([o["anchor_logits"] for o in outs]),
            "size_res": jnp.stack([o["size_res"] for o in outs]),
        }


def grm_loss(pred, gt_size, anchors, cls_weight=0.1, reg_weight=2.0):
    """CE anchor classification + L1 on the gt-anchor residual, averaged over
    layers and queries (geometry_transformer.py:158-194)."""
    cls_t, res_t = encode_size(gt_size, anchors)  # (), (K, 3)
    logits = pred["anchor_logits"]  # (L, Q, K)
    l, q, k = logits.shape
    ce = -jax.nn.log_softmax(logits)[..., cls_t].mean()
    res_p = pred["size_res"][:, :, cls_t, :]  # (L, Q, 3)
    l1 = jnp.abs(res_p - res_t[cls_t]).mean()
    return cls_weight * ce + reg_weight * l1, {"grm_ce": ce, "grm_l1": l1}


def grm_decode(pred, anchors):
    """Average decoded size over layers x queries (reference averages over
    queries & layers)."""
    sizes = decode_size(pred["anchor_logits"], pred["size_res"], anchors)
    return sizes.reshape(-1, 3).mean(axis=0)
