"""PRM — Position Refining Model.

Re-designs the reference PositionTransformer (position_transformer.py:14 +
position_head.py): whole-track center/heading smoothing. Each of the <=T
track boxes contributes a query token (PointNet over its 256 init-frame-local
points) with a learned (x,y,z,yaw) positional embedding; the memory is every
box's 48-point global feature set (T*48 tokens). The decoder self-attends
across the track (temporal smoothing) and cross-attends to the memory with
padding masks. Heads: center residual + 12-bin heading cls + in-bin residual
(target_assign.py:32-53 semantics).
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
from detzero_tpu.models.refining.target_assign import (
    NUM_HEADING_BINS, decode_heading, encode_heading,
)


@REFINE_MODULES.register("PositionTransformer")
class PositionTransformer(nn.Module):
    d_model: int = 256
    n_heads: int = 4
    num_decoder_layers: int = 1
    mem_points: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_pts, query_boxes, memory_pts, pad_mask):
        """query_pts (T, Np, F); query_boxes (T, 4) [x,y,z,yaw] in init-box
        coords; memory_pts (T, Nm, F); pad_mask (T,) True for real boxes.
        Returns dict(center (L,T,3), heading_logits (L,T,12),
        heading_res (L,T,12))."""
        t = query_pts.shape[0]
        q_tok, _ = PointNetEncoder((64, 128, self.d_model), dtype=self.dtype,
                                   name="query_enc")(query_pts)  # (T, D)
        q_pos = PositionEmbeddingLearned(self.d_model, dtype=self.dtype,
                                         name="query_pos")(query_boxes)

        m = memory_pts.astype(self.dtype)
        for i, f in enumerate((64, self.d_model)):
            m = nn.Dense(f, dtype=self.dtype, name=f"mem{i}")(m)
            m = nn.LayerNorm(dtype=self.dtype, name=f"mem_ln{i}")(m)
            m = nn.relu(m)
        nm = m.shape[1]
        mem = m.reshape(t * nm, self.d_model)
        mem_mask = jnp.repeat(pad_mask, nm)
        m_pos = PositionEmbeddingLearned(
            self.d_model, dtype=self.dtype, name="mem_pos"
        )(memory_pts[..., :3].reshape(t * nm, 3))

        outs = []
        x = q_tok
        for li in range(self.num_decoder_layers):
            x = DecoderLayer(self.d_model, self.n_heads, dtype=self.dtype,
                             name=f"dec{li}")(
                x, mem, query_pos=q_pos, memory_pos=m_pos,
                query_mask=pad_mask, memory_mask=mem_mask,
            )
            h = nn.Dense(self.d_model, dtype=self.dtype, name=f"out_mlp{li}")(x)
            h = nn.relu(h)
            outs.append({
                "center": nn.Dense(3, dtype=jnp.float32, name=f"center{li}")(h),
                "heading_logits": nn.Dense(NUM_HEADING_BINS, dtype=jnp.float32,
                                           name=f"hbin{li}")(h),
                "heading_res": nn.Dense(NUM_HEADING_BINS, dtype=jnp.float32,
                                        name=f"hres{li}")(h),
            })
        return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}


def prm_loss(pred, gt_centers, gt_headings, pad_mask, center_weight=1.0,
             cls_weight=0.1, res_weight=2.0):
    """Masked L1 center + CE heading bin + gathered in-bin residual L1
    (position_transformer get_loss:143-186 semantics). Shapes: gt (T, 3)/(T,)."""
    m = pad_mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    center_l1 = (jnp.abs(pred["center"] - gt_centers[None]).mean(-1) * m[None]).sum() \
        / (denom * pred["center"].shape[0])
    b_t, r_t = encode_heading(gt_headings)  # (T,), (T,)
    logp = jax.nn.log_softmax(pred["heading_logits"], axis=-1)  # (L, T, 12)
    ce = -(jnp.take_along_axis(logp, b_t[None, :, None], axis=-1)[..., 0] * m[None]).sum() \
        / (denom * logp.shape[0])
    res_p = jnp.take_along_axis(pred["heading_res"], b_t[None, :, None], axis=-1)[..., 0]
    res_l1 = (jnp.abs(res_p - r_t[None]) * m[None]).sum() / (denom * res_p.shape[0])
    total = center_weight * center_l1 + cls_weight * ce + res_weight * res_l1
    return total, {"prm_center": center_l1, "prm_hce": ce, "prm_hres": res_l1}


def prm_decode(pred, query_boxes=None):
    """Last-layer center + heading per box: (T, 3), (T,).

    Center is a RESIDUAL (reference target_assign.py:44 'center_reg =
    traj_gt - traj' and decode_torch:97 'center_reg + pos_trajectory'):
    query_boxes (T, 4) [x, y, z, yaw in init coords] supply the centers
    added back. Heading is ABSOLUTE in init coords (reference
    target_assign.py:50 bins traj_gt[:, 6] directly; decode_torch:99-103
    never adds the input heading): the input trajectory's headings carry
    per-frame pi-flips, so a heading residual would be a bimodal,
    unlearnable target, while the absolute heading is near-constant along
    the track in init coords — heading consistency is PRM's whole job.
    Without query_boxes the raw center residuals are returned
    (training/debug)."""
    center = pred["center"][-1]
    heading = decode_heading(pred["heading_logits"][-1], pred["heading_res"][-1])
    if query_boxes is not None:
        center = center + query_boxes[:, :3]
    return center, heading
