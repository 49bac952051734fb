"""Box residual coders (reference utils/box_coder_utils.py).

ResidualCoder: anchor-relative encoding used by the RoI refinement head —
center offsets normalized by the anchor diagonal, log size ratios, heading
residual (optionally sin/cos split).
"""

from __future__ import annotations

import jax.numpy as jnp


class ResidualCoder:
    def __init__(self, code_size: int = 7, encode_angle_by_sincos: bool = False):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """boxes/anchors (..., 7+) -> (..., code_size) residuals."""
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = boxes[..., 3], boxes[..., 4], boxes[..., 5]
        rg = boxes[..., 6]
        dxa = jnp.maximum(dxa, 1e-5)
        dya = jnp.maximum(dya, 1e-5)
        dza = jnp.maximum(dza, 1e-5)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / dza
        dxt = jnp.log(jnp.maximum(dxg, 1e-5) / dxa)
        dyt = jnp.log(jnp.maximum(dyg, 1e-5) / dya)
        dzt = jnp.log(jnp.maximum(dzg, 1e-5) / dza)
        if self.sincos:
            rt = [jnp.sin(rg) * jnp.cos(ra) - jnp.cos(rg) * jnp.sin(ra),
                  jnp.cos(rg) * jnp.cos(ra) + jnp.sin(rg) * jnp.sin(ra)]
        else:
            rt = [rg - ra]
        rest = [boxes[..., i] - anchors[..., i]
                for i in range(7, boxes.shape[-1])]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rt, *rest], axis=-1)

    def decode(self, deltas, anchors):
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        dxa = jnp.maximum(dxa, 1e-5)
        dya = jnp.maximum(dya, 1e-5)
        dza = jnp.maximum(dza, 1e-5)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = deltas[..., 0] * diag + xa
        yg = deltas[..., 1] * diag + ya
        zg = deltas[..., 2] * dza + za
        dxg = jnp.exp(jnp.clip(deltas[..., 3], -4, 4)) * dxa
        dyg = jnp.exp(jnp.clip(deltas[..., 4], -4, 4)) * dya
        dzg = jnp.exp(jnp.clip(deltas[..., 5], -4, 4)) * dza
        if self.sincos:
            rg = jnp.arctan2(deltas[..., 6], deltas[..., 7]) + ra
            rest_start = 8
        else:
            rg = deltas[..., 6] + ra
            rest_start = 7
        rest = [deltas[..., i] + anchors[..., 7 + i - rest_start]
                for i in range(rest_start, deltas.shape[-1])]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *rest], axis=-1)


class PreviousResidualDecoder:
    """Decode-only legacy coder (box_coder_utils.py:80): residuals whose
    center offsets are normalized by the anchor diagonal like ResidualCoder,
    kept for loading detections produced by older pipelines."""

    code_size = 7

    @staticmethod
    def decode(deltas, anchors):
        return ResidualCoder().decode(deltas, anchors)


class PointResidualCoder:
    """Point-anchored coder (box_coder_utils.py:144): boxes encoded against
    bare points with class-mean sizes as the size prior."""

    def __init__(self, mean_sizes, use_mean_size: bool = True):
        self.mean_sizes = jnp.asarray(mean_sizes)  # (num_cls, 3)
        self.use_mean_size = use_mean_size
        self.code_size = 8  # xt, yt, zt, dxt, dyt, dzt, sin, cos

    def encode(self, boxes, points, classes=None):
        if self.use_mean_size and classes is not None:
            prior = self.mean_sizes[classes]
        else:
            prior = jnp.ones((*boxes.shape[:-1], 3), boxes.dtype)
        diag = jnp.sqrt(prior[..., 0] ** 2 + prior[..., 1] ** 2)
        xt = (boxes[..., 0] - points[..., 0]) / diag
        yt = (boxes[..., 1] - points[..., 1]) / diag
        zt = (boxes[..., 2] - points[..., 2]) / prior[..., 2]
        dt = jnp.log(jnp.maximum(boxes[..., 3:6], 1e-5) / prior)
        return jnp.concatenate([
            xt[..., None], yt[..., None], zt[..., None], dt,
            jnp.sin(boxes[..., 6:7]), jnp.cos(boxes[..., 6:7])], axis=-1)

    def decode(self, deltas, points, classes=None):
        if self.use_mean_size and classes is not None:
            prior = self.mean_sizes[classes]
        else:
            prior = jnp.ones((*deltas.shape[:-1], 3), deltas.dtype)
        diag = jnp.sqrt(prior[..., 0] ** 2 + prior[..., 1] ** 2)
        x = deltas[..., 0] * diag + points[..., 0]
        y = deltas[..., 1] * diag + points[..., 1]
        z = deltas[..., 2] * prior[..., 2] + points[..., 2]
        dims = jnp.exp(jnp.clip(deltas[..., 3:6], -4, 4)) * prior
        heading = jnp.arctan2(deltas[..., 6], deltas[..., 7])
        return jnp.concatenate([
            x[..., None], y[..., None], z[..., None], dims,
            heading[..., None]], axis=-1)
