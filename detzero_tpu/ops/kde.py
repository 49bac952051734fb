"""Gaussian kernel density estimation over grouped neighborhoods
(reference utils/detzero_utils/kde_utils.py:15-50): per query ball, the
density is logsumexp of isotropic Gaussian kernels over the sampled
neighbors — the PDV attention variant's positional density feature
(StackSAModuleMSGAttention, pointnet2_stack/pointnet2_modules.py:117)."""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def gaussian_kde_density(grouped_xyz, found, bandwidth: float = 0.5):
    """grouped_xyz (..., S, 3) neighbor offsets (relative to the query),
    found (..., S) validity -> (...,) log-density.

    density(q) = logsumexp_j N(offset_j; 0, h^2 I) over valid neighbors.
    """
    d2 = jnp.sum(grouped_xyz ** 2, axis=-1)  # (..., S)
    log_kernel = -0.5 * d2 / (bandwidth ** 2) - 1.5 * jnp.log(
        2 * jnp.pi * bandwidth ** 2)
    log_kernel = jnp.where(found, log_kernel, -jnp.inf)
    cnt = jnp.maximum(found.sum(axis=-1), 1)
    out = logsumexp(log_kernel, axis=-1) - jnp.log(cnt.astype(jnp.float32))
    return jnp.where(found.any(axis=-1), out, 0.0)
