"""Process-aware logging (reference: common_utils.py:20-47).

Rank-0 logs at the requested level to console + optional file; other processes
log at ERROR only. Rank is taken from jax.process_index() when jax is
initialized, else 0.
"""

from __future__ import annotations

import logging
import random

import numpy as np


def get_rank() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def create_logger(log_file=None, rank: int | None = None, log_level=logging.INFO):
    if rank is None:
        rank = get_rank()
    logger = logging.getLogger(f"detzero_tpu.r{rank}.{log_file}")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    if logger.handlers:
        return logger
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.ERROR)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed: int):
    """Seed python/numpy RNGs (common_utils.py:49-58). JAX randomness is
    explicit via PRNG keys, so determinism falls out of key plumbing."""
    random.seed(seed)
    np.random.seed(seed)
