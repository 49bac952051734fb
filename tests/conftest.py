"""Test harness: force an 8-device CPU mesh so every sharding/collective path
is exercised without TPU hardware (SURVEY §4: multi-node-without-a-cluster).

This image's sitecustomize registers the remote-TPU ("axon") backend in every
python process and sets jax_platforms='axon,cpu' through jax.config — which
overrides the JAX_PLATFORMS env var. A CPU test run must win that fight, or
each pytest process tries to claim the single TPU tunnel (and blocks whenever
anything else holds it). So: set the config knob itself, before any backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
