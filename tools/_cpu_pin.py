"""Pin the CPU jax backend before any detzero import.

The image's sitecustomize registers the remote-TPU backend on the first
jax.numpy import; a second TPU claimant (or a dead tunnel) blocks forever.
Host-side CPU tools import this FIRST:

    import _cpu_pin  # noqa: F401  (tools/ is on sys.path)
"""

import jax

jax.config.update("jax_platforms", "cpu")
