"""Benchmark: flagship CenterPoint inference at Waymo scale, frames/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput (SURVEY §6); we use an
estimated 20 frames/sec for single-model (no-TTA) CenterPoint-Res inference on
one A100 as the denominator (typical OpenPCDet-class numbers; to be replaced
by a measured value when reference hardware is available — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_EST_FPS = 20.0


def main():
    import jax
    # persistent compilation cache: the full-scale model + fused NMS compile
    # takes minutes via the remote-compile service; cache hits are seconds
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    if os.environ.get("BENCH_TINY", "0") == "1":
        # force CPU BEFORE touching jax.devices(): the image's sitecustomize
        # pins the axon TPU backend, and a second TPU process would block on
        # the tunnel (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    tiny = os.environ.get("BENCH_TINY", "0") == "1" or jax.devices()[0].platform == "cpu"
    os.environ["GRAFT_TINY"] = "1" if tiny else "0"
    if not tiny:
        # batch 2 measured ~9% faster per frame than batch 1 on v5e (better
        # MXU utilization in the dense BEV stack); override with GRAFT_BATCH
        os.environ.setdefault("GRAFT_BATCH", "2")
    import __graft_entry__ as g

    fn, (variables, pts, pv) = g.entry()

    # optional scan fusion (BENCH_SCAN>1): one dispatched call runs k model
    # steps via lax.scan. Default OFF: measured infra throughput is higher
    # with many independent in-flight calls (the tunnel scheduler pipelines
    # them; fusing into one serial scan forfeits that overlap — b=1 measured
    # 800 f/s pipelined vs ~210 in a degraded window, same graph)
    scan_len = int(os.environ.get("BENCH_SCAN", "1"))
    if scan_len > 1:
        import jax.numpy as jnp
        from jax import lax

        pts_k = jnp.broadcast_to(jnp.asarray(pts), (scan_len,) + pts.shape)
        pv_k = jnp.broadcast_to(jnp.asarray(pv), (scan_len,) + pv.shape)

        def fused(variables, pts_k, pv_k):
            def body(carry, xy):
                return carry, fn(variables, *xy)
            _, outs = lax.scan(body, 0, (pts_k, pv_k))
            return outs

        step = jax.jit(fused)
        args = (variables, pts_k, pv_k)
    else:
        step = jax.jit(fn)
        args = (variables, pts, pv)

    out = step(*args)
    jax.block_until_ready(out)  # compile + warmup

    n_iter = 5 if tiny else 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    frames = n_iter * pts.shape[0] * scan_len
    fps = frames / dt

    print(json.dumps({
        "metric": "centerpoint_waymo_inference" + ("_tiny" if tiny else ""),
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_EST_FPS, 3),
    }))


if __name__ == "__main__":
    main()
