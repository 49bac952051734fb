"""Benchmark: flagship CenterPoint inference at Waymo scale, frames/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Methodology (VERDICT r1 #2 — the number must be device throughput, not infra
overlap): the PRIMARY value comes from ONE dispatched executable that runs
BENCH_SCAN model steps serially via lax.scan. Scan iterations execute
sequentially on the chip by construction, so the remote scheduler cannot
overlap them across infra — wall time / frames is a true per-chip rate. The
independent-dispatch rate (which the tunnel's scheduler can pipeline; round-1
measured up to 1088 f/s for a ~330 GFLOP/frame graph, >peak) is reported
separately as "pipelined_fps", never as the headline.

Sanity: mfu = flops_per_frame * fps / device_peak_flops must be <= 1.0 or the
bench refuses to print (hard assert).

vs_baseline: the reference publishes no throughput (SURVEY §6); we use an
estimated 20 frames/sec for single-model (no-TTA) CenterPoint-Res inference on
one A100 as the denominator (typical OpenPCDet-class numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

A100_EST_FPS = 20.0
FALLBACK_FLOPS_PER_FRAME = 330e9  # analytic estimate (CLAUDE.md), used when
# XLA cost analysis is unavailable on the backend

# bf16 peak FLOP/s per chip by TPU generation (public spec sheets)
PEAK_FLOPS = {
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v5p": 459e12, "v4": 275e12, "v6e": 918e12, "trillium": 918e12,
    "cpu": 1e12,  # loose upper bound for the tiny CPU path
}


def _device_peak(dev) -> float:
    kind = getattr(dev, "device_kind", "") or dev.platform
    kind = kind.lower()
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12 if dev.platform == "tpu" else 1e12


def _flops_cpu(fn, *args):
    """FLOP count of ONE call of `fn`, from a CPU-backend compile.

    Two traps this avoids (measured on the axon tunnel):
      * cost_analysis on a lax.scan graph counts the body ONCE regardless
        of trip count — so analyze the single-step fn, not the scan;
      * executables from .lower().compile() on the axon backend do NOT
        synchronize under block_until_ready (timing through them measured
        5674 f/s — pure dispatch), and compiling a second TPU executable
        just for cost_analysis costs ~23 min of remote-compile. FLOPs are
        platform-independent, and the cpu backend is always registered
        alongside axon, so a seconds-cheap CPU compile gives the count.

    The Mosaic (pallas) kernels cannot lower for the cpu backend, so the
    trace is forced onto the XLA reference conv path (DETZERO_FORCE_PALLAS=0,
    honored at trace time by ops/pallas_pillar.resolve_use_pallas) — same
    algorithmic FLOPs, cpu-lowerable. Without this the r3 headline silently
    fell back to the analytic estimate."""
    import jax

    prev = os.environ.get("DETZERO_FORCE_PALLAS")
    os.environ["DETZERO_FORCE_PALLAS"] = "0"
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            cpu_args = jax.tree.map(
                lambda a: jax.device_put(a, cpu)
                if hasattr(a, "shape") else a, args)
            cost = jax.jit(fn).lower(*cpu_args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        import sys
        import traceback
        print("_flops_cpu failed:", file=sys.stderr)
        traceback.print_exc()
        return None
    finally:
        if prev is None:
            os.environ.pop("DETZERO_FORCE_PALLAS", None)
        else:
            os.environ["DETZERO_FORCE_PALLAS"] = prev


def bench_train(tiny: bool):
    """BENCH_TRAIN=1: device time of the full training step (fwd + loss +
    grad + adamw update) on random data, serial-scan methodology. Records
    the train-side perf story (VERDICT r1 #10/weak 8): ms/step, GFLOP/step
    (XLA cost analysis) and MFU. Prints one JSON line."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    import __graft_entry__ as g

    model, n_points = g._build_model(tiny)
    b = int(os.environ.get("GRAFT_BATCH", "1"))
    rng = np.random.RandomState(0)
    pts = rng.uniform(-70, 70, (b, n_points, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1.5, 3.5, (b, n_points))
    pv = np.ones((b, n_points), bool)
    m = 32 if tiny else 500
    gb = np.zeros((b, m, 9 if model.cfg.get("WITH_VELOCITY", True) else 7),
                  np.float32)
    gb[:, 0, :7] = [1, 1, 0, 4.4, 2, 1.6, 0.3]
    gc = np.zeros((b, m), np.int32)
    gv = np.zeros((b, m), bool)
    gv[:, 0] = True

    n_init = min(n_points, 4096)
    variables = model.init(jax.random.PRNGKey(0), pts[:, :n_init],
                           pv[:, :n_init])
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    def train_step(data, carry, _):
        params, stats, opt_state = carry
        pts, pv, gb, gc, gv = data

        def lfn(p):
            loss, (aux, updates) = model.loss(
                {"params": p, "batch_stats": stats}, pts, pv, gb, gc, gv)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(lfn, has_aux=True)(params)
        upd, opt2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, upd),
                updates.get("batch_stats", stats), opt2), loss

    k = int(os.environ.get("BENCH_SCAN", "2" if tiny else "8"))

    # the batch rides as a jit ARG (not a closure constant): XLA constant-
    # folds the whole voxelize/plan chain of a literal point cloud at
    # compile time, which would silently drop the table build from the
    # measured step (observed: minutes-long folding of the 4.8M-row feats
    # scatter during compilation)
    def fused(params, stats, opt_state, data):
        carry, losses = lax.scan(partial(train_step, data),
                                 (params, stats, opt_state),
                                 None, length=k)
        return carry, losses

    data = (pts, pv, gb, gc, gv)
    step = jax.jit(fused, donate_argnums=(0, 2))
    single = _flops_cpu(
        lambda p, s, o, d: train_step(d, (p, s, o), None)[0],
        params, stats, opt_state, data)
    flops = single / b if single else None
    pallas_failed = False
    try:
        carry, losses = step(params, stats, opt_state, data)
        float(losses.sum())  # scalar fetch: block_until_ready lies on axon
    except Exception as e:  # noqa: BLE001 — same containment as main()
        import sys
        print(f"bench_train: pallas path FAILED ({type(e).__name__}): "
              f"{str(e)[:500]}\n-> retrying on the XLA reference path",
              file=sys.stderr, flush=True)
        pallas_failed = True
        os.environ["DETZERO_FORCE_PALLAS"] = "0"
        step = jax.jit(fused, donate_argnums=(0, 2))
        carry, losses = step(params, stats, opt_state, data)
        float(losses.sum())
    params, stats, opt_state = carry
    n_iter = 2 if tiny else 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        carry, losses = step(*carry, data)
        float(losses.sum())
    dt = time.perf_counter() - t0
    ms_per_step = dt / (n_iter * k) * 1e3
    dev = jax.devices()[0]
    peak = _device_peak(dev)
    rec = {
        "metric": "centerpoint_train_step" + ("_tiny" if tiny else ""),
        "value": round(ms_per_step, 3), "unit": "ms/step/chip",
        "batch": b, "scan": k,
        "device": getattr(dev, "device_kind", dev.platform),
    }
    if flops:
        rec["flops_per_step"] = round(flops)
        rec["mfu"] = round(flops / (ms_per_step / 1e3) / peak, 4)
    if pallas_failed:
        rec["pallas_failed"] = True
    print(json.dumps(rec))


def _probe_backend(timeout_s: float = 90.0) -> bool:
    """The axon tunnel can die mid-session (r3: the relay process exited
    and every subsequent backend init BLOCKED FOREVER on a tcp recv).  A
    bench that hangs eats the driver's whole wall budget (the r2 failure
    mode), so probe device init in a SUBPROCESS with a hard timeout and
    fail fast + loud instead."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    import sys

    import jax

    if os.environ.get("BENCH_TINY", "0") != "1" \
            and os.environ.get("BENCH_SKIP_PROBE", "0") != "1":
        if not _probe_backend():
            print("bench: TPU backend unreachable (tunnel down?) — "
                  "failing fast instead of hanging; re-run when the "
                  "axon relay is back (ps aux | grep tpu_init)",
                  file=sys.stderr, flush=True)
            raise SystemExit(3)
    # persistent compilation cache: the full-scale model + fused NMS compile
    # takes minutes via the remote-compile service; cache hits are seconds
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    # wall budget (VERDICT r2 weak #1: the r2 driver bench timed out with no
    # number). The headline serial-scan JSON prints FIRST; every optional
    # extra (pipelined rate, stage table) runs only with budget left over.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))

    def left():
        return budget_s - (time.perf_counter() - t_start)

    if os.environ.get("BENCH_TINY", "0") == "1":
        # force CPU BEFORE touching jax.devices(): the image's sitecustomize
        # pins the axon TPU backend, and a second TPU process would block on
        # the tunnel (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    tiny = os.environ.get("BENCH_TINY", "0") == "1" or jax.devices()[0].platform == "cpu"
    os.environ["GRAFT_TINY"] = "1" if tiny else "0"
    if os.environ.get("BENCH_TRAIN", "0") == "1":
        bench_train(tiny)
        return
    import jax.numpy as jnp
    from jax import lax

    import __graft_entry__ as g

    fn, (variables, pts, pv) = g.entry()
    batch = pts.shape[0]
    dev = jax.devices()[0]

    # FLOP count: a seconds-cheap CPU compile of the XLA REFERENCE conv path
    # (the Mosaic kernels cannot lower for cpu; DETZERO_FORCE_PALLAS=0 inside
    # _flops_cpu). That graph materializes the 9-offset gathers, so its count
    # (~3 TFLOP/frame) is implementation FLOPs, not useful work — reporting
    # mfu against it would INFLATE the number ~9x. mfu stays on the
    # conservative algorithmic estimate (27-tap sparse conv + dense BEV
    # stack, hand-derived: CLAUDE.md r2); the measured XLA count is printed
    # alongside as a crosscheck so the source is never a silent fallback.
    single_flops = _flops_cpu(fn, variables, pts, pv)
    flops_per_frame = FALLBACK_FLOPS_PER_FRAME
    if single_flops:
        flops_xla = single_flops / batch
        flops_src = "analytic(mfu)+xla_cost_analysis_cpu(crosscheck)"
    else:
        flops_xla = None
        flops_src = "analytic_estimate(xla_cpu_count_failed)"
    if tiny:
        # the analytic estimate is Waymo-scale; the tiny model is ~200x
        # smaller — use the measured XLA count (conservative: it counts the
        # materialized gathers too) so the mfu<=1 guard stays meaningful
        flops_per_frame = flops_xla or FALLBACK_FLOPS_PER_FRAME / 200
        flops_src = "xla_cost_analysis_cpu(tiny)" if flops_xla else \
            "analytic_estimate/200(tiny)"

    # ---- primary: serial scan (device throughput; overlap-proof) ----------
    # scan >= 16 at full scale: the per-CALL tunnel overhead (~40 ms) divided
    # by the scan length biases short scans (+10 ms/iter at scan 4 — the r3
    # headline carried that; COMPONENTS.md scan-floor calibration)
    scan_len = int(os.environ.get("BENCH_SCAN", "2" if tiny else "16"))
    pts_k = jnp.broadcast_to(jnp.asarray(pts), (scan_len,) + pts.shape)
    pv_k = jnp.broadcast_to(jnp.asarray(pv), (scan_len,) + pv.shape)

    def fused(variables, pts_k, pv_k):
        def body(carry, xy):
            out = fn(variables, *xy)
            # fold a scalar of the output into the carry so no iteration can
            # be dead-code-eliminated or reordered
            score_sum = jax.tree.leaves(out)[0].sum().astype(jnp.float32)
            return carry + score_sum, out
        s, outs = lax.scan(body, jnp.float32(0), (pts_k, pv_k))
        return s, outs

    args = (variables, pts_k, pv_k)
    # SYNC VIA SCALAR FETCH, not block_until_ready: on the axon backend
    # block_until_ready returns at dispatch-accept, not compute-complete
    # (measured 183 PFLOP/s "throughput" through it); float() of the fused
    # carry scalar forces a device->host copy that cannot complete early.
    step = jax.jit(fused)
    t_w0 = time.perf_counter()
    pallas_failed = False
    try:
        out = step(*args)
        float(out[0])  # compile + warmup execution (carry scalar fetch)
    except Exception as e:  # noqa: BLE001 — containment, not control flow
        # Failure containment (VERDICT r4 weak #2): one kernel's Mosaic
        # compile error must NOT turn the round's headline into rc=1.
        # resolve_use_pallas reads DETZERO_FORCE_PALLAS at trace time, so a
        # fresh jit wrapper re-traces onto the XLA reference conv path —
        # slower, but a green degraded number with the failure flagged.
        print(f"bench: pallas path FAILED ({type(e).__name__}): "
              f"{str(e)[:500]}\n-> retrying on the XLA reference path "
              f"(DETZERO_FORCE_PALLAS=0)", file=sys.stderr, flush=True)
        pallas_failed = True
        os.environ["DETZERO_FORCE_PALLAS"] = "0"
        step = jax.jit(fused)
        out = step(*args)
        float(out[0])
    warm_s = time.perf_counter() - t_w0

    # adapt iteration count to the remaining wall budget (one warm call costs
    # at most warm_s; keep a 2x safety margin)
    n_iter = 2 if tiny else 3
    while n_iter > 1 and n_iter * warm_s * 2 > max(left(), 1):
        n_iter -= 1
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(*args)
        float(out[0])  # serialize calls: no dispatch pipelining
    dt = time.perf_counter() - t0
    fps = n_iter * batch * scan_len / dt

    peak = _device_peak(dev)
    mfu = flops_per_frame * fps / peak
    assert mfu <= 1.0, (
        f"measured {fps:.1f} f/s x {flops_per_frame/1e9:.1f} GFLOP/frame = "
        f"{mfu:.2f} MFU > 1.0 on {dev.device_kind}: measurement is not device "
        f"throughput — refusing to report")

    rec = {
        "metric": "centerpoint_waymo_inference" + ("_tiny" if tiny else ""),
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_EST_FPS, 3),
        "mfu": round(mfu, 4),
        "flops_per_frame": round(flops_per_frame),
        "flops_source": flops_src,
        "device": getattr(dev, "device_kind", dev.platform),
        "methodology": f"serial lax.scan x{scan_len}, batch {batch}, "
                       f"{n_iter} synchronous calls",
    }
    if flops_xla:
        rec["flops_xla_cpu_reference"] = round(flops_xla)
    if pallas_failed:
        rec["pallas_failed"] = True
    print(json.dumps(rec), flush=True)

    # ---- optional extras (stderr only; never delay the headline) ----------
    if os.environ.get("BENCH_PIPELINED", "0") == "1" and left() > 120:
        # pipelined independent dispatches: an infra overlap rate, NOT device
        # throughput (r1 reported 1088 f/s this way on a ~330 GFLOP graph)
        single = jax.jit(fn)
        sargs = (variables, jnp.asarray(pts), jnp.asarray(pv))
        float(jax.tree.leaves(single(*sargs))[0].sum())
        n_pipe = 4 if tiny else 8
        t0 = time.perf_counter()
        outs = [single(*sargs) for _ in range(n_pipe)]
        for o in outs:  # fetch after ALL are issued: overlap preserved
            float(jax.tree.leaves(o)[0].sum())
        pipelined_fps = n_pipe * batch / (time.perf_counter() - t0)
        print(json.dumps({"stage": "pipelined_fps",
                          "value": round(pipelined_fps, 3)}),
              file=sys.stderr, flush=True)

    if os.environ.get("BENCH_STAGES", "0") == "1" and left() > 120:
        import __graft_entry__ as _g

        model, _ = _g._build_model(tiny)

        def _backbone_head(v, p, m):
            # backbone+head with the plan built in-graph but marked as a
            # separate stage; voxelize_plan isolates the table build, so
            # forward - (voxelize_plan + this) ~= graph-fusion overhead
            table, plan = model._tables(p, m)
            feats = table["feats" if model.backend.startswith("pillar")
                          else "voxel_features"]
            return model.eval_net.apply(
                v, feats, plan,
                method=model._vmapped_call())[1]["spatial_features"]

        stages = {
            "voxelize_plan": lambda v, p, m: model._tables(p, m),
            "backbone_head": _backbone_head,
            "forward": lambda v, p, m: model.apply(
                v, p, m, train=False, mutable_stats=False),
            "full_predict": lambda v, p, m: fn(v, p, m),
        }
        for name, stage_fn in stages.items():
            if left() < 120:
                break
            pk = jnp.broadcast_to(jnp.asarray(pts), (4,) + pts.shape)
            vk = jnp.broadcast_to(jnp.asarray(pv), (4,) + pv.shape)

            def fused_stage(variables, pk, vk, stage_fn=stage_fn):
                def body(c, xy):
                    out = stage_fn(variables, *xy)
                    return c + jax.tree.leaves(out)[0].sum().astype(
                        jnp.float32), 0
                s, _ = lax.scan(body, jnp.float32(0), (pk, vk))
                return s

            sstep = jax.jit(fused_stage)
            float(sstep(variables, pk, vk))  # scalar carry fetch
            t0 = time.perf_counter()
            for _ in range(3):
                float(sstep(variables, pk, vk))
            dt = time.perf_counter() - t0
            print(json.dumps({
                "stage": name,
                "ms_per_frame": round(dt / (3 * 4 * batch) * 1e3, 3),
            }), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
