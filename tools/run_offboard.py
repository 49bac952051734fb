"""One-command offboard driver: detections -> track -> object prep ->
refine -> combine (-> eval), per sequence.

The reference has NO orchestrator — its stages talk through pickles and six
separate CLIs (SURVEY §3.5). The per-stage CLIs here mirror that surface;
this driver runs the same stages in-process via
pipeline.offboard.OffboardPipeline, writes the same artifact pickles, and
prints the per-stage StageTimer report (core/profiling).

Usage:
    python tools/run_offboard.py --det_path result.pkl \
        --points_root data/waymo/waymo_processed_data \
        [--gt_path gt.pkl] [--grm_cfg cfg.yaml --grm_ckpt dir] [...]
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _load_refine(cfg_path, ckpt_dir):
    """(model, params, sampler_kwargs) triple for OffboardPipeline.

    The third element must be sampler kwargs, NOT the whole Config —
    OffboardPipeline._sampler_kwargs also accepts a full Config now, but we
    hand it the minimal dict to keep the triple contract explicit
    (ADVICE r1 high: the full-Config splat crashed GRMSample/PRMSample)."""
    from detzero_tpu.core.checkpoint import CheckpointManager
    from detzero_tpu.core.config import Config, cfg_from_yaml_file
    from tools.train_refine import build_refine_model

    cfg = cfg_from_yaml_file(cfg_path, Config())
    model = build_refine_model(cfg)
    state, step = CheckpointManager(ckpt_dir).restore_any()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    params = {"params": state["params"],
              **({"batch_stats": state["batch_stats"]}
                 if state.get("batch_stats") else {})}
    sampler_kwargs = {
        k.lower(): int(cfg[k])
        for k in ("QUERY_NUM", "QUERY_POINTS", "MEMORY_POINTS") if k in cfg
    }
    return model, params, sampler_kwargs


def _load_points(points_root, seq, num_frames, logger):
    seq_dir = Path(points_root) / seq
    pkl = Path(points_root) / f"{seq}.pkl"
    if pkl.exists():
        with open(pkl, "rb") as f:
            blob = pickle.load(f)
        return blob["points"], blob["poses"]
    if seq_dir.exists():
        files = sorted(seq_dir.glob("*.npy"))
        pts = [np.load(fp) for fp in files]
        return pts, [np.eye(4)] * len(pts)
    logger.warning(f"no points for {seq}; object prep will see empty clouds")
    return [np.zeros((0, 4), np.float32)] * num_frames, \
        [np.eye(4)] * num_frames


def main():
    from detzero_tpu.core.logger import create_logger
    from detzero_tpu.pipeline.offboard import OffboardPipeline
    from tools.run_track import group_by_sequence

    p = argparse.ArgumentParser("offboard pipeline driver")
    p.add_argument("--det_path", required=True, help="detection result.pkl")
    p.add_argument("--points_root", required=True)
    p.add_argument("--output_dir", default="output/offboard")
    p.add_argument("--class_names", nargs="+",
                   default=["Vehicle", "Pedestrian", "Cyclist"])
    p.add_argument("--gt_path", default=None,
                   help="optional GT pickle for final-frame evaluation")
    for stage in ("grm", "prm", "crm"):
        p.add_argument(f"--{stage}_cfg", default=None)
        p.add_argument(f"--{stage}_ckpt", default=None)
    p.add_argument("--viewer_html", action="store_true",
                   help="also write an interactive <seq>.html viewer per "
                        "sequence (utils/webviewer, no dependencies)")
    args = p.parse_args()
    logger = create_logger()

    with open(args.det_path, "rb") as f:
        det_annos = pickle.load(f)
    seqs = group_by_sequence(det_annos, args.class_names)
    logger.info(f"{len(seqs)} sequences, {len(det_annos)} frames")

    stages = {}
    for stage in ("grm", "prm", "crm"):
        cfg_p = getattr(args, f"{stage}_cfg")
        ck = getattr(args, f"{stage}_ckpt")
        if cfg_p and ck:
            stages[stage] = _load_refine(cfg_p, ck)
            logger.info(f"{stage}: loaded {cfg_p} @ {ck}")

    pipe = OffboardPipeline(class_names=args.class_names, **stages)
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    final_frames = {}
    for seq, frames in seqs.items():
        pts, poses = _load_points(args.points_root, seq, len(frames), logger)
        res = pipe.run_sequence(frames, pts, poses)
        final_frames[seq] = res["frames"]
        pipe.save_artifact(res["tracks"], out_root / f"tracking_{seq}.pkl")
        pipe.save_artifact(res["objects"], out_root / f"objects_{seq}.pkl")
        if args.viewer_html:
            from detzero_tpu.utils.webviewer import export_from_offboard
            export_from_offboard(res["frames"], pts, poses=poses,
                                 class_names=tuple(args.class_names),
                                 out_path=out_root / f"{seq}.html",
                                 title=seq)
    pipe.save_artifact(final_frames, out_root / "final_frames.pkl")
    logger.info("stage timings:\n" + pipe.timer.report())
    logger.info(f"wrote {out_root / 'final_frames.pkl'}")

    if args.gt_path:
        from detzero_tpu.pipeline.evaluator import (
            evaluate_detection, format_results_table,
        )
        from tools.detzero_eval import frames_from_final

        with open(args.gt_path, "rb") as f:
            gts_raw = pickle.load(f)
        preds, keys = frames_from_final(final_frames, args.class_names)
        gts = []
        for seq, fi in keys:
            g = gts_raw[seq][fi] if isinstance(gts_raw, dict) else gts_raw[fi]
            names = np.asarray(g.get("name", []))
            gts.append({"gt_boxes": np.asarray(g.get("gt_boxes",
                                                     np.zeros((0, 7)))),
                        "name": names,
                        "num_points": np.asarray(
                            g.get("num_points", np.full(len(names), 100)))})
        res = evaluate_detection(preds, gts,
                                 class_names=tuple(args.class_names))
        logger.info("\n" + format_results_table(res))


if __name__ == "__main__":
    main()
