"""Offline tracking CLI (reference tracking/tools/run_track.py surface):
load a detection result pickle, run per-sequence tracking in a process pool,
save the tracking + drop pickles."""

from __future__ import annotations

import argparse
import pickle
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools import _cpu_pin  # noqa: F401  (cpu backend pin; repo root on sys.path above)



def group_by_sequence(det_annos, class_names):
    """Flat frame dicts -> {seq: [frame dicts for the tracker]}."""
    seqs = {}
    for d in det_annos:
        seq = d.get("sequence_name", "seq0")
        labels = np.array([class_names.index(n) if n in class_names else 0
                           for n in d.get("name", [])])
        seqs.setdefault(seq, []).append({
            "boxes": np.asarray(d["boxes_lidar"])[:, :7],
            "scores": np.asarray(d["score"]),
            "labels": labels,
            "pose": d.get("pose", np.eye(4)),
            "frame_id": d.get("frame_id"),
        })
    return seqs


def _track_one(args):
    cfg, frames = args
    from detzero_tpu.models.tracking import DetZeroTracker
    return DetZeroTracker(cfg)(frames)


def main():
    from detzero_tpu.core.config import Config, cfg_from_list, cfg_from_yaml_file
    from detzero_tpu.core.logger import create_logger

    p = argparse.ArgumentParser("detzero_tpu offline tracking")
    p.add_argument("--cfg_file",
                   default="configs/tk_model_cfgs/waymo_detzero_track.yaml")
    p.add_argument("--data_path", required=True, help="detection result.pkl")
    p.add_argument("--output_dir", default="output/tracking")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--split", default="val")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                   default=None)
    args = p.parse_args()

    cfg = cfg_from_yaml_file(args.cfg_file, Config())
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(out_dir / "log_track.txt")

    with open(args.data_path, "rb") as f:
        det_annos = pickle.load(f)
    class_names = list(cfg.get("CLASS_NAMES", ["Vehicle", "Pedestrian",
                                               "Cyclist"]))
    seqs = group_by_sequence(det_annos, class_names)
    logger.info(f"{len(seqs)} sequences, {len(det_annos)} frames")

    model_cfg = cfg.get("MODEL", {})
    jobs = [(model_cfg, frames) for frames in seqs.values()]
    t0 = time.time()
    if args.workers > 1 and len(jobs) > 1:
        with ProcessPoolExecutor(args.workers) as pool:
            results = list(pool.map(_track_one, jobs))
    else:
        results = [_track_one(j) for j in jobs]
    logger.info(f"tracked in {time.time()-t0:.1f}s")

    track_data = dict(zip(seqs.keys(), results))
    stamp = time.strftime("%Y%m%d-%H%M%S")
    track_path = out_dir / f"tracking-{args.split}-{stamp}.pkl"
    drop_path = out_dir / f"drop-{args.split}-{stamp}.pkl"
    with open(track_path, "wb") as f:
        pickle.dump({k: {"tracks": v["tracks"]} for k, v in track_data.items()}, f)
    with open(drop_path, "wb") as f:
        pickle.dump({k: v["drop"] for k, v in track_data.items()}, f)
    n_tracks = sum(len(v["tracks"]) for v in track_data.values())
    logger.info(f"{n_tracks} tracks -> {track_path}")


if __name__ == "__main__":
    main()
