"""Daemon CLI: tracking pickle + per-frame points -> per-class per-sequence
refining records (reference daemon/prepare_object_data.py surface)."""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools import _cpu_pin  # noqa: F401  (cpu backend pin; repo root on sys.path above)



def main():
    from detzero_tpu.core.logger import create_logger
    from detzero_tpu.pipeline import daemon

    p = argparse.ArgumentParser("prepare per-object refining data")
    p.add_argument("--track_path", required=True, help="tracking-<split>.pkl")
    p.add_argument("--points_root", required=True,
                   help="dir with <seq>/NNNN.npy point files (or <seq>.pkl "
                        "with {'points': [...], 'poses': [...]})")
    p.add_argument("--output_dir", default="data/waymo/refining")
    p.add_argument("--class_names", nargs="+",
                   default=["Vehicle", "Pedestrian", "Cyclist"])
    p.add_argument("--enlarge", type=float, default=1.1)
    args = p.parse_args()
    logger = create_logger()

    with open(args.track_path, "rb") as f:
        tracking = pickle.load(f)
    out_root = Path(args.output_dir)
    for seq, tr in tracking.items():
        seq_dir = Path(args.points_root) / seq
        pkl = Path(args.points_root) / f"{seq}.pkl"
        if pkl.exists():
            with open(pkl, "rb") as f:
                blob = pickle.load(f)
            frame_points, poses = blob["points"], blob["poses"]
        elif seq_dir.exists():
            files = sorted(seq_dir.glob("*.npy"))
            frame_points = [np.load(fp) for fp in files]
            poses = [np.eye(4)] * len(frame_points)
        else:
            logger.warning(f"no points for {seq}, skipping")
            continue
        recs = daemon.prepare_object_data(tr, frame_points, poses,
                                          enlarge=args.enlarge)
        # split per class
        by_cls = {}
        for oid, rec in recs.items():
            label = rec.get("label", 0)
            cls = (args.class_names[int(label)]
                   if not isinstance(label, str) else label)
            by_cls.setdefault(cls, {})[oid] = rec
        for cls, d in by_cls.items():
            out = out_root / cls / f"{seq}.pkl"
            out.parent.mkdir(parents=True, exist_ok=True)
            with open(out, "wb") as f:
                pickle.dump(d, f)
            logger.info(f"{seq} {cls}: {len(d)} objects -> {out}")


if __name__ == "__main__":
    main()
