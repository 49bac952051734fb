"""Waymo preprocessing CLI (reference waymo_preprocess.py surface):
tfrecords -> per-frame npy + info pkls + GT sampling database.

The tfrecord stage requires waymo_open_dataset/TF (gated with a clear error);
the GT-database stage is pure NumPy and runs anywhere the npy artifacts exist.
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    # pure-CPU data tool: pin the cpu backend BEFORE any detzero import —
    # the image's sitecustomize otherwise initializes the remote TPU
    # backend on the first jax.numpy import (CLAUDE.md)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from detzero_tpu.core.logger import create_logger
    from detzero_tpu.data import waymo_preprocess as wp

    p = argparse.ArgumentParser("waymo preprocessing")
    p.add_argument("--stage", choices=["infos", "gt_database"], required=True)
    p.add_argument("--raw_dir", default="data/waymo/raw_data")
    p.add_argument("--out_dir", default="data/waymo/waymo_processed_data")
    p.add_argument("--split_file", default="data/waymo/ImageSets/train.txt")
    p.add_argument("--infos_path", default="data/waymo/waymo_infos_train.pkl")
    p.add_argument("--db_out", default="data/waymo/waymo_dbinfos_train.pkl")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()
    logger = create_logger()

    if args.stage == "infos":
        infos = wp.create_waymo_infos(args.raw_dir, args.out_dir,
                                      args.split_file, args.workers)
        logger.info(f"wrote {len(infos)} frame infos")
    else:
        with open(args.infos_path, "rb") as f:
            infos = pickle.load(f)
        db = wp.create_gt_database(infos, args.out_dir, args.db_out)
        logger.info("gt database: " + ", ".join(
            f"{k}:{len(v)}" for k, v in db.items()))


if __name__ == "__main__":
    main()
