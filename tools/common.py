"""Shared CLI plumbing (reference train.py:23 parse_config pattern):
--cfg_file + --set dotted overrides + experiment dir derivation."""

from __future__ import annotations

import argparse
import datetime
import shutil
from pathlib import Path

from detzero_tpu.core.config import Config, cfg_from_list, cfg_from_yaml_file
from detzero_tpu.core.logger import create_logger


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cfg_file", required=True, help="model config yaml")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of a few train steps "
                        "into this dir (TensorBoard XPlane)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a jax platform (the image's sitecustomize "
                        "pins 'axon'; pass cpu for data-free smoke runs)")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                   default=None, help="dotted-path config overrides")
    return p


def apply_platform(args):
    import jax

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    # persistent compilation cache: full-model TPU compiles go through a
    # slow remote-compile service (~minutes); restarts/auto-resume must not
    # pay it again (bench.py uses the same cache dir)
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def load_config(args) -> Config:
    cfg = cfg_from_yaml_file(args.cfg_file, Config())
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    if args.batch_size is not None:
        cfg.setdefault("OPTIMIZATION", Config())
        cfg["OPTIMIZATION"]["BATCH_SIZE_PER_DEVICE"] = args.batch_size
    if args.epochs is not None:
        cfg["OPTIMIZATION"]["NUM_EPOCHS"] = args.epochs
    return cfg


def setup_experiment(args, cfg, phase: str):
    """Experiment dir <output>/<cfg-stem>/<extra_tag>/ with cfg copy + logger
    (reference train.py:87,105-106)."""
    exp_dir = Path(args.output_dir) / Path(args.cfg_file).stem / args.extra_tag
    exp_dir.mkdir(parents=True, exist_ok=True)
    try:
        shutil.copy(args.cfg_file, exp_dir / Path(args.cfg_file).name)
    except shutil.SameFileError:
        pass
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    logger = create_logger(exp_dir / f"log_{phase}_{stamp}.txt")
    return exp_dir, logger


def build_detection_dataset(cfg, training: bool, logger=None):
    from detzero_tpu.core.registry import DATASETS
    import detzero_tpu.data.waymo_dataset  # noqa: F401 (registers datasets)

    name = cfg.get("DATASET", "WaymoDetectionDataset")
    return DATASETS.get(name)(cfg, cfg.get("CLASS_NAMES",
                                           ["Vehicle", "Pedestrian", "Cyclist"]),
                              training=training, logger=logger)


def build_detector(cfg, dtype=None):
    import jax.numpy as jnp
    from detzero_tpu.models.detection.centerpoint import CenterPoint

    m = cfg["MODEL"]
    pc_range = cfg["POINT_CLOUD_RANGE"]
    voxel_size = None
    for proc in cfg.get("DATA_PROCESSOR", []):
        if "VOXEL_SIZE" in proc:
            voxel_size = proc["VOXEL_SIZE"]
    assert voxel_size is not None, "DATA_PROCESSOR must define VOXEL_SIZE"
    return CenterPoint(
        m, len(cfg.get("CLASS_NAMES", [1, 2, 3])),
        pc_range=pc_range, voxel_size=voxel_size,
        max_voxels=int(m.get("MAX_VOXELS", 150_000)),
        max_points=int(cfg.get("NUM_POINT_BUDGET", 200_000)),
        max_objs=int(cfg.get("MAX_OBJS", 500)),
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )
