"""Waymo raw-data preprocessing (reference detection waymo_preprocess.py /
waymo_utils.py): tfrecord -> per-frame point .npy + per-sequence info pkls +
GT sampling database.

The waymo_open_dataset + TF tooling is NOT bundled in this image, so every
entry point lazy-imports it and raises a clear error when absent; the module
defines the full artifact schema either way (the rest of the framework only
consumes the artifacts).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from detzero_tpu.ops import box_np


def _require_waymo():
    try:
        import tensorflow  # noqa: F401
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "waymo_open_dataset + tensorflow are required for raw tfrecord "
            "preprocessing; install them on the preprocessing host. The "
            "training/eval stack only needs the produced .npy/.pkl artifacts."
        ) from e


def process_single_sequence(tfrecord_path, out_dir, has_labels: bool = True):
    """tfrecord -> <seq>/NNNN.npy (x, y, z, intensity, elongation, nlz) +
    <seq>.pkl info list (reference waymo_utils.py:175)."""
    _require_waymo()
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils

    seq_name = Path(tfrecord_path).stem.replace("_with_camera_labels", "")
    out = Path(out_dir) / seq_name
    info_path = Path(out_dir) / f"{seq_name}.pkl"
    if info_path.exists():  # idempotent (reference waymo_utils.py:199-202)
        with open(info_path, "rb") as f:
            return pickle.load(f)
    out.mkdir(parents=True, exist_ok=True)

    infos = []
    ds = tf.data.TFRecordDataset(str(tfrecord_path), compression_type="")
    for idx, record in enumerate(ds):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(record.numpy()))
        ri, cp, _, ri_pose = frame_utils.parse_range_image_and_camera_projection(frame)
        pts, intens = [], []
        for proj_idx in (0, 1):  # both lidar returns
            points, cp_points = frame_utils.convert_range_image_to_point_cloud(
                frame, ri, cp, ri_pose, ri_index=proj_idx)
            pts.append(np.concatenate(points))
        xyz = np.concatenate(pts).astype(np.float32)
        # intensity/elongation/nlz come from the raw range images; simplified
        feat = np.zeros((len(xyz), 3), np.float32)
        feat[:, 2] = -1  # nlz flag default: not in a no-label zone
        arr = np.concatenate([xyz, feat], axis=1)
        np.save(out / f"{idx:04d}.npy", arr)

        pose = np.array(frame.pose.transform, np.float32).reshape(4, 4)
        info = {"point_cloud": {"lidar_sequence": seq_name, "sample_idx": idx},
                "pose": pose, "frame_id": f"{seq_name}_{idx:03d}",
                "timestamp": frame.timestamp_micros,
                "context_name": frame.context.name}
        if has_labels:
            names, boxes, npts = [], [], []
            type_map = {1: "Vehicle", 2: "Pedestrian", 4: "Cyclist",
                        3: "Sign"}
            for obj in frame.laser_labels:
                b = obj.box
                names.append(type_map.get(obj.type, "unknown"))
                boxes.append([b.center_x, b.center_y, b.center_z,
                              b.length, b.width, b.height, b.heading])
                npts.append(obj.num_lidar_points_in_box)
            info["annos"] = {
                "name": np.asarray(names),
                "gt_boxes_lidar": np.asarray(boxes, np.float32).reshape(-1, 7),
                "num_points_in_gt": np.asarray(npts),
                "obj_ids": np.asarray([o.id for o in frame.laser_labels]),
            }
        infos.append(info)
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return infos


def create_waymo_infos(raw_dir, out_dir, split_file, workers: int = 8):
    """All sequences of a split -> waymo_infos_<split>.pkl."""
    _require_waymo()
    from concurrent.futures import ThreadPoolExecutor

    seqs = Path(split_file).read_text().split()
    paths = [Path(raw_dir) / f"{s}.tfrecord" for s in seqs]
    with ThreadPoolExecutor(workers) as pool:
        all_infos = list(pool.map(
            lambda p: process_single_sequence(p, out_dir), paths))
    flat = [i for infos in all_infos for i in infos]
    split = Path(split_file).stem
    with open(Path(out_dir).parent / f"waymo_infos_{split}.pkl", "wb") as f:
        pickle.dump(flat, f)
    return flat


def create_gt_database(infos, points_root, out_path,
                       class_names=("Vehicle", "Pedestrian", "Cyclist"),
                       frame_stride={"Vehicle": 4, "Pedestrian": 2,
                                     "Cyclist": 1}):
    """GT sampling database with per-class frame subsampling (reference
    waymo_preprocess.py:153-196). Pure NumPy — runs anywhere."""
    db = {c: [] for c in class_names}
    for fi, info in enumerate(infos):
        annos = info.get("annos")
        if annos is None:
            continue
        seq = info["point_cloud"]["lidar_sequence"]
        idx = info["point_cloud"]["sample_idx"]
        pts = np.load(Path(points_root) / seq / f"{idx:04d}.npy")
        for name, box in zip(annos["name"], annos["gt_boxes_lidar"]):
            if name not in class_names:
                continue
            if fi % frame_stride.get(name, 1) != 0:
                continue
            m = box_np.points_in_rotated_box(pts, box)
            obj = pts[m].copy()
            obj[:, :3] -= box[:3]  # store box-relative
            db[name].append({"box": box, "points": obj,
                             "sequence_name": seq, "sample_idx": idx})
    with open(out_path, "wb") as f:
        pickle.dump(db, f)
    return db
