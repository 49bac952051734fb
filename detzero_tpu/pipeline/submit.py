"""Waymo leaderboard submission writer (reference evaluator/waymo_submit.py):
predictions -> metrics_pb2.Objects .bin keyed by context_name +
frame_timestamp_micros with uuid track ids.

Proto resolution order: waymo_open_dataset (if installed) -> the vendored
minimal protos in detzero_tpu/protos (wire-compatible field numbers from
the public schema, compiled with protoc) -> portable pickle with the
identical field layout as a last resort."""

from __future__ import annotations

import pickle
import uuid
from pathlib import Path

import numpy as np

TYPE_MAP = {"Vehicle": 1, "Pedestrian": 2, "Cyclist": 4, "Sign": 3}


def build_submission_records(frame_preds, frame_meta, tracking: bool = False):
    """frame_preds: list of {'boxes_lidar' (N,7), 'score', 'name',
    'obj_ids'(opt)}; frame_meta: list of {'context_name',
    'frame_timestamp_micros'}. Returns a list of plain-dict objects."""
    records = []
    for pred, meta in zip(frame_preds, frame_meta):
        boxes = np.asarray(pred["boxes_lidar"]).reshape(-1, 7)
        for i in range(len(boxes)):
            b = boxes[i]
            rec = {
                "context_name": meta["context_name"],
                "frame_timestamp_micros": int(meta["frame_timestamp_micros"]),
                "box": {"center_x": float(b[0]), "center_y": float(b[1]),
                        "center_z": float(b[2]), "length": float(b[3]),
                        "width": float(b[4]), "height": float(b[5]),
                        "heading": float(b[6])},
                "score": float(np.asarray(pred["score"])[i]),
                "type": TYPE_MAP.get(str(np.asarray(pred["name"])[i]), 0),
            }
            if tracking:
                ids = pred.get("obj_ids")
                rec["id"] = (str(ids[i]) if ids is not None
                             else uuid.uuid4().hex)
            records.append(rec)
    return records


def write_submission(records, out_path, account="", method="detzero_tpu",
                     tracking: bool = False):
    """Serialize to metrics_pb2.Objects .bin when the proto is available,
    else to <out>.pkl with the same content."""
    try:
        from waymo_open_dataset.protos import metrics_pb2
    except ImportError:
        try:
            from detzero_tpu.protos import waymo_metrics_pb2 as metrics_pb2
        except Exception:
            alt = Path(out_path).with_suffix(".pkl")
            with open(alt, "wb") as f:
                pickle.dump({"records": records, "account": account,
                             "method": method, "tracking": tracking}, f)
            return alt
    objs = metrics_pb2.Objects()
    for r in records:
        o = objs.objects.add()
        o.context_name = r["context_name"]
        o.frame_timestamp_micros = r["frame_timestamp_micros"]
        for k, v in r["box"].items():
            setattr(o.object.box, k, v)
        o.score = r["score"]
        o.object.type = r["type"]
        if tracking and "id" in r:
            o.object.id = r["id"]
    with open(out_path, "wb") as f:
        f.write(objs.SerializeToString())
    return Path(out_path)
