"""Offboard auto-labeling pipeline driver.

The reference has NO orchestrator — stages talk through pickles on disk
(SURVEY §3.5). We keep the same stage boundaries and artifact schemas but add
a driver that runs them in order for a set of sequences:

  1. detection (CenterPoint [+TTA/WBF]) -> frame detections
  2. offline tracking (fwd+reverse)     -> object tracks + drop data
  3. daemon: per-object point cropping  -> refining records
  4. GRM / PRM / CRM refinement         -> sizes / centers+headings / scores
  5. combine (+drop re-merge)           -> final frame boxes
  6. evaluation (native Waymo-protocol metrics)

Every stage is also callable on its own with pickled inputs, matching the
reference's workflow (each stage's to_pickle/from_pickle is the artifact
schema contract).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from detzero_tpu.data import refine_features as rf
from detzero_tpu.models.refining import (
    crm_decode, grm_decode, prm_decode,
)
from detzero_tpu.models.refining.target_assign import DEFAULT_SIZE_ANCHORS
from detzero_tpu.models.tracking import DetZeroTracker
from detzero_tpu.pipeline import daemon
from detzero_tpu.pipeline.evaluator import evaluate_detection


class OffboardPipeline:
    """Run stages 2-6 given per-frame detections (stage 1 runs separately on
    TPU; this driver is the host-side orchestration)."""

    def __init__(self, track_cfg=None, class_names=("Vehicle", "Pedestrian",
                                                    "Cyclist"),
                 grm=None, prm=None, crm=None, size_anchors=None):
        """grm/prm/crm: optional (model, params, sampler_cfg) triples; stages
        without a model pass boxes through unchanged."""
        from detzero_tpu.core.profiling import StageTimer

        self.tracker = DetZeroTracker(track_cfg or {})
        self.timer = StageTimer()  # per-stage wall clock (SURVEY §5 tracing)
        self.class_names = list(class_names)
        self.grm = grm
        self.prm = prm
        self.crm = crm
        self.size_anchors = size_anchors or DEFAULT_SIZE_ANCHORS

    # ------------------------------------------------------------------
    def track(self, det_frames):
        """det_frames: list of {'boxes' (N,7 lidar), 'scores', 'labels',
        'pose'} -> tracker output (object tracks + drop)."""
        return self.tracker(det_frames)

    def prepare_objects(self, track_result, frame_points, poses, **kw):
        return daemon.prepare_object_data(track_result, frame_points, poses, **kw)

    # ------------------------------------------------------------------
    def refine(self, obj_records, rng=None):
        """Run whichever of GRM/PRM/CRM are configured over all objects.
        Returns (grm_sizes, prm_centers, prm_headings, crm_scores) dicts."""
        import jax

        rng = rng or np.random.RandomState(0)
        grm_sizes, prm_centers, prm_headings, crm_scores = {}, {}, {}, {}
        for oid, rec in obj_records.items():
            label = rec.get("label", 0)
            cls = (self.class_names[int(label)]
                   if not isinstance(label, str) else label)
            anchors = np.asarray(self.size_anchors.get(
                cls, self.size_anchors[self.class_names[0]]))
            if self.grm is not None:
                model, params, cfg = self.grm
                s = rf.GRMSample(rng=rng, **(cfg or {}))(rec)
                pred = model.apply(params, s["query_pts"], s["query_sizes"],
                                   s["memory_pts"], s["memory_mask"])
                grm_sizes[oid] = np.asarray(grm_decode(pred, anchors))
            if self.prm is not None or self.crm is not None:
                cfg = (self.prm or self.crm)[2]
                s = rf.PRMSample(training=False, rng=rng, **(cfg or {}))(rec)
            if self.prm is not None:
                model, params, _ = self.prm
                pred = model.apply(params, s["query_pts"], s["query_boxes"],
                                   s["memory_pts"], s["pad_mask"])
                c_loc, h_loc = prm_decode(pred)
                t = int(s["pad_mask"].sum())
                c, h = rf.revert_prm_to_world(
                    np.asarray(c_loc)[:t], np.asarray(h_loc)[:t], s["init_box"])
                prm_centers[oid] = c
                prm_headings[oid] = h
            if self.crm is not None:
                model, params, _ = self.crm
                pred = model.apply(params, s["query_pts"], s["pad_mask"])
                t = int(s["pad_mask"].sum())
                crm_scores[oid] = np.asarray(crm_decode(pred))[:t]
        return grm_sizes, prm_centers, prm_headings, crm_scores

    # ------------------------------------------------------------------
    def run_sequence(self, det_frames, frame_points, poses, gt_boxes=None,
                     gt_ids=None):
        """Full stages 2-5 for one sequence. Returns final frame-level boxes
        (global frame) + intermediate artifacts."""
        with self.timer("track"):
            tr = self.track(det_frames)
        with self.timer("prepare_objects"):
            objs = self.prepare_objects(tr, frame_points, poses,
                                        gt_boxes=gt_boxes, gt_ids=gt_ids)
        with self.timer("refine"):
            grm_sizes, prm_centers, prm_headings, crm_scores = self.refine(objs)
        with self.timer("combine"):
            frames = daemon.combine_output(
                objs,
                grm_sizes=grm_sizes or None,
                prm_centers=prm_centers or None,
                prm_headings=prm_headings or None,
                crm_scores=crm_scores or None,
                drop_data=tr["drop"], num_frames=len(det_frames),
            )
        return {"frames": frames, "tracks": tr, "objects": objs,
                "timings": self.timer.as_dict()}

    # ------------------------------------------------------------------
    @staticmethod
    def save_artifact(obj, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    @staticmethod
    def load_artifact(path):
        with open(path, "rb") as f:
            return pickle.load(f)
