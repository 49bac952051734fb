"""Track post-processing queue.

Re-derives the reference PostProcessor (post_process.py:10): delete/trim weak
tracks, recompute early-frame velocities by finite difference, classify
static vs dynamic motion from the track's own box overlaps, and pin static
objects' predicted-only tail boxes to the best observed box.
"""

from __future__ import annotations

import numpy as np

from detzero_tpu.ops import box_np


class PostProcessor:
    def __init__(self, cfg=None):
        cfg = cfg or {}
        self.least_age = int(cfg.get("LEAST_AGE", 5))
        self.static_thresh = float(cfg.get("STATIC_OVERLAP_THRESH", 0.5))
        self.size_update = cfg.get("BOX_SIZE_UPDATE", None)  # off by default

    def __call__(self, tracks):
        out = []
        for t in tracks:
            if not t.alive or t.num_hits < self.least_age:
                continue
            self._trim(t)
            if not t.frames:
                continue
            self._velocity_optimize(t)
            state = self._motion_classify(t)
            t.state = state
            if state == "static":
                self._static_drift_eliminate(t)
            if self.size_update:
                self._box_size_update(t)
            out.append(t)
        return out

    @staticmethod
    def _trim(t):
        """Drop predicted-only (no-hit) head and tail entries."""
        hits = np.asarray(t.hits, bool)
        if not hits.any():
            t.frames, t.boxes, t.scores, t.hits = [], [], [], []
            return
        lo = int(np.argmax(hits))
        hi = len(hits) - int(np.argmax(hits[::-1]))
        t.frames = t.frames[lo:hi]
        t.boxes = t.boxes[lo:hi]
        t.scores = t.scores[lo:hi]
        t.hits = t.hits[lo:hi]

    @staticmethod
    def _velocity_optimize(t, dt: float = 0.1):
        """Finite-difference velocities along the track (stored per box)."""
        centers = np.stack([b[:2] for b in t.boxes])
        if len(centers) == 1:
            t.velocities = np.zeros((1, 2))
            return
        v = np.gradient(centers, axis=0) / dt
        t.velocities = v

    def _motion_classify(self, t):
        """Static if the first and last observed boxes still overlap in BEV."""
        hits = np.where(np.asarray(t.hits, bool))[0]
        first, last = t.boxes[hits[0]], t.boxes[hits[-1]]
        ov = box_np.rotated_overlap_bev(
            box_np.boxes3d_to_bev(np.asarray([first]))[0],
            box_np.boxes3d_to_bev(np.asarray([last]))[0],
        )
        area = min(first[3] * first[4], last[3] * last[4])
        return "static" if area > 0 and ov / area > self.static_thresh else "dynamic"

    @staticmethod
    def _static_drift_eliminate(t):
        """For static objects: overwrite predicted-only boxes with the
        best-scoring observed box (kills KF drift on parked vehicles)."""
        hits = np.asarray(t.hits, bool)
        scores = np.asarray(t.scores)
        best = int(np.argmax(np.where(hits, scores, -np.inf)))
        best_box = t.boxes[best]
        for i in range(len(t.boxes)):
            if not hits[i]:
                t.boxes[i] = best_box.copy()

    def _box_size_update(self, t):
        """Unify box sizes along the track (max-score / weighted / largest)."""
        mode = self.size_update
        hits = np.asarray(t.hits, bool)
        sizes = np.stack([b[3:6] for b in t.boxes])[hits]
        scores = np.asarray(t.scores)[hits]
        if mode == "max_score":
            size = sizes[int(np.argmax(scores))]
        elif mode == "weighted":
            w = scores / max(scores.sum(), 1e-6)
            size = (sizes * w[:, None]).sum(0)
        elif mode == "largest":
            size = sizes.max(0)
        else:
            return
        for b in t.boxes:
            b[3:6] = size
