"""Track post-processing queue.

Re-derives the reference PostProcessor (post_process.py:10): delete/trim weak
tracks, recompute early-frame velocities by finite difference, classify
static vs dynamic motion from the track's own box overlaps, and pin static
objects' predicted-only tail boxes to the best observed box.

Reference-parity semantics (default, cfg PARITY: true — VERDICT r1 #4):
  * motion_classify uses only hit==1 (tight-update) frames and declares
    static iff EVERY pair of observed boxes overlaps in BEV
    (post_process.py:77-89; <2 observed frames => static);
  * static_drift_eliminate applies only to static VEHICLES and rewrites
    only the TRAILING predicted-only boxes with the max-score observed box
    (post_process.py:92-108);
  * box_size_update: 'max_score' averages the sizes of ALL max-score
    frames, 'weighted' weights over every frame, 'largest' picks the
    largest VOLUME (post_process.py:110-140).
PARITY: false keeps the round-1 variants (first-vs-last overlap ratio
static test, all-gap drift fill for every class, area-based largest).
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
        self.header_length = int(cfg.get("HEADER_LENGTH", 5))
        self.parity = bool(cfg.get("PARITY", True))

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
        """Drop predicted-only (hit==0) head and tail entries
        (empty_track_delete END_REMOVE, post_process.py:35-49)."""
        hits = np.asarray(t.hits) > 0
        if not hits.any():
            t.frames, t.boxes, t.scores, t.hits = [], [], [], []
            return
        lo = int(np.argmax(hits))
        hi = len(hits) - int(np.argmax(hits[::-1]))
        t.frames = t.frames[lo:hi]
        t.boxes = t.boxes[lo:hi]
        t.scores = t.scores[lo:hi]
        t.hits = t.hits[lo:hi]
        if getattr(t, "kf_vels", None) is not None and len(t.kf_vels) >= hi:
            t.kf_vels = t.kf_vels[lo:hi]

    def _velocity_optimize(self, t, dt: float = 0.1):
        """Per-box (vx, vy). Parity (velocity_optimize, reference
        post_process.py:55-70): the first HEADER_LENGTH entries are
        rewritten with forward differences; every later entry keeps the
        KF-propagated velocity the tracker recorded (the reference stores
        them in boxes_global[:, 7:9] and leaves them untouched — ADVICE
        r2).  Non-parity: np.gradient central differences throughout."""
        centers = np.stack([b[:2] for b in t.boxes])
        if len(centers) == 1:
            t.velocities = np.zeros((1, 2))
            return
        if self.parity and getattr(t, "kf_vels", None) is not None \
                and len(t.kf_vels) == len(centers):
            v = np.stack([np.asarray(kv, float) for kv in t.kf_vels])
        else:
            v = np.gradient(centers, axis=0) / dt
        if self.parity:
            n = min(self.header_length, len(centers) - 1)
            v[:n] = (centers[1:n + 1] - centers[:n]) / dt
        t.velocities = v

    def _motion_classify(self, t):
        hits1 = np.where(np.asarray(t.hits) == 1)[0] if self.parity \
            else np.where(np.asarray(t.hits) > 0)[0]
        if self.parity:
            # static iff every pair of observed boxes still overlaps in BEV
            # (post_process.py:77-89); <2 observations => static
            if len(hits1) < 2:
                return "static"
            bevs = box_np.boxes3d_to_bev(
                np.stack([t.boxes[i] for i in hits1]))
            for i in range(len(bevs)):
                for j in range(i + 1, len(bevs)):
                    if box_np.rotated_overlap_bev(bevs[i], bevs[j]) <= 1e-4:
                        return "dynamic"
            return "static"
        first, last = t.boxes[hits1[0]], t.boxes[hits1[-1]]
        ov = box_np.rotated_overlap_bev(
            box_np.boxes3d_to_bev(np.asarray([first]))[0],
            box_np.boxes3d_to_bev(np.asarray([last]))[0],
        )
        area = min(first[3] * first[4], last[3] * last[4])
        return "static" if area > 0 and ov / area > self.static_thresh \
            else "dynamic"

    def _static_drift_eliminate(self, t):
        hits = np.asarray(t.hits)
        scores = np.asarray(t.scores)
        if self.parity:
            # vehicles only; rewrite only the TRAILING predicted-only boxes
            # with the best-scoring tight-update box (post_process.py:92-108)
            name = t.label if isinstance(t.label, str) else (
                "Vehicle" if int(t.label) == 0 else "other")
            if name != "Vehicle":
                return
            h1 = np.where(hits == 1)[0]
            if not len(h1):
                return
            best_box = t.boxes[h1[np.argmax(scores[h1])]]
            for i in reversed(range(len(t.boxes))):
                if hits[i] >= 1:
                    break
                t.boxes[i] = best_box.copy()
            return
        obs = hits > 0
        best = int(np.argmax(np.where(obs, scores, -np.inf)))
        best_box = t.boxes[best]
        for i in range(len(t.boxes)):
            if not obs[i]:
                t.boxes[i] = best_box.copy()

    def _box_size_update(self, t):
        """Unify box sizes along the track (post_process.py:110-140)."""
        mode = self.size_update
        scores = np.asarray(t.scores)
        all_sizes = np.stack([b[3:6] for b in t.boxes])
        if self.parity:
            if mode in ("max_score", "max_score_box"):
                m = scores == scores.max()
                size = all_sizes[m].mean(0)
            elif mode in ("weighted", "score_weigthed_box"):
                w = scores / max(scores.sum(), 1e-6)
                size = (all_sizes * w[:, None]).sum(0)
            elif mode in ("largest", "largest_box"):
                size = all_sizes[int(np.argmax(all_sizes.prod(axis=1)))]
            else:
                return
        else:
            obs = np.asarray(t.hits) > 0
            sizes = all_sizes[obs]
            s = scores[obs]
            if mode == "max_score":
                size = sizes[int(np.argmax(s))]
            elif mode == "weighted":
                w = s / max(s.sum(), 1e-6)
                size = (sizes * w[:, None]).sum(0)
            elif mode == "largest":
                size = sizes.max(0)
            else:
                return
        for b in t.boxes:
            b[3:6] = size
