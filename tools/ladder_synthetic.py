"""Quality-ladder demonstration on synthetic sequences (VERDICT r1 #6).

The reference's product is the pipeline ladder DET 76.24 -> +TRK 76.44 ->
+GRM/PRM 79.79 -> +CRM 81.70 APH on Waymo val (README.md:77-82). No Waymo
data ships in this container, so this tool demonstrates the same ladder
directionally on HELD-OUT synthetic sequences with the native evaluator:

  stage 0  DET        raw detector output
  stage 1  +TRK       track + combine (drop re-merge)
  stage 2  +GRM/PRM   geometry + position refinement
  stage 3  +CRM       confidence rescoring

Modes:
  --make_refine_data OUT_DIR : run DET+track+daemon over TRAIN-seed
      sequences and dump per-class refining records (+ CRM iou labels in
      each record) in the layout train_refine.py consumes.
  default : run the ladder on val-seed sequences; print the table and
      append it to LADDER.md.

Usage:
    python tools/ladder_synthetic.py --ckpt output/centerpoint_synthetic/default/ckpt \
        [--platform cpu] [--val_seed 1234] [--n_seq 8] \
        [--grm_cfg ... --grm_ckpt ...] [--prm_cfg ...] [--crm_cfg ...]
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_CFG = "configs/det_model_cfgs/centerpoint_synthetic.yaml"


def build_synthetic(cfg, seed, n_seq, logger=None):
    from tools.common import build_detection_dataset

    cfg = cfg.__class__({**cfg})
    cfg["SYNTHETIC_SEED"] = int(seed)
    cfg["SYNTHETIC_LENGTH"] = int(n_seq) * 16
    return build_detection_dataset(cfg, training=False, logger=logger)


def run_det(cfg, ckpt_dir, dataset, logger, batch_size=4, nms_pre=256,
            nms_post=128):
    """Detector inference over the whole dataset -> det_annos list.

    nms_pre/nms_post default far below the Waymo-scale budgets: synthetic
    scenes hold <=32 objects and the CPU KxK rotated-IoU NMS dominates
    runtime quadratically (1024^2 -> ~17 s/frame; 256^2 -> ~1 s)."""
    import functools

    import jax
    import jax.numpy as jnp

    from detzero_tpu.core.checkpoint import CheckpointManager
    from detzero_tpu.data.waymo_dataset import build_dataloader
    from tools.common import build_detector

    model = build_detector(cfg, dtype=jnp.float32)
    state, step = CheckpointManager(ckpt_dir).restore_any()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    logger.info(f"detector checkpoint step {step}")
    variables = {"params": state["params"],
                 "batch_stats": state.get("batch_stats", {})}
    predict = jax.jit(functools.partial(model.predict, nms_pre=nms_pre,
                                        nms_post=nms_post,
                                        score_thresh=0.0))  # AP integrates
    # over all operating points; a decode-time score floor only truncates
    # the PR curve
    loader = build_dataloader(dataset, batch_size, shuffle=False,
                              drop_last=False)
    det_annos = []
    for batch in loader(0):
        preds = predict(variables, batch["points"], batch["points_valid"])
        det_annos.extend(dataset.generate_prediction_dicts(batch, preds))
    return det_annos


def scene_tables(dataset):
    """Per-frame raw points / GT boxes / GT names, plus per-seq frame ids."""
    pts, gtb, gtn = [], [], []
    for i in range(len(dataset)):
        p, b, n = dataset.generate_scene(i)
        pts.append(p)
        gtb.append(b)
        gtn.append(n)
    return pts, gtb, gtn


def eval_stage(preds_per_frame, gt_boxes, gt_names, class_names,
               ap_mode="envelope"):
    from detzero_tpu.pipeline.evaluator import evaluate_detection

    gts = [{"gt_boxes": b, "name": n, "num_points": np.full(len(b), 120)}
           for b, n in zip(gt_boxes, gt_names)]
    return evaluate_detection(preds_per_frame, gts,
                              class_names=tuple(class_names),
                              ap_mode=ap_mode)


def det_annos_to_preds(det_annos):
    return [{"boxes_lidar": np.asarray(d["boxes_lidar"])[:, :7],
             "score": np.asarray(d["score"]), "name": np.asarray(d["name"])}
            for d in det_annos]


def frames_to_preds(frames, class_names):
    out = []
    for fr in frames:
        names = np.asarray([class_names[int(l)] for l in fr["labels"]])
        out.append({"boxes_lidar": np.asarray(fr["boxes"]).reshape(-1, 7),
                    "score": np.asarray(fr["scores"]), "name": names})
    return out


def main():
    p = argparse.ArgumentParser("synthetic pipeline ladder")
    p.add_argument("--cfg_file", default=DEFAULT_CFG)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--platform", default=None)
    p.add_argument("--val_seed", type=int, default=1234)
    p.add_argument("--n_seq", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--make_refine_data", default=None,
                   help="dump refining records for TRAIN-seed sequences "
                        "to this directory instead of running the ladder")
    p.add_argument("--relabel_crm", default=None,
                   help="refine-data dir: recompute each record's iou_gt "
                        "as the IoU of its GRM/PRM-REFINED boxes vs GT "
                        "(reference generate_iou_gt.py flow — CRM must "
                        "score the boxes it will see at inference). "
                        "Needs --grm/--prm models; rewrites pkls in place")
    p.add_argument("--train_seed", type=int, default=0)
    p.add_argument("--out_md", default="LADDER.md")
    for stage in ("grm", "prm", "crm"):
        p.add_argument(f"--{stage}_cfg", default=None)
        p.add_argument(f"--{stage}_ckpt", default=None)
        p.add_argument(f"--{stage}", nargs="*", default=None,
                       metavar="CLS=CFG:CKPT",
                       help=f"per-class {stage} models, e.g. "
                            f"Vehicle=cfgs/v.yaml:out/v/ckpt (repeatable)")
    args = p.parse_args()

    # CRITICAL ORDER: the platform must be pinned before ANY detzero_tpu
    # import — importing jax.numpy (which they all do) initializes the
    # default backend under this image's sitecustomize, and a second
    # process touching the axon TPU blocks forever on the tunnel
    # (CLAUDE.md "Environment pitfalls")
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from detzero_tpu.core.config import Config, cfg_from_yaml_file
    from detzero_tpu.core.logger import create_logger
    from detzero_tpu.pipeline.offboard import OffboardPipeline
    from tools.run_offboard import _load_refine
    from tools.run_track import group_by_sequence

    logger = create_logger()
    cfg = cfg_from_yaml_file(args.cfg_file, Config())
    class_names = list(cfg.get("CLASS_NAMES",
                               ["Vehicle", "Pedestrian", "Cyclist"]))

    # ---------------- CRM-relabel mode (no detector needed) -------------
    if args.relabel_crm:
        stages = {}
        for stage in ("grm", "prm"):
            per_cls = getattr(args, stage)
            if per_cls:
                stages[stage] = {}
                for spec in per_cls:
                    cls, rest = spec.split("=", 1)
                    scfg, sck = rest.split(":", 1)
                    stages[stage][cls] = _load_refine(scfg, sck)
        from detzero_tpu.pipeline import daemon

        pipe = OffboardPipeline(**stages)
        root = Path(args.relabel_crm)
        for cls_dir in sorted(d for d in root.iterdir() if d.is_dir()):
            for pkl_p in sorted(cls_dir.glob("*.pkl")):
                with open(pkl_p, "rb") as f:
                    recs = pickle.load(f)
                g, c, h, _ = pipe.refine(recs)
                ious = daemon.generate_iou_gt(recs, g or None, c or None,
                                              h or None)
                for oid, rec in recs.items():
                    rec["iou_gt"] = ious[oid]
                with open(pkl_p, "wb") as f:
                    pickle.dump(recs, f)
                logger.info(f"relabeled {pkl_p} ({len(recs)} tracks)")
        return

    seed = args.train_seed if args.make_refine_data else args.val_seed
    dataset = build_synthetic(cfg, seed, args.n_seq, logger)
    logger.info(f"{len(dataset)} frames, seed {seed}")
    det_annos = run_det(cfg, args.ckpt, dataset, logger, args.batch_size)
    pts, gtb, gtn = scene_tables(dataset)

    seqs = group_by_sequence(det_annos, class_names)
    frame_of = {}  # seq -> list of global frame indices
    for d in det_annos:
        frame_of.setdefault(d["sequence_name"], []).append(int(d["frame_id"]))

    # ---------------- refine-data mode ----------------------------------
    if args.make_refine_data:
        from detzero_tpu.pipeline import daemon

        out_root = Path(args.make_refine_data)
        pipe = OffboardPipeline()
        n_rec = {c: 0 for c in class_names}
        for seq, frames in seqs.items():
            fids = frame_of[seq]
            tr = pipe.track(frames)
            objs = daemon.prepare_object_data(
                tr, [pts[i] for i in fids],
                [np.eye(4)] * len(fids),
                gt_boxes=[gtb[i] for i in fids])
            ious = daemon.generate_iou_gt(objs, None)
            per_cls = {c: {} for c in class_names}
            for oid, rec in objs.items():
                rec = dict(rec)
                rec["iou_gt"] = ious[oid]
                cls = class_names[int(rec.get("label", 0))]
                per_cls[cls][oid] = rec
            for cls, d in per_cls.items():
                if not d:
                    continue
                out = out_root / cls / f"{seq}.pkl"
                out.parent.mkdir(parents=True, exist_ok=True)
                with open(out, "wb") as f:
                    pickle.dump(d, f)
                n_rec[cls] += len(d)
        logger.info(f"refine records written: {n_rec} -> {out_root}")
        return

    # ---------------- ladder mode ---------------------------------------
    stages = {}
    for stage in ("grm", "prm", "crm"):
        per_cls = getattr(args, stage)
        cfg_p = getattr(args, f"{stage}_cfg")
        ck = getattr(args, f"{stage}_ckpt")
        if per_cls:
            stages[stage] = {}
            for spec in per_cls:
                cls, rest = spec.split("=", 1)
                scfg, sck = rest.split(":", 1)
                stages[stage][cls] = _load_refine(scfg, sck)
                logger.info(f"{stage}[{cls}]: loaded {scfg} @ {sck}")
        elif cfg_p and ck:
            stages[stage] = _load_refine(cfg_p, ck)
            logger.info(f"{stage}: loaded {cfg_p} @ {ck}")

    rows = []  # (stage_name, results)
    det_preds = det_annos_to_preds(det_annos)
    rows.append(("DET", eval_stage(det_preds, gtb, gtn, class_names)))
    # quantify envelope-vs-waymo101 on this run (the exact protocol's
    # 0.05-recall-per-cutoff cap bites hard on sparse synthetic GT; both
    # numbers are recorded so the delta is on the table)
    r101 = eval_stage(det_preds, gtb, gtn, class_names, ap_mode="waymo101")
    logger.info(
        f"DET mean AP_L2 envelope {rows[0][1]['mean']['AP_L2']:.4f} vs "
        f"waymo101 {r101['mean']['AP_L2']:.4f} (delta "
        f"{rows[0][1]['mean']['AP_L2'] - r101['mean']['AP_L2']:+.4f})")

    def run_ladder(pipe, label):
        all_preds = [None] * len(dataset)
        for seq, frames in seqs.items():
            fids = frame_of[seq]
            res = pipe.run_sequence(frames, [pts[i] for i in fids],
                                    [np.eye(4)] * len(fids))
            for local_i, fr_preds in enumerate(
                    frames_to_preds(res["frames"], class_names)):
                all_preds[fids[local_i]] = fr_preds
        empty = {"boxes_lidar": np.zeros((0, 7)), "score": np.zeros(0),
                 "name": np.zeros(0, object)}
        all_preds = [p if p is not None else dict(empty) for p in all_preds]
        rows.append((label, eval_stage(all_preds, gtb, gtn, class_names)))

    run_ladder(OffboardPipeline(), "+TRK")
    if "grm" in stages or "prm" in stages:
        run_ladder(OffboardPipeline(grm=stages.get("grm"),
                                    prm=stages.get("prm")), "+GRM/PRM")
    if "crm" in stages:
        run_ladder(OffboardPipeline(grm=stages.get("grm"),
                                    prm=stages.get("prm"),
                                    crm=stages.get("crm")), "+CRM")

    # ---------------- report --------------------------------------------
    hdr = f"| stage | mean AP L2 | mean APH L2 | " \
          f"{' | '.join(c + ' AP' for c in class_names)} |"
    sep = "|" + "---|" * (3 + len(class_names))
    lines = [hdr, sep]
    for name, res in rows:
        cells = [f"{res['mean']['AP_L2']:.4f}", f"{res['mean']['APH_L2']:.4f}"]
        cells += [f"{res[c]['AP_L2']:.4f}" for c in class_names]
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    table = "\n".join(lines)
    logger.info("\n" + table)
    if args.out_md:
        import datetime
        with open(args.out_md, "a") as f:
            f.write(f"\n## Ladder run {datetime.datetime.now():%Y-%m-%d %H:%M}"
                    f" (ckpt={args.ckpt}, seed={args.val_seed},"
                    f" n_seq={args.n_seq})\n\n{table}\n")
        logger.info(f"appended to {args.out_md}")


if __name__ == "__main__":
    main()
