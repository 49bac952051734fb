"""Detection inference/eval CLI (reference detection/tools/test.py surface),
incl. TTA (--set DATA_CONFIG TTA True equivalent: --set TTA True) and
result-pickle dumping for the tracking stage."""

from __future__ import annotations

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from tools.common import (apply_platform, base_parser,
                              build_detection_dataset, build_detector,
                              load_config, setup_experiment)

    parser = base_parser("detzero_tpu detection eval")
    parser.add_argument("--save_to_file", action="store_true")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--eval_all", action="store_true",
                        help="poll the ckpt dir and evaluate every new "
                             "checkpoint (reference repeat_eval_ckpt)")
    parser.add_argument("--max_waiting_mins", type=float, default=30.0)
    parser.add_argument("--ap_mode", default="envelope",
                        choices=["envelope", "waymo101"],
                        help="waymo101 = exact 101-score-cutoff protocol")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard eval batches over all local devices "
                             "(reference DistributedSampler eval, "
                             "datasets/__init__.py:16-36); global batch = "
                             "BATCH_SIZE_PER_DEVICE * device_count")
    args = parser.parse_args()
    apply_platform(args)
    cfg = load_config(args)
    exp_dir, logger = setup_experiment(args, cfg, "test")

    import jax
    import numpy as np
    from detzero_tpu.core.checkpoint import CheckpointManager
    from detzero_tpu.data import tta as tta_mod
    from detzero_tpu.data.waymo_dataset import build_dataloader
    from detzero_tpu.ops import wbf

    dataset = build_detection_dataset(cfg, training=False, logger=logger)
    model = build_detector(cfg)
    batch_size = 1 if cfg.get("TTA", False) else \
        int(cfg.get("OPTIMIZATION", {}).get("BATCH_SIZE_PER_DEVICE", 1))
    dp_sharding = None
    if args.data_parallel and jax.device_count() > 1 and not cfg.get("TTA",
                                                                     False):
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(_np.asarray(jax.devices()), ("data",))
        dp_sharding = NamedSharding(mesh, P("data"))
        batch_size *= jax.device_count()
        logger.info(f"data-parallel eval over {jax.device_count()} devices, "
                    f"global batch {batch_size}")
    loader = build_dataloader(dataset, batch_size, shuffle=False,
                              num_workers=args.workers, drop_last=False)

    first = next(loader(0))
    variables = model.init(jax.random.PRNGKey(0), first["points"],
                           first["points_valid"])
    ckpt_dir = args.ckpt or (exp_dir / "ckpt")
    mgr = CheckpointManager(ckpt_dir)

    pp = cfg.get("MODEL", {}).get("POST_PROCESSING", {})
    predict = jax.jit(lambda v, p, m: model.predict(
        v, p, m,
        score_thresh=float(pp.get("SCORE_THRESH", 0.1)),
        nms_thresh=float(pp.get("NMS_THRESH", 0.7)),
        nms_pre=int(pp.get("NMS_PRE_MAXSIZE", 1024)),
        nms_post=int(pp.get("NMS_POST_MAXSIZE", 256))))

    def eval_one(variables, tag=""):
        det_annos = []
        for bi, batch in enumerate(loader(0)):
            if args.max_batches is not None and bi >= args.max_batches:
                break
            pts_b, pv_b = batch["points"], batch["points_valid"]
            if dp_sharding is not None:
                if pts_b.shape[0] % jax.device_count():  # pad the tail batch
                    pad = -pts_b.shape[0] % jax.device_count()
                    pts_b = np.concatenate([pts_b, np.repeat(
                        pts_b[-1:], pad, axis=0)])
                    pv_b = np.concatenate([pv_b, np.zeros(
                        (pad,) + pv_b.shape[1:], bool)])
                pts_b = jax.device_put(pts_b, dp_sharding)
                pv_b = jax.device_put(pv_b, dp_sharding)
            preds = predict(variables, pts_b, pv_b)
            if dp_sharding is not None:
                preds = jax.tree.map(
                    lambda x: np.asarray(x)[: len(batch["points"])], preds)
            dicts = dataset.generate_prediction_dicts(batch, preds)
            if cfg.get("TTA", False):
                names, boxes, scores = [], [], []
                for d, name in zip(dicts, batch["tta_name"]):
                    boxes.append(tta_mod.invert_boxes(d["boxes_lidar"], name))
                    names.append(d["name"])
                    scores.append(d["score"])
                n, b, s = wbf.wbf_online(
                    np.concatenate(names), np.concatenate(boxes),
                    np.concatenate(scores),
                    class_names=tuple(cfg.get("CLASS_NAMES")),
                    n_models=len(dicts))
                dicts = [{"name": n, "score": s, "boxes_lidar": b,
                          "frame_id": dicts[0]["frame_id"],
                          "sequence_name": dicts[0]["sequence_name"],
                          "pose": dicts[0]["pose"]}]
            det_annos.extend(dicts)
        if args.save_to_file:
            out = exp_dir / f"result{tag}.pkl"
            with open(out, "wb") as f:
                pickle.dump(det_annos, f)
            logger.info(f"saved {len(det_annos)} frames to {out}")
        table, res = dataset.evaluation(det_annos, cfg.get("CLASS_NAMES", []),
                                        ap_mode=args.ap_mode)
        logger.info("\n" + str(table))
        return res

    if args.eval_all:
        # checkpoint watcher (reference repeat_eval_ckpt, test.py:88-134):
        # poll for new checkpoints, evaluate each once, record in a list file
        import time
        done_file = exp_dir / "eval_list.txt"
        done = set(done_file.read_text().split()) if done_file.exists() else set()
        waited = 0.0
        while waited < args.max_waiting_mins * 60:
            step = mgr.latest_step()
            if step is None or str(step) in done:
                time.sleep(30)
                waited += 30
                continue
            state, step = mgr.restore_any(step)
            logger.info(f"evaluating checkpoint step {step}")
            eval_one({"params": state["params"],
                      "batch_stats": state["batch_stats"]}, tag=f"_{step}")
            done.add(str(step))
            done_file.write_text("\n".join(sorted(done)))
            waited = 0.0
        logger.info("eval watcher timed out")
        return

    state, step = mgr.restore_any()
    if step is not None:
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        logger.info(f"loaded checkpoint step {step}")
    else:
        logger.warning("no checkpoint found — evaluating a random init")
    eval_one(variables)


if __name__ == "__main__":
    main()
