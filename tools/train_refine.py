"""Refining training CLI (reference refining/tools/train.py surface):
one run trains one of GRM/PRM/CRM for one class, per the model cfg."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_refine_dataset(cfg, training, logger=None, records=None):
    from detzero_tpu.core.registry import DATASETS
    import detzero_tpu.data.refine_dataset  # noqa: F401

    name = cfg["DATASET"]
    return DATASETS.get(name)(cfg, cfg.get("CLASS_NAME", "Vehicle"),
                              training=training, logger=logger,
                              records=records)


def build_refine_model(cfg):
    import jax.numpy as jnp
    from detzero_tpu.core.registry import REFINE_MODULES
    import detzero_tpu.models.refining  # noqa: F401

    m = cfg["MODEL"]
    name = m["NAME"]
    kw = {"d_model": int(m.get("D_MODEL", 256)), "dtype": jnp.float32}
    if name != "ConfidencePointNet":
        kw["n_heads"] = int(m.get("N_HEADS", 4))
        kw["num_decoder_layers"] = int(m.get("NUM_DECODER_LAYERS", 1))
    if name == "GeometryTransformer":
        kw["num_anchors"] = int(m.get("NUM_ANCHORS", 3))
    if name == "PositionTransformer":
        kw["mem_points"] = int(cfg.get("MEMORY_POINTS", 48))
    return REFINE_MODULES.get(name)(**kw)


def make_loss_fn(cfg, model):
    import jax
    import numpy as np
    from detzero_tpu.models.refining import crm_loss, grm_loss, prm_loss
    from detzero_tpu.models.refining.target_assign import DEFAULT_SIZE_ANCHORS

    name = cfg["MODEL"]["NAME"]
    cls = cfg.get("CLASS_NAME", "Vehicle")
    anchors = np.asarray(cfg["MODEL"].get(
        "SIZE_ANCHORS", DEFAULT_SIZE_ANCHORS[cls]))

    if name == "GeometryTransformer":
        def loss_fn(variables, batch):
            def one(qp, qs, mp, mm, gt):
                pred = model.apply(variables, qp, qs, mp, mm)
                return grm_loss(pred, gt, anchors)
            losses, aux = jax.vmap(one)(
                batch["query_pts"], batch["query_sizes"], batch["memory_pts"],
                batch["memory_mask"], batch["gt_size"])
            w = batch["has_gt"].astype(losses.dtype)
            denom = jax.numpy.maximum(w.sum(), 1.0)
            return (losses * w).sum() / denom, (aux, {})
        return loss_fn
    if name == "PositionTransformer":
        def loss_fn(variables, batch):
            def one(qp, qb, mp, pm, gc, gh, gm):
                pred = model.apply(variables, qp, qb, mp, pm)
                return prm_loss(pred, gc, gh, pm & gm)
            losses, aux = jax.vmap(one)(
                batch["query_pts"], batch["query_boxes"], batch["memory_pts"],
                batch["pad_mask"], batch["gt_centers"], batch["gt_headings"],
                batch["gt_mask"])
            return losses.mean(), (aux, {})
        return loss_fn
    if name == "ConfidencePointNet":
        bands = cfg["MODEL"].get("IOU_BANDS", {}).get(cls, [0.35, 0.7])

        def loss_fn(variables, batch):
            def one(qp, pm, gi):
                pred = model.apply(variables, qp, pm)
                return crm_loss(pred, gi, pm, iou_lo=bands[0], iou_hi=bands[1])
            losses, aux = jax.vmap(one)(
                batch["query_pts"], batch["pad_mask"], batch["gt_ious"])
            return losses.mean(), (aux, {})
        return loss_fn
    raise NotImplementedError(name)


def main():
    from tools.common import (apply_platform, base_parser, load_config,
                              setup_experiment)

    parser = base_parser("detzero_tpu refining training")
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args()
    apply_platform(args)
    cfg = load_config(args)
    exp_dir, logger = setup_experiment(args, cfg, "train")

    import jax
    import numpy as np
    from detzero_tpu.core.optim import build_optimizer
    from detzero_tpu.data.waymo_dataset import build_dataloader
    from detzero_tpu.parallel.trainer import Trainer

    dataset = build_refine_dataset(cfg, training=True, logger=logger)
    if len(dataset) == 0:
        logger.error("no refining records found — run the daemon first "
                     "(tools/prepare_object_data.py)")
        return
    opt_cfg = cfg["OPTIMIZATION"]
    batch_size = int(opt_cfg.get("BATCH_SIZE_PER_DEVICE", 8)) * jax.device_count()
    total_steps = args.max_steps or max(len(dataset) // batch_size, 1) * \
        int(opt_cfg.get("NUM_EPOCHS", 60))
    model = build_refine_model(cfg)
    loss_fn = make_loss_fn(cfg, model)
    loader = build_dataloader(dataset, batch_size, shuffle=True,
                              num_workers=args.workers)

    first = next(loader(0))
    sample0 = {k: v[0] for k, v in first.items() if isinstance(v, np.ndarray)}
    name = cfg["MODEL"]["NAME"]
    if name == "GeometryTransformer":
        variables = model.init(jax.random.PRNGKey(0), sample0["query_pts"],
                               sample0["query_sizes"], sample0["memory_pts"],
                               sample0["memory_mask"])
    elif name == "PositionTransformer":
        variables = model.init(jax.random.PRNGKey(0), sample0["query_pts"],
                               sample0["query_boxes"], sample0["memory_pts"],
                               sample0["pad_mask"])
    else:
        variables = model.init(jax.random.PRNGKey(0), sample0["query_pts"],
                               sample0["pad_mask"])

    tx, _ = build_optimizer(opt_cfg, total_steps,
                            params=variables["params"])
    trainer = Trainer(loss_fn, tx, ckpt_dir=exp_dir / "ckpt", logger=logger,
                      log_every=10)
    trainer.init_state({"params": variables["params"],
                        "batch_stats": variables.get("batch_stats", {})})
    trainer.resume()

    def batches():
        ep = 0
        while True:
            for b in loader(ep):
                yield b
            ep += 1

    trainer.fit(batches(), total_steps,
                save_every=int(opt_cfg.get("SAVE_EVERY", 500)),
                profile_dir=args.profile_dir)
    logger.info("refining training done")


if __name__ == "__main__":
    main()
