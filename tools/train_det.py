"""Detection training CLI (reference detection/tools/train.py surface).

    python tools/train_det.py --cfg_file configs/det_model_cfgs/centerpoint_5sweeps.yaml
    python tools/train_det.py --cfg_file configs/det_model_cfgs/centerpoint_synthetic.yaml \
        --set OPTIMIZATION.NUM_EPOCHS 1   # smoke run, no Waymo data needed
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from tools.common import (apply_platform, base_parser,
                              build_detection_dataset, build_detector,
                              load_config, setup_experiment)

    parser = base_parser("detzero_tpu detection training")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="hard step cap (smoke runs)")
    parser.add_argument("--seed", type=int, default=0,
                        help="base PRNG seed (per-step keys fold the step in)")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="optimizer steps fused into one jit call "
                             "(lax.scan; amortizes dispatch latency)")
    args = parser.parse_args()
    apply_platform(args)
    cfg = load_config(args)
    exp_dir, logger = setup_experiment(args, cfg, "train")

    import jax
    import numpy as np
    from detzero_tpu.core.optim import build_optimizer
    from detzero_tpu.data.waymo_dataset import build_dataloader
    from detzero_tpu.parallel.trainer import Trainer

    dataset = build_detection_dataset(cfg, training=True, logger=logger)
    opt_cfg = cfg["OPTIMIZATION"]
    n_dev = jax.device_count()
    batch_size = int(opt_cfg.get("BATCH_SIZE_PER_DEVICE", 1)) * n_dev
    epochs = int(opt_cfg.get("NUM_EPOCHS", 12))
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = args.max_steps or steps_per_epoch * epochs
    logger.info(f"devices={n_dev} batch={batch_size} steps={total_steps}")

    model = build_detector(cfg)
    loader = build_dataloader(dataset, batch_size, shuffle=True,
                              num_workers=args.workers)

    def loss_fn(variables, batch, step):
        # per-step key: fresh fg/bg RoI subsample draw every step (the
        # reference samples anew each call; ADVICE r2)
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), step)
        return model.loss(variables, batch["points"], batch["points_valid"],
                          batch["gt_boxes"], batch["gt_classes"],
                          batch["gt_valid"], rng=rng)

    first = next(loader(0))
    variables = model.init(jax.random.PRNGKey(0), first["points"],
                           first["points_valid"])
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(variables["params"]))
    logger.info(f"model params: {n_params/1e6:.2f} M")

    # params passed so PARAMWISE custom_keys (per-param lr/decay mults)
    # can resolve against real parameter paths
    tx, _ = build_optimizer(opt_cfg, total_steps, params=variables["params"])
    trainer = Trainer(loss_fn, tx, ckpt_dir=exp_dir / "ckpt", logger=logger,
                      tb_dir=exp_dir / "tb",
                      steps_per_call=args.steps_per_call)
    trainer.init_state(variables)
    trainer.resume()

    def batches():
        ep = 0
        while True:
            for b in loader(ep):
                yield b
            ep += 1

    trainer.fit(batches(), total_steps,
                save_every=int(opt_cfg.get("SAVE_EVERY", steps_per_epoch)),
                profile_dir=args.profile_dir)
    logger.info("training done")


if __name__ == "__main__":
    main()
