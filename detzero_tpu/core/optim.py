"""Optimizers & LR schedules.

Re-expresses the reference's optimize_utils (adam/sgd/adam_onecycle +
OneCycle/CosineWarmup schedulers, optimize_utils/__init__.py:11-75,
learning_schedules_fastai.py) on optax. The fastai OptimWrapper machinery
(true weight decay, momentum cycling) collapses into optax transforms.
"""

from __future__ import annotations

import optax


def wd_mask(params):
    """True for leaves that should receive weight decay: exclude biases and
    norm scales/offsets (the reference's paramwise custom_keys,
    optimize_utils/__init__.py add_params:78)."""
    import jax

    def leaf_mask(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        parent = "/".join(str(getattr(p, "key", p)) for p in path)
        if name in ("bias", "scale", "mean", "var"):
            return False
        if "BatchNorm" in parent or "LayerNorm" in parent or "bn" in name:
            return False
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def build_schedule(opt_cfg, total_steps: int):
    lr = float(opt_cfg.LR)
    name = opt_cfg.OPTIMIZER
    if name.endswith("onecycle"):
        # fastai OneCycle (learning_schedules_fastai.py:68): warm up to LR over
        # PCT_START of training, cosine-anneal down; optax's builtin matches.
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=lr,
            pct_start=float(opt_cfg.get("PCT_START", 0.4)),
            div_factor=float(opt_cfg.get("DIV_FACTOR", 10.0)),
            final_div_factor=float(opt_cfg.get("DIV_FACTOR", 10.0)) * 1e3,
        )
    decay_steps = [int(total_steps * x) for x in opt_cfg.get("DECAY_STEP_LIST", [0.7, 0.9])]
    return optax.piecewise_constant_schedule(
        lr, {s: float(opt_cfg.get("LR_DECAY", 0.1)) for s in decay_steps}
    )


def build_optimizer(opt_cfg, total_steps: int):
    """Returns (optax.GradientTransformation, schedule_fn)."""
    schedule = build_schedule(opt_cfg, total_steps)
    name = opt_cfg.OPTIMIZER
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))

    if name in ("adam", "adam_onecycle"):
        core = optax.adamw(schedule, b1=0.9, b2=0.99, weight_decay=wd,
                           mask=wd_mask)
    elif name in ("adamW", "adamW_onecycle"):
        core = optax.adamw(schedule, weight_decay=wd, mask=wd_mask)
    elif name == "sgd":
        core = optax.chain(
            optax.masked(optax.add_decayed_weights(wd), wd_mask),
            optax.sgd(schedule, momentum=float(opt_cfg.get("MOMENTUM", 0.9))),
        )
    else:
        raise NotImplementedError(name)

    chain = [core]
    if clip > 0:
        chain.insert(0, optax.clip_by_global_norm(clip))
    return optax.chain(*chain), schedule
