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


def paramwise_multipliers(params, paramwise_cfg):
    """Per-leaf (lr_mult, decay_mult) trees from PARAMWISE.custom_keys —
    the reference's per-param-group machinery (add_params,
    optimize_utils/__init__.py:81-137): the LONGEST custom key that is a
    substring of the dotted parameter path wins; unmatched leaves get
    (1, 1). Keys/values accept either case (lr_mult/LR_MULT)."""
    import jax

    custom = dict(paramwise_cfg.get("custom_keys",
                                    paramwise_cfg.get("CUSTOM_KEYS", {}))
                  or {})
    sorted_keys = sorted(sorted(custom.keys()), key=len, reverse=True)

    def mults(path, leaf):
        dotted = ".".join(str(getattr(p, "key", p)) for p in path)
        for k in sorted_keys:
            if k in dotted:
                c = custom[k]
                return (float(c.get("lr_mult", c.get("LR_MULT", 1.0))),
                        float(c.get("decay_mult", c.get("DECAY_MULT", 1.0))))
        return (1.0, 1.0)

    pairs = jax.tree_util.tree_map_with_path(mults, params)
    is_pair = lambda x: isinstance(x, tuple) and len(x) == 2 \
        and all(isinstance(v, float) for v in x)
    lr_t = jax.tree.map(lambda p: p[0], pairs, is_leaf=is_pair)
    dc_t = jax.tree.map(lambda p: p[1], pairs, is_leaf=is_pair)
    return lr_t, dc_t


def _scale_per_leaf(mult_tree):
    """Elementwise per-leaf update scaling (lr_mult)."""
    import jax

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, mult_tree), state

    return optax.GradientTransformation(init, update)


def _add_decayed_per_leaf(wd, decay_tree, mask_tree):
    """Decoupled weight decay with per-leaf decay_mult + wd mask."""
    import jax

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        assert params is not None
        new = jax.tree.map(
            lambda u, p, d, m: u + wd * d * p if m else u,
            updates, params, decay_tree, mask_tree)
        return new, state

    return optax.GradientTransformation(init, update)


def build_optimizer(opt_cfg, total_steps: int, params=None):
    """Returns (optax.GradientTransformation, schedule_fn).

    params: optional param pytree — required when opt_cfg.PARAMWISE
    (custom_keys lr_mult/decay_mult) is set, so per-leaf multipliers can
    be resolved against the actual parameter paths."""
    schedule = build_schedule(opt_cfg, total_steps)
    name = opt_cfg.OPTIMIZER
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))
    paramwise = opt_cfg.get("PARAMWISE", None)

    if paramwise and params is not None and name == "sgd":
        # the reference's paramwise_cfg only pairs with Adam-family
        # optimizers (mmcv DefaultOptimizerConstructor would apply it, but
        # no shipped config does); silently ignoring it would train with
        # uniform lr — refuse instead (ADVICE r2)
        raise NotImplementedError(
            "PARAMWISE with OPTIMIZER sgd is not supported")
    if paramwise and params is not None:
        # per-optimizer hyperparams must match the non-paramwise branches:
        # 'adam'/'adam_onecycle' use b2=0.99 (fastai AdamW defaults used by
        # the reference train.py); 'adamW' uses optax/torch 0.999
        b2 = 0.99 if name in ("adam", "adam_onecycle") else 0.999
        lr_t, dc_t = paramwise_multipliers(params, paramwise)
        mask_t = wd_mask(params)
        core = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=b2),
            _add_decayed_per_leaf(wd, dc_t, mask_t),
            optax.scale_by_learning_rate(schedule),  # includes the -1
            _scale_per_leaf(lr_t),
        )
    elif name in ("adam", "adam_onecycle"):
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
