"""Orbax checkpointing with the reference's resume semantics.

Reference (train_utils.py:136-202, model_utils.py:8-72): rank-0-only save of
{epoch, it, model_state, optimizer_state}, rotation keeping max_ckpt_save_num,
auto-resume from latest, shape-tolerant partial load. Here the payload is the
functional train state pytree {params, opt_state, step} via orbax.
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir, max_to_keep: int = 5):
        self.ckpt_dir = Path(ckpt_dir).absolute()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state_template, step: int | None = None):
        """Restore into the shape/dtype structure of ``state_template``.
        Returns (state, step) or (state_template, None) when no ckpt exists."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return state_template, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return restored, step

    def restore_any(self, step: int | None = None):
        """Template-free restore of the raw saved pytree (for eval CLIs that
        only need params/batch_stats out of a full train state)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None, None
        return self._mgr.restore(step), step


def load_params_partial(params, loaded, logger=None):
    """Shape-tolerant partial load (model_utils.py:8-43): copy leaves whose
    path+shape match; keep the fresh init elsewhere."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    out, n_hit = {}, 0
    for path, leaf in flat_p.items():
        cand = flat_l.get(path)
        if cand is not None and getattr(cand, "shape", None) == leaf.shape:
            out[path] = cand
            n_hit += 1
        else:
            out[path] = leaf
    if logger:
        logger.info(f"partial load: matched {n_hit}/{len(flat_p)} tensors")
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    )
