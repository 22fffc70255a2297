"""Sharded checkpoint save/restore.

Replaces the reference's three checkpoint systems (LAVIS rank-0
state_dict saves runner_base.py:411-434, HF Trainer save_steps,
DeepSpeed engine checkpoints) with one: orbax-backed pytree checkpoints
that save/restore directly against NamedShardings — every host writes its
own shards, restore re-shards to any mesh layout.

Also provides the trainable-params-only filter the LAVIS runner used
(save only requires_grad params, :418-424) via ``filter_tree``.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any, force: bool = True) -> None:
    path = os.path.abspath(path)
    _checkpointer().save(path, tree, force=force)


def restore_checkpoint(path: str, template: Optional[Any] = None,
                       shardings: Optional[Any] = None) -> Any:
    """Restore; with ``shardings`` given, arrays land sharded on-device."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if template is None and shardings is None:
        return _checkpointer().restore(path)
    if shardings is not None:
        abstract = jax.tree.map(
            lambda t, s: jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=s),
            template, shardings)
    else:
        abstract = jax.tree.map(
            lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype), template)
    args = ocp.args.PyTreeRestore(
        abstract, restore_args=jax.tree.map(
            lambda a: ocp.ArrayRestoreArgs(sharding=a.sharding)
            if getattr(a, "sharding", None) is not None
            else ocp.RestoreArgs(), abstract))
    return _checkpointer().restore(path, args=args)


def filter_tree(tree: Any, pattern: str) -> Any:
    """Keep only leaves whose path matches ``pattern`` (others -> None)."""
    from ..parallel.partition import path_str
    pat = re.compile(pattern)
    return jax.tree_util.tree_map_with_path(
        lambda p, l: l if pat.search(path_str(p)) else None, tree)


def merge_tree(base: Any, overlay: Any) -> Any:
    """Path-keyed lenient merge: overlay leaves replace base leaves at the
    same tree path; overlay paths missing from base are ignored, base paths
    missing from overlay keep their value, None overlay leaves are skipped.

    The inverse of ``filter_tree`` and the LAVIS
    load_checkpoint(strict=False) semantics: restore a requires-grad-
    filtered checkpoint over a freshly initialized full tree, or a stage-1
    Q-Former (with text pathway) into a stage-2 model (without)."""
    from ..parallel.partition import path_str
    flat = jax.tree_util.tree_flatten_with_path(
        overlay, is_leaf=lambda x: x is None)[0]
    by_path = {path_str(p): leaf for p, leaf in flat if leaf is not None}

    def pick(p, b):
        o = by_path.get(path_str(p))
        if o is None:
            return b
        if tuple(np.shape(o)) != tuple(np.shape(b)):
            raise ValueError(f"merge_tree: shape mismatch at {path_str(p)}: "
                             f"{np.shape(b)} (base) vs {np.shape(o)} (overlay)")
        return o

    return jax.tree_util.tree_map_with_path(pick, base)


class CheckpointManager:
    """Step-numbered checkpoints with retention + best-metric tracking
    (the RunnerBase save_checkpoint(is_best=...) semantics)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.dir = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.dir, exist_ok=True)

    def _step_dirs(self):
        out = []
        for name in os.listdir(self.dir):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                out.append((int(m.group(1)), os.path.join(self.dir, name)))
        return sorted(out)

    def save(self, step: int, tree: Any, is_best: bool = False) -> str:
        path = os.path.join(self.dir, f"step_{step}")
        save_checkpoint(path, tree)
        if is_best:
            save_checkpoint(os.path.join(self.dir, "best"), tree)
        # retention
        steps = self._step_dirs()
        while len(steps) > self.max_to_keep:
            _, victim = steps.pop(0)
            import shutil
            shutil.rmtree(victim, ignore_errors=True)
        return path

    def latest_step(self) -> Optional[int]:
        steps = self._step_dirs()
        return steps[-1][0] if steps else None

    def restore_latest(self, template=None, shardings=None):
        step = self.latest_step()
        if step is None:
            return None, None
        path = os.path.join(self.dir, f"step_{step}")
        return step, restore_checkpoint(path, template, shardings)
