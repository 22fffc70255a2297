"""Sharded checkpoint save/restore round trips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu.models import llama as M
from seed_tpu.parallel import make_mesh, make_shardings
from seed_tpu.utils.checkpoint import (CheckpointManager, filter_tree,
                                       restore_checkpoint, save_checkpoint)

CFG = M.TINY_LLAMA


def test_roundtrip_unsharded(tmp_path):
    params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    save_checkpoint(str(tmp_path / "ck"), params)
    back = restore_checkpoint(str(tmp_path / "ck"))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, back)


def test_roundtrip_sharded_restore(tmp_path):
    params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    save_checkpoint(str(tmp_path / "ck"), params)
    mesh = make_mesh(dp=1, fsdp=8, tp=1)
    shardings = make_shardings(params, mesh)
    back = restore_checkpoint(str(tmp_path / "ck"), template=params,
                              shardings=shardings)
    # restored arrays are sharded over the mesh and numerically identical
    leaf = back["layers"]["gate_proj"]["kernel"]
    assert len(leaf.sharding.device_set) in (1, 8)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, back)


def test_manager_retention_and_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    tree = {"w": jnp.arange(4.0)}
    for s in (10, 20, 30):
        mgr.save(s, {"w": jnp.arange(4.0) + s})
    assert mgr.latest_step() == 30
    step, back = mgr.restore_latest()
    assert step == 30
    np.testing.assert_array_equal(np.asarray(back["w"]), np.arange(4.0) + 30)
    # retention: only 2 newest kept
    assert mgr.latest_step() == 30
    import os
    kept = [d for d in os.listdir(tmp_path) if d.startswith("step_")]
    assert sorted(kept) == ["step_20", "step_30"]


def test_filter_tree_trainable_only():
    params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    kept = filter_tree(params, r"(embed_tokens|lm_head)/")
    assert kept["embed_tokens"]["embedding"] is not None
    assert kept["layers"]["q_proj"]["kernel"] is None
