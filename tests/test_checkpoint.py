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


def test_merge_tree_restores_filtered_over_fresh():
    from seed_tpu.utils.checkpoint import merge_tree
    params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    trained = jax.tree.map(lambda x: x + 1.0, params)
    saved = filter_tree(trained, r"(embed_tokens|lm_head)/")
    merged = merge_tree(params, saved)
    np.testing.assert_array_equal(
        np.asarray(merged["embed_tokens"]["embedding"]),
        np.asarray(trained["embed_tokens"]["embedding"]))
    np.testing.assert_array_equal(               # untouched leaf kept
        np.asarray(merged["layers"]["q_proj"]["kernel"]),
        np.asarray(params["layers"]["q_proj"]["kernel"]))


def test_merge_tree_ignores_extra_overlay_paths():
    """Stage-1 -> stage-2 init: overlay may hold text-pathway params the
    stage-2 tree lacks (ffn_t, word_embeddings); they're skipped."""
    from seed_tpu.utils.checkpoint import merge_tree
    base = {"a": np.zeros(3), "b": {"c": np.ones(2)}}
    overlay = {"a": np.full(3, 7.0), "b": {"c": None, "extra": np.ones(9)}}
    merged = merge_tree(base, overlay)
    np.testing.assert_array_equal(merged["a"], np.full(3, 7.0))
    np.testing.assert_array_equal(merged["b"]["c"], np.ones(2))


def test_merge_tree_shape_mismatch_raises():
    from seed_tpu.utils.checkpoint import merge_tree
    import pytest as _pytest
    with _pytest.raises(ValueError, match="shape mismatch"):
        merge_tree({"a": np.zeros(3)}, {"a": np.zeros(4)})


def test_filtered_checkpoint_roundtrip_and_merge(tmp_path):
    """End-to-end runner semantics: save trainable-only, restore, merge."""
    from seed_tpu.utils.checkpoint import merge_tree
    params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    trained = jax.tree.map(lambda x: x * 2.0, params)
    save_checkpoint(str(tmp_path / "ck"), filter_tree(trained, r"lm_head/"))
    restored = restore_checkpoint(str(tmp_path / "ck"))
    merged = merge_tree(params, restored)
    np.testing.assert_array_equal(np.asarray(merged["lm_head"]["kernel"]),
                                  np.asarray(trained["lm_head"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged["norm"]["scale"]),
        np.asarray(params["norm"]["scale"]))
