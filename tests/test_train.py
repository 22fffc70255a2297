"""Trainer, sharding, LoRA, losses — on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from seed_tpu.models import llama as M
from seed_tpu.parallel import (LLAMA_TP_RULES, make_mesh, make_param_specs,
                               shard_params)
from seed_tpu.train import (Trainer, TrainerConfig, adamw, apply_lora,
                            cosine_with_floor, cross_entropy, info_nce,
                            init_lora, next_token_loss, split_trainable)

CFG = M.TINY_LLAMA


def make_batch(bs=8, n=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(3, CFG.vocab_size - 10, size=(bs, n)).astype(np.int32)
    return {"input_ids": ids}


def loss_fn(params, batch, rng):
    logits = M.forward(params, batch["input_ids"], CFG)
    return next_token_loss(logits, batch["input_ids"])


class TestSchedules:
    def test_cosine_floor(self):
        s = cosine_with_floor(1.0, warmup_steps=10, total_steps=110,
                              min_lr_ratio=0.1)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-5)
        # floor respected at the end
        assert float(s(110)) >= 0.1 - 1e-6
        assert float(s(60)) < 1.0

    def test_warmup_step_decay(self):
        """LAVIS LinearWarmupStepLRScheduler (optims.py:13-52): linear
        warmup inside epoch 0, clamped at base past warmup_steps, then
        max(min_lr, base * rate**epoch) per epoch."""
        from seed_tpu.train import warmup_step_decay
        s = warmup_step_decay(1.0, warmup_steps=10, steps_per_epoch=100,
                              min_lr=0.05, decay_rate=0.5,
                              warmup_start_lr=0.0)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(5)), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(s(50)), 1.0, rtol=1e-6)   # clamped
        np.testing.assert_allclose(float(s(100)), 0.5, rtol=1e-6)  # epoch 1
        np.testing.assert_allclose(float(s(250)), 0.25, rtol=1e-6) # epoch 2
        np.testing.assert_allclose(float(s(1000)), 0.05, rtol=1e-6)  # floor


class TestLosses:
    def test_cross_entropy_ignores_minus_100(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.asarray([[1, -100, 2, -100]])
        loss = cross_entropy(logits, labels)
        np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)

    def test_info_nce_single_device(self):
        rng = np.random.RandomState(0)
        f = rng.randn(4, 8).astype(np.float32)
        f = f / np.linalg.norm(f, axis=1, keepdims=True)
        # identical features -> low loss; random pairing -> higher
        low = float(info_nce(jnp.asarray(f), jnp.asarray(f),
                             jnp.asarray(0.07)))
        g = rng.randn(4, 8).astype(np.float32)
        g = g / np.linalg.norm(g, axis=1, keepdims=True)
        high = float(info_nce(jnp.asarray(f), jnp.asarray(g),
                              jnp.asarray(0.07)))
        assert low < high

    def test_info_nce_allgather_matches_local(self):
        """Sharded info_nce over 'data' axis == unsharded over global batch."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        rng = np.random.RandomState(0)
        f = rng.randn(8, 16).astype(np.float32)
        g = rng.randn(8, 16).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        want = float(info_nce(jnp.asarray(f), jnp.asarray(g),
                              jnp.asarray(0.07), label_smoothing=0.0))

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        fn = shard_map(
            lambda a, b: jax.lax.pmean(
                info_nce(a, b, jnp.asarray(0.07), axis_name="data",
                         label_smoothing=0.0), "data"),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
        got = float(fn(jnp.asarray(f), jnp.asarray(g)))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestLoRA:
    def test_zero_init_is_identity(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        lora = init_lora(jax.random.PRNGKey(1), params, r=4)
        merged = apply_lora(params, lora)
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(M.forward(params, ids, CFG)),
            np.asarray(M.forward(merged, ids, CFG)), rtol=1e-5, atol=1e-6)

    def test_adapter_changes_output_after_update(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        lora = init_lora(jax.random.PRNGKey(1), params, r=4)
        # nudge B away from zero
        lora["adapters"] = jax.tree.map(lambda x: x + 0.1, lora["adapters"])
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        a = np.asarray(M.forward(params, ids, CFG))
        b = np.asarray(M.forward(apply_lora(params, lora), ids, CFG))
        assert np.abs(a - b).max() > 1e-3

    def test_lora_covers_seven_projections(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        lora = init_lora(jax.random.PRNGKey(1), params, r=4)
        names = set()
        for k in lora["adapters"]:
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_proj", "up_proj", "down_proj"):
                if proj in k:
                    names.add(proj)
        assert len(names) == 7

    def test_split_trainable_roundtrip(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        tr, fr, combine = split_trainable(params)
        back = combine(tr, fr)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), params, back)
        # embed/lm_head trainable; q_proj frozen
        assert tr["embed_tokens"]["embedding"] is not None
        assert tr["layers"]["q_proj"]["kernel"] is None
        assert fr["layers"]["q_proj"]["kernel"] is not None


class TestLearnableImageEmbeddingsOnly:
    """get_learnable_image_embedding_model equivalent (peft_model.py
    :130-163): only the NEW vocab rows of embed_tokens/lm_head update."""

    def test_old_rows_receive_exactly_zero_update(self):
        from seed_tpu.train import learnable_image_embeddings_only
        old_v = CFG.vocab_size - 12          # pretend last 12 rows are new
        opt = learnable_image_embeddings_only(
            adamw(lambda _: 1e-2, weight_decay=0.1), old_v,
            vocab_size=CFG.vocab_size)
        params = M.init_llama(jax.random.PRNGKey(0), CFG, jnp.float32)
        state = opt.init(params)
        grads = jax.grad(loss_fn)(params, make_batch(), None)
        # the batch must actually touch both regions for a fair test
        updates, _ = opt.update(grads, state, params)
        emb = np.asarray(updates["embed_tokens"]["embedding"])
        head = np.asarray(updates["lm_head"]["kernel"])
        assert (emb[:old_v] == 0).all()                      # old rows pinned
        assert np.abs(emb[old_v:CFG.vocab_size]).max() > 0   # new rows move
        assert (emb[CFG.vocab_size:] == 0).all()             # padding pinned
        assert (head[:, :old_v] == 0).all()
        assert np.abs(head[:, old_v:CFG.vocab_size]).max() > 0
        assert (head[:, CFG.vocab_size:] == 0).all()
        # every other leaf passes through the inner optimizer untouched
        assert np.abs(np.asarray(
            updates["layers"]["q_proj"]["kernel"])).max() > 0

    def test_frozen_grads_zeroed_before_clipping(self):
        """The reference hook zeroes frozen-row grads BEFORE the optimizer
        (peft_model.py:130-163), so global-norm clipping and Adam moments
        never see them: huge garbage grads on frozen rows must not change
        the trainable rows' update (advisor r04)."""
        from seed_tpu.train import learnable_image_embeddings_only
        old_v = CFG.vocab_size - 12
        params = M.init_llama(jax.random.PRNGKey(0), CFG, jnp.float32)
        grads = jax.grad(loss_fn)(params, make_batch(), None)

        def poison(g):
            emb = g["embed_tokens"]["embedding"]
            g = jax.tree.map(lambda x: x, g)     # shallow copy
            g["embed_tokens"]["embedding"] = emb.at[:old_v].set(1e6)
            return g

        def run(g):
            opt = learnable_image_embeddings_only(
                adamw(lambda _: 1e-2, clip_norm=1.0), old_v,
                vocab_size=CFG.vocab_size)
            u, _ = opt.update(g, opt.init(params), params)
            return np.asarray(u["embed_tokens"]["embedding"][old_v:])

        np.testing.assert_array_equal(run(grads), run(poison(grads)))

    def test_weight_decay_cannot_shrink_frozen_rows(self):
        """Stronger than the reference's grad hook: decoupled weight decay
        is masked too (the hook zeroes grads but torch AdamW wd would
        still shrink the rows if they were in a decay group)."""
        from seed_tpu.train import learnable_image_embeddings_only
        old_v = CFG.vocab_size - 12
        opt = learnable_image_embeddings_only(
            optax.adamw(1e-2, weight_decay=0.5), old_v)
        params = M.init_llama(jax.random.PRNGKey(0), CFG, jnp.float32)
        state = opt.init(params)
        zeros = jax.tree.map(jnp.zeros_like, params)
        updates, _ = opt.update(zeros, state, params)
        emb = np.asarray(updates["embed_tokens"]["embedding"])
        assert (emb[:old_v] == 0).all()


class TestShardedTraining:
    def test_fsdp_train_step_runs_and_loss_drops(self):
        mesh = make_mesh(dp=1, fsdp=8, tp=1)
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        opt = adamw(cosine_with_floor(1e-3, 2, 50), params=params,
                    weight_decay=0.01)
        tr = Trainer(loss_fn, params, opt, mesh, rules=LLAMA_TP_RULES)
        batch = make_batch()
        m0 = tr.step(batch, jax.random.PRNGKey(0))
        for i in range(8):
            m = tr.step(batch, jax.random.PRNGKey(i))
        assert float(m["loss"]) < float(m0["loss"])
        assert int(tr.state.step) == 9

    def test_fsdp_tp_mesh_matches_single_device_loss(self):
        """Same initial loss under (fsdp=4, tp=2) sharding as unsharded."""
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        batch = make_batch()
        want = float(loss_fn(params, {k: jnp.asarray(v) for k, v in batch.items()},
                             None))

        mesh = make_mesh(dp=1, fsdp=4, tp=2)
        opt = adamw(cosine_with_floor(1e-3, 2, 50), params=params)
        tr = Trainer(loss_fn, params, opt, mesh, rules=LLAMA_TP_RULES)
        m = tr.step(batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(m["loss"]), want, rtol=1e-4)

    def test_grad_accum_equals_big_batch(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        mesh = make_mesh(dp=1, fsdp=8, tp=1)
        opt = optax.sgd(0.1)

        big = make_batch(bs=16, n=8)
        tr1 = Trainer(loss_fn, params, opt, mesh)
        tr1.step(big, jax.random.PRNGKey(0))

        micro = {"input_ids": big["input_ids"].reshape(2, 8, 8)}

        def micro_loss(params, batch, rng):
            return loss_fn(params, batch, rng)

        tr2 = Trainer(micro_loss, params, opt, mesh,
                      cfg=TrainerConfig(grad_accum=2))
        # micro batches shard over devices on the *second* axis
        batch = {"input_ids": micro["input_ids"]}
        import jax as _jax
        from seed_tpu.parallel.mesh import batch_sharding
        # bypass Trainer.step's batch sharding (leading axis is accum steps)
        batch_dev = _jax.tree.map(jnp.asarray, batch)
        tr2.state, m2 = tr2._step(tr2.state, batch_dev, jax.random.PRNGKey(0))

        p1 = jax.tree.leaves(tr1.state.params)
        p2 = jax.tree.leaves(tr2.state.params)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_resume_continues_exactly(self, tmp_path):
        """Kill/restart mid-run: save full state at step 3, rebuild the
        trainer from scratch, restore, run 2 more steps — params and step
        count must match a 5-step uninterrupted run (same data + rng).
        Proves opt_state (AdamW moments) and the schedule step survive."""
        from seed_tpu.utils.checkpoint import CheckpointManager
        mesh = make_mesh(dp=1, fsdp=8, tp=1)
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)

        def make_tr():
            opt = adamw(cosine_with_floor(1e-3, 2, 10), params=params,
                        weight_decay=0.01)
            return Trainer(loss_fn, params, opt, mesh, rules=LLAMA_TP_RULES)

        batches = [make_batch(seed=i) for i in range(5)]
        rngs = [jax.random.PRNGKey(100 + i) for i in range(5)]

        ref = make_tr()
        for b, r in zip(batches, rngs):
            ref.step(b, r)

        mgr = CheckpointManager(str(tmp_path / "state"))
        tr = make_tr()
        for b, r in zip(batches[:3], rngs[:3]):
            tr.step(b, r)
        tr.save_state(mgr)
        del tr

        tr2 = make_tr()                      # cold process restart
        assert tr2.restore_state(mgr) == 3
        assert int(tr2.state.step) == 3
        for b, r in zip(batches[3:], rngs[3:]):
            tr2.step(b, r)

        assert int(tr2.state.step) == int(ref.state.step) == 5
        for a, b in zip(jax.tree.leaves(ref.state.params),
                        jax.tree.leaves(tr2.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        # AdamW second moments survive too (not just params)
        for a, b in zip(jax.tree.leaves(ref.state.opt_state),
                        jax.tree.leaves(tr2.state.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)

    def test_restore_state_empty_dir_returns_none(self, tmp_path):
        from seed_tpu.utils.checkpoint import CheckpointManager
        mesh = make_mesh(dp=1, fsdp=8, tp=1)
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        tr = Trainer(loss_fn, params, optax.sgd(0.1), mesh)
        assert tr.restore_state(CheckpointManager(str(tmp_path))) is None

    def test_param_specs_tp_rules(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        mesh = make_mesh(dp=1, fsdp=4, tp=2)
        specs = make_param_specs(params, mesh, LLAMA_TP_RULES)
        # stacked [L, in, out] kernels: rules align to trailing dims
        assert specs["layers"]["q_proj"]["kernel"] == jax.sharding.PartitionSpec(None, "fsdp", "tensor")
        assert specs["layers"]["o_proj"]["kernel"] == jax.sharding.PartitionSpec(None, "tensor", "fsdp")
        assert specs["norm"]["scale"] == jax.sharding.PartitionSpec()
