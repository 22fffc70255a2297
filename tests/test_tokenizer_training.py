"""Stage-1/stage-2 tokenizer training losses + trainer integration."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from seed_tpu.models import TINY_TOKENIZER, init_seed_tokenizer
from seed_tpu.models.qformer import QFormerConfig, init_qformer, qformer_text_apply
from seed_tpu.models.seed_tokenizer import SeedTokenizerConfig
from seed_tpu.models.vit import (CLIP_VIT_H, TINY_VIT, clip_image_embed,
                                 init_clip_vision_projection, init_vit)
from seed_tpu.parallel import make_mesh
from seed_tpu.train import Trainer, adamw, cosine_with_floor
from seed_tpu.train.tokenizer_training import (Stage1Config, Stage2Config,
                                               init_stage1_head, stage1_loss,
                                               stage2_loss, stage2_loss_scalar)

TOK_CFG_TEXT = dataclasses.replace(
    TINY_TOKENIZER,
    qformer=dataclasses.replace(TINY_TOKENIZER.qformer, with_text=True),
    with_recon_blocks=True)


def tok_params(key=0):
    return init_seed_tokenizer(jax.random.PRNGKey(key), TOK_CFG_TEXT)


def batch(bs=4):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.randn(bs, 28, 28, 3), jnp.float32),
        "text_ids": jnp.asarray(rng.randint(1, 60, (bs, 6)), jnp.int32),
        "text_pad": jnp.asarray(np.ones((bs, 6)), jnp.int32),
        "clip_embeds": jnp.asarray(rng.randn(bs, TOK_CFG_TEXT.image_embed_dim),
                                   jnp.float32),
    }


class TestQFormerText:
    def test_text_apply_shapes_and_padding(self):
        cfg = QFormerConfig(hidden=32, layers=2, heads=2, intermediate=64,
                            encoder_width=48, query_len=8, with_text=True,
                            vocab_size=64, max_position=32)
        p = init_qformer(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray([[1, 5, 9, 0, 0]], jnp.int32)
        pad = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
        out = qformer_text_apply(p, ids, cfg, pad)
        assert out.shape == (1, 5, 32)
        # padded positions must not affect the CLS representation
        ids2 = ids.at[0, 4].set(33)
        out2 = qformer_text_apply(p, ids2, cfg, pad)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out2[:, 0]),
                                   rtol=1e-5, atol=1e-6)


class TestStage1:
    def test_loss_runs_and_matched_beats_shuffled(self):
        cfg = Stage1Config(tokenizer=TOK_CFG_TEXT, embed_dim=16)
        params = {"tokenizer": tok_params(),
                  "head": init_stage1_head(jax.random.PRNGKey(1), cfg)}
        b = batch()
        loss = stage1_loss(params, b, jax.random.PRNGKey(0), cfg)
        assert np.isfinite(float(loss))

    def test_frozen_vit_gets_no_grad(self):
        cfg = Stage1Config(tokenizer=TOK_CFG_TEXT, embed_dim=16)
        params = {"tokenizer": tok_params(),
                  "head": init_stage1_head(jax.random.PRNGKey(1), cfg)}
        b = batch()
        grads = jax.grad(lambda p: stage1_loss(p, b, None, cfg))(params)
        vit_g = np.concatenate([np.asarray(x).ravel() for x in
                                jax.tree.leaves(grads["tokenizer"]["vit"])])
        assert np.abs(vit_g).max() == 0.0
        qf_g = np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree.leaves(grads["tokenizer"]["qformer"])])
        assert np.abs(qf_g).max() > 0.0  # Q-Former IS trained in stage 1
        head_g = np.concatenate([np.asarray(x).ravel() for x in
                                 jax.tree.leaves(grads["head"])])
        assert np.abs(head_g).max() > 0.0

    def test_trains_loss_down(self):
        cfg = Stage1Config(tokenizer=TOK_CFG_TEXT, embed_dim=16,
                           label_smoothing=0.0)
        params = {"tokenizer": tok_params(),
                  "head": init_stage1_head(jax.random.PRNGKey(1), cfg)}
        mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        opt = adamw(cosine_with_floor(1e-3, 0, 100), params=params)
        tr = Trainer(lambda p, b, r: stage1_loss(p, b, r, cfg),
                     params, opt, mesh)
        b = batch()
        first = float(tr.step(b, jax.random.PRNGKey(0))["loss"])
        for i in range(12):
            last = float(tr.step(b, jax.random.PRNGKey(i))["loss"])
        assert last < first


class TestStage2:
    def test_loss_components(self):
        cfg = Stage2Config(tokenizer=TOK_CFG_TEXT)
        p = tok_params()
        total, metrics = stage2_loss(p, batch(), None, cfg)
        assert np.isfinite(float(total))
        for k in ("vq", "recon", "distill", "codebook_usage"):
            assert np.isfinite(float(metrics[k])), k
        assert 0 < float(metrics["codebook_usage"]) <= 1.0
        # weighted sum identity
        want = (5.0 * float(metrics["vq"]) + 2.0 * float(metrics["recon"])
                + 0.5 * float(metrics["distill"]))
        np.testing.assert_allclose(float(total), want, rtol=1e-5)

    def test_frozen_towers_no_grad_trainable_parts_do(self):
        cfg = Stage2Config(tokenizer=TOK_CFG_TEXT)
        p = tok_params()
        grads = jax.grad(lambda pp: stage2_loss_scalar(pp, batch(), None, cfg))(p)

        def absmax(tree):
            leaves = [np.abs(np.asarray(x)).max() for x in jax.tree.leaves(tree)]
            return max(leaves) if leaves else 0.0

        assert absmax(grads["vit"]) == 0.0
        assert absmax(grads["qformer"]) == 0.0
        assert absmax(grads["encode_task"]) > 0
        assert absmax(grads["vq"]) > 0
        assert absmax(grads["blocks_image"]) > 0
        assert absmax(grads["distill_image_proj"]) > 0

    def test_reverse_qformer_head_variant(self):
        """use_qformer_image=True (the reference stage-2 TRAINING default,
        blip2_qformer_codebook_all_image.py:84): loss runs, frozen towers
        stay frozen, the reverse q-former gets gradients."""
        cfg_rev = dataclasses.replace(TOK_CFG_TEXT, use_qformer_image=True)
        cfg = Stage2Config(tokenizer=cfg_rev)
        p = init_seed_tokenizer(jax.random.PRNGKey(0), cfg_rev)
        assert "reverse_qformer" in p and "image_down" not in p
        total, metrics = stage2_loss(p, batch(), None, cfg)
        assert np.isfinite(float(total))
        grads = jax.grad(lambda pp: stage2_loss_scalar(pp, batch(), None, cfg))(p)

        def absmax(tree):
            leaves = [np.abs(np.asarray(x)).max() for x in jax.tree.leaves(tree)]
            return max(leaves) if leaves else 0.0

        assert absmax(grads["vit"]) == 0.0
        assert absmax(grads["reverse_qformer"]) > 0
        assert absmax(grads["distill_image_proj"]) > 0

    def test_masked_optimizer_pins_frozen_params(self):
        """AdamW weight decay must NOT shrink frozen towers: with
        masked_trainable, frozen leaves are bit-identical after a step."""
        from seed_tpu.train.optim import masked_trainable
        from seed_tpu.train.tokenizer_training import STAGE2_TRAINABLE
        cfg = Stage2Config(tokenizer=TOK_CFG_TEXT)
        p = tok_params()
        mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        opt = masked_trainable(
            adamw(cosine_with_floor(1e-2, 0, 100), weight_decay=0.1, params=p),
            p, STAGE2_TRAINABLE)
        tr = Trainer(lambda pp, b, r: stage2_loss_scalar(pp, b, r, cfg),
                     p, opt, mesh)
        before_vit = jax.tree.map(np.asarray, p["vit"])
        before_qf = jax.tree.map(np.asarray, p["qformer"])
        tr.step(batch(), jax.random.PRNGKey(0))
        after = tr.state.params
        jax.tree.map(np.testing.assert_array_equal, before_vit,
                     jax.tree.map(np.asarray, after["vit"]))
        jax.tree.map(np.testing.assert_array_equal, before_qf,
                     jax.tree.map(np.asarray, after["qformer"]))
        # trainable parts DID move
        moved = np.abs(np.asarray(after["vq"]["codebook"])
                       - np.asarray(p["vq"]["codebook"])).max()
        assert moved > 0

    def test_distill_loss_decreases_with_training(self):
        cfg = Stage2Config(tokenizer=TOK_CFG_TEXT)
        p = tok_params()
        mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        opt = adamw(cosine_with_floor(1e-3, 0, 100), params=p)
        tr = Trainer(lambda pp, b, r: stage2_loss_scalar(pp, b, r, cfg),
                     p, opt, mesh)
        b = batch()
        first = float(tr.step(b, jax.random.PRNGKey(0))["loss"])
        for i in range(10):
            last = float(tr.step(b, jax.random.PRNGKey(i))["loss"])
        assert last < first


class TestCLIPVisionEmbed:
    def test_shapes(self):
        vit_p = init_vit(jax.random.PRNGKey(0), TINY_VIT)
        head = init_clip_vision_projection(jax.random.PRNGKey(1), TINY_VIT,
                                           proj_dim=16)
        img = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 3))
        emb = clip_image_embed(vit_p, head, img, TINY_VIT)
        assert emb.shape == (2, 16)


class TestStage1Extras:
    CFG1 = Stage1Config(tokenizer=TOK_CFG_TEXT, embed_dim=16)

    def test_itm_loss_runs_and_separates(self):
        import jax
        from seed_tpu.train.tokenizer_training import (init_itm_head,
                                                       stage1_itm_loss)
        p = tok_params()
        head = init_itm_head(jax.random.PRNGKey(5), self.CFG1)
        b = batch()
        loss = stage1_itm_loss(p, head, b["images"], b["text_ids"],
                               b["text_pad"], self.CFG1, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # gradient flows to the head and qformer
        g = jax.grad(lambda h: stage1_itm_loss(
            p, h, b["images"], b["text_ids"], b["text_pad"], self.CFG1,
            None))(head)
        assert np.abs(np.asarray(g["kernel"])).max() > 0

    def test_itm_hard_negatives_sim_weighted(self):
        """With sim_feats the ITM negatives are similarity-sampled in-graph;
        loss stays finite, is jittable, and differs from the rolled path."""
        import jax
        from seed_tpu.train.tokenizer_training import (init_itm_head,
                                                       stage1_features,
                                                       stage1_itm_loss)
        p = tok_params()
        s1h = init_stage1_head(jax.random.PRNGKey(1), self.CFG1)
        head = init_itm_head(jax.random.PRNGKey(5), self.CFG1)
        b = batch()
        img_f, txt_f = stage1_features(p, s1h, b["images"], b["text_ids"],
                                       b["text_pad"], self.CFG1)
        loss_fn = jax.jit(lambda r: stage1_itm_loss(
            p, head, b["images"], b["text_ids"], b["text_pad"], self.CFG1,
            r, sim_feats=(img_f, txt_f)))
        hard = float(loss_fn(jax.random.PRNGKey(0)))
        assert np.isfinite(hard)
        rolled = float(stage1_itm_loss(
            p, head, b["images"], b["text_ids"], b["text_pad"], self.CFG1,
            jax.random.PRNGKey(0)))
        assert np.isfinite(rolled)

    def test_stage1_total_loss_joint(self):
        """ITC + ITM + LM joint objective: finite, metrics exposed, grads
        flow to the q-former but not the frozen ViT."""
        import jax
        from seed_tpu.models.qformer import init_lm_head
        from seed_tpu.train.tokenizer_training import (init_itm_head,
                                                       stage1_total_loss)
        params = {"tokenizer": tok_params(),
                  "head": init_stage1_head(jax.random.PRNGKey(1), self.CFG1),
                  "itm_head": init_itm_head(jax.random.PRNGKey(2), self.CFG1),
                  "lm_head": init_lm_head(jax.random.PRNGKey(3),
                                          TOK_CFG_TEXT.qformer)}
        b = batch()
        (loss, metrics) = stage1_total_loss(params, b, jax.random.PRNGKey(0),
                                            self.CFG1)
        assert np.isfinite(float(loss))
        assert set(metrics) == {"itc", "itm", "lm"}
        g = jax.grad(lambda p: stage1_total_loss(
            p, b, jax.random.PRNGKey(0), self.CFG1)[0])(params)
        vit_g = max(np.abs(np.asarray(x)).max()
                    for x in jax.tree.leaves(g["tokenizer"]["vit"]["blocks"]))
        qf_g = max(np.abs(np.asarray(x)).max()
                   for x in jax.tree.leaves(g["tokenizer"]["qformer"]))
        assert vit_g == 0.0
        assert qf_g > 0.0

    def test_caption_loss_runs(self):
        import jax
        from seed_tpu.models.qformer import init_lm_head
        from seed_tpu.train.tokenizer_training import stage1_caption_loss
        p = tok_params()
        head = init_lm_head(jax.random.PRNGKey(6), TOK_CFG_TEXT.qformer)
        b = batch()
        loss = stage1_caption_loss(p, head, b["images"], b["text_ids"],
                                   b["text_pad"], self.CFG1)
        assert np.isfinite(float(loss))

    def test_caption_mask_semantics(self):
        """Queries must not see text; text sees queries + causal self."""
        from seed_tpu.models.qformer import seed_caption_mask
        m = np.asarray(seed_caption_mask(3, 4))[0, 0]
        assert m[0, 0] and not m[0, 1]        # query causal
        assert not m[0, 3]                     # query -/-> text
        assert m[4, 0] and m[4, 3] and m[4, 4]  # text -> queries + self
        assert not m[4, 5]                     # text causal


class TestCaptionGeneration:
    def test_greedy_caption_generation(self):
        import jax
        import jax.numpy as jnp
        from seed_tpu.models.qformer import (init_lm_head,
                                             qformer_generate_caption)
        cfg = TOK_CFG_TEXT.qformer
        p = tok_params()["qformer"]
        head = init_lm_head(jax.random.PRNGKey(6), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (2, 5, cfg.encoder_width))
        out = np.asarray(qformer_generate_caption(
            p, head, img, cfg, bos_id=1, eos_id=2, max_len=8))
        assert out.shape == (2, 8)
        assert (out[:, 0] == 1).all()
        assert out.dtype == np.int32
        # deterministic
        out2 = np.asarray(qformer_generate_caption(
            p, head, img, cfg, bos_id=1, eos_id=2, max_len=8))
        np.testing.assert_array_equal(out, out2)
        # conditioned on the image: different image -> different caption
        img2 = img * 3.0 + 1.0
        out3 = np.asarray(qformer_generate_caption(
            p, head, img2, cfg, bos_id=1, eos_id=2, max_len=8))
        assert not (out == out3).all()

    def test_cached_generation_matches_recompute(self):
        """The banked-prefix KV cache path must reproduce the recompute
        path token-for-token (same greedy math, O(1) work per step)."""
        import jax
        from seed_tpu.models.qformer import (init_lm_head,
                                             qformer_generate_caption,
                                             qformer_generate_caption_cached)
        cfg = TOK_CFG_TEXT.qformer
        p = tok_params()["qformer"]
        head = init_lm_head(jax.random.PRNGKey(6), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (3, 5, cfg.encoder_width))
        want = np.asarray(qformer_generate_caption(
            p, head, img, cfg, bos_id=1, eos_id=2, max_len=10))
        got = np.asarray(qformer_generate_caption_cached(
            p, head, img, cfg, bos_id=1, eos_id=2, max_len=10))
        np.testing.assert_array_equal(want, got)

    def test_cached_step_hidden_matches_joint_forward(self):
        """Per-position hidden parity: decode step t of the cached path ==
        row Q+t of the joint qformer_caption_apply forward."""
        import jax
        import jax.numpy as jnp
        from seed_tpu.models.qformer import (qformer_caption_apply,
                                             qformer_caption_prefix,
                                             qformer_caption_step)
        cfg = TOK_CFG_TEXT.qformer
        p = tok_params()["qformer"]
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (2, 5, cfg.encoder_width))
        T = 6
        text = jax.random.randint(jax.random.PRNGKey(2), (2, T), 0,
                                  cfg.vocab_size)
        want = np.asarray(qformer_caption_apply(p, img, text, cfg))
        cache = qformer_caption_prefix(p, img, cfg, T)
        for t in range(T):
            h, cache = qformer_caption_step(p, cache, text[:, t],
                                            jnp.int32(t), cfg)
            np.testing.assert_allclose(np.asarray(h), want[:, t],
                                       rtol=2e-5, atol=2e-5)
