"""Int8 weight-only quantization + conversation state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu import IMG_FLAG
from seed_tpu.models import llama as M
from seed_tpu.models import layers as L
from seed_tpu.ops.quantization import (dequantize_weight, quantize_tree,
                                       quantize_weight, quantized_bytes)
from seed_tpu.serving.conversation import (CONV_SEED_LLAMA, Conversation,
                                           SeparatorStyle)

CFG = M.TINY_LLAMA


class TestQuantization:
    def test_roundtrip_error_small(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        q = quantize_weight(w)
        back = dequantize_weight(q)
        rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.01
        assert q["kernel_q"].dtype == jnp.int8

    def test_linear_quantized_matches_dequantized(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
        b = jax.random.normal(jax.random.PRNGKey(1), (8,))
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
        q = dict(quantize_weight(w), bias=b)
        got = L.linear(q, x)
        want = x @ dequantize_weight(q) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_llama_int8_end_to_end(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        qparams = quantize_tree(params)
        assert "kernel_q" in qparams["layers"]["q_proj"]
        assert "kernel" not in qparams["layers"]["q_proj"]
        # memory shrinks substantially
        assert quantized_bytes(qparams) < 0.6 * quantized_bytes(params)

        ids = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
        lf = np.asarray(M.forward(params, ids, CFG))
        lq = np.asarray(M.forward(qparams, ids, CFG))
        # logits close; argmax preserved on a random model
        assert np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-6) < 0.1
        np.testing.assert_array_equal(lf[..., :CFG.vocab_size].argmax(-1),
                                      lq[..., :CFG.vocab_size].argmax(-1))

    def test_linear_w8a8_matches_emulation(self):
        # the int8 x int8 -> int32 product is exact; verify against an
        # explicit fp emulation of both quantizations
        from seed_tpu.ops.quantization import quantize_acts
        w = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
        b = jax.random.normal(jax.random.PRNGKey(1), (16,))
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 32))
        p = dict(quantize_weight(w), bias=b)
        got = L.linear_w8a8(p, x)
        xq, xs = quantize_acts(x)
        want = (xq.astype(np.float32) @ p["kernel_q"].astype(np.float32)
                ) * xs * np.asarray(p["scale"]) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # and close to the unquantized matmul
        ref = np.asarray(x @ w + b)
        assert np.abs(np.asarray(got) - ref).max() / np.abs(ref).max() < 0.05

    def test_w8a8_tokenizer_token_id_stability(self):
        # VERDICT r1 item 3: int8 encode must keep the VQ indices stable
        from seed_tpu.models.seed_tokenizer import (TINY_TOKENIZER, encode,
                                                    init_seed_tokenizer,
                                                    quantize_for_serving)
        cfg = TINY_TOKENIZER
        params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        imgs = jax.random.uniform(
            jax.random.PRNGKey(1),
            (16, cfg.vit.image_size, cfg.vit.image_size, 3),
            dtype=jnp.float32, minval=-1, maxval=1).astype(jnp.bfloat16)
        ids_bf16 = np.asarray(encode(params, imgs, cfg))
        qparams, qcfg = quantize_for_serving(params, cfg)
        assert qcfg.vit.w8a8 and not cfg.vit.w8a8
        assert "kernel_q" in qparams["vit"]["blocks"]["attn"]["qkv"]
        assert "kernel" in qparams["vit"]["patch_embed"]  # stays bf16
        ids_int8 = np.asarray(encode(qparams, imgs, qcfg))
        agree = (ids_bf16 == ids_int8).mean()
        assert agree >= 0.9, f"token-id agreement {agree:.3f} < 0.9"

    def test_llama_w8a8_decode_path(self):
        # cfg.w8a8 routes every projection through the int8 x int8 MXU dot
        # (weights stream as int8 with no bf16 conversion — the decode
        # HBM-bound lever, PERF.md round 3). Exactness bar: logits within
        # the activation-quantization envelope of fp32, and the full
        # prefill+decode_loop serving path runs under the flag.
        import dataclasses
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        qparams = quantize_tree(params)
        cfg8 = dataclasses.replace(CFG, w8a8=True)

        ids = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
        lf = np.asarray(M.forward(params, ids, CFG))
        l8 = np.asarray(M.forward(qparams, ids, cfg8))
        lw = np.asarray(M.forward(qparams, ids, CFG))
        # engaged (differs from the weight-only path) but bounded error
        assert np.abs(l8 - lw).max() > 0
        assert np.abs(lf - l8).max() / (np.abs(lf).max() + 1e-6) < 0.15

        cache = M.init_cache(cfg8, 1, 32)
        logits, cache = M.prefill(qparams, ids, cache, cfg8)
        last = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks, done, cache, _ = M.decode_loop(
            qparams, last, cache, jax.random.PRNGKey(1), cfg8, steps=4,
            do_sample=False)
        assert toks.shape == (1, 4)
        assert (np.asarray(toks) >= 0).all()

    def test_stacked_kernels_quantize(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        q = quantize_tree(params)
        kq = q["layers"]["gate_proj"]["kernel_q"]
        assert kq.shape == (CFG.layers, CFG.dim, CFG.ffn_dim)
        assert q["layers"]["gate_proj"]["scale"].shape == (CFG.layers, CFG.ffn_dim)


class TestConversation:
    def test_single_style_prompt(self):
        conv = CONV_SEED_LLAMA.copy()
        conv.append("USER", f"what is this? {IMG_FLAG}", images=["B64DATA"])
        req = conv.get_prompt()
        assert req["text"] == f"USER: what is this? {IMG_FLAG}\nASSISTANT:"
        assert req["images"] == ["B64DATA"]

    def test_id_cache_backfill(self):
        conv = CONV_SEED_LLAMA.copy()
        conv.append("USER", f"look {IMG_FLAG}", images=["B64DATA"])
        conv.update_image_ids([[1, 2, 3]])
        req = conv.get_prompt()
        assert req["images"] == [[1, 2, 3]]   # ids reused, not base64

    def test_multi_turn_with_response(self):
        conv = CONV_SEED_LLAMA.copy()
        conv.append("USER", "hi")
        conv.add_response({"text": "hello!", "images": [], "images_ids": []})
        conv.append("USER", "draw a cat")
        req = conv.get_prompt()
        assert req["text"] == ("USER: hi\nASSISTANT: hello!\n"
                               "USER: draw a cat\nASSISTANT:")

    def test_llama2_style(self):
        conv = Conversation(sep_style=SeparatorStyle.LLAMA_2, system="be nice")
        conv.append("user", "hello")
        conv.append("assistant", "hi")
        text = conv.get_prompt()["text"]
        assert text.startswith("<<SYS>>\nbe nice\n<</SYS>>")
        assert "[INST] hello [/INST]" in text

    def test_image_count_mismatch_raises(self):
        conv = CONV_SEED_LLAMA.copy()
        with pytest.raises(AssertionError):
            conv.append("USER", "no flag here", images=["B64"])


class TestW8A8Kernel:
    def test_w8a8_matmul_exact_vs_emulation(self):
        # int8 x int8 -> int32 is exact: the kernel must match the float
        # emulation of the quantized product to fp32 rounding
        from seed_tpu.ops.int8_matmul import w8a8_matmul
        rng = np.random.RandomState(0)
        M, K, N = 300, 256, 384   # ragged M exercises the pad path
        xq = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
        xs = jnp.asarray(np.abs(rng.randn(M, 1)) * 0.01, jnp.float32)
        wq = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
        ws = jnp.asarray(np.abs(rng.randn(N)) * 0.01, jnp.float32)
        got = w8a8_matmul(xq, xs, wq, ws, out_dtype=jnp.float32)
        want = (xq.astype(jnp.float32) @ wq.astype(jnp.float32)) * xs * ws
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_w8a8_matmul_k_tiling(self):
        from seed_tpu.ops.int8_matmul import w8a8_matmul
        rng = np.random.RandomState(1)
        M, K, N = 256, 4096, 128  # 2 K-tiles at bk=2048
        xq = jnp.asarray(rng.randint(-4, 5, (M, K)), jnp.int8)
        xs = jnp.full((M, 1), 0.5, jnp.float32)
        wq = jnp.asarray(rng.randint(-4, 5, (K, N)), jnp.int8)
        ws = jnp.full((N,), 0.25, jnp.float32)
        got = w8a8_matmul(xq, xs, wq, ws, out_dtype=jnp.float32)
        want = (xq.astype(jnp.float32) @ wq.astype(jnp.float32)) * xs * ws
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_w8a8_kernel_matches_linear_w8a8(self):
        # the kernel is not production-dispatched (Mosaic int8 dot is
        # slower than XLA's, see w8a8_matmul docstring) but must stay
        # numerically identical to the XLA W8A8 path
        from seed_tpu.ops.int8_matmul import w8a8_matmul
        from seed_tpu.ops.quantization import quantize_acts, quantize_weight
        w = jax.random.normal(jax.random.PRNGKey(0), (256, 384))
        p = quantize_weight(w)
        x = jax.random.normal(jax.random.PRNGKey(1), (512, 256))
        want = L.linear_w8a8(p, x)
        xq, xs = quantize_acts(x)
        got = w8a8_matmul(xq, xs, p["kernel_q"], p["scale"],
                          out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestInt8Kernel:
    def test_kernel_matches_xla_reference(self):
        from seed_tpu.ops.int8_matmul import int8_matmul
        rng = np.random.RandomState(0)
        M, K, N = 24, 256, 512
        x = jnp.asarray(rng.randn(M, K), jnp.float32)
        wq = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
        scale = jnp.asarray(np.abs(rng.randn(N)) * 0.01, jnp.float32)
        got = int8_matmul(x, wq, scale)
        want = (x @ wq.astype(jnp.float32)) * scale
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-3)

    def test_kernel_k_tiling(self):
        from seed_tpu.ops.int8_matmul import int8_matmul
        rng = np.random.RandomState(1)
        M, K, N = 16, 1024, 512   # 2 K-tiles
        x = jnp.asarray(rng.randn(M, K), jnp.float32)
        wq = jnp.asarray(rng.randint(-8, 9, (K, N)), jnp.int8)
        scale = jnp.full((N,), 0.02, jnp.float32)
        got = int8_matmul(x, wq, scale, block_k=512)
        want = (x @ wq.astype(jnp.float32)) * scale
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-3)

    def test_linear_dispatches_and_matches(self):
        from seed_tpu.ops.quantization import quantize_weight
        w = jax.random.normal(jax.random.PRNGKey(0), (256, 512))
        b = jax.random.normal(jax.random.PRNGKey(1), (512,))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 256))
        q = dict(quantize_weight(w), bias=b)
        got = L.linear(q, x)
        want = x @ (q["kernel_q"].astype(jnp.float32)
                    * q["scale"][None, :]) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-3)
