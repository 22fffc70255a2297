"""Augmentation processors, caption cleanup, VQA accuracy."""
import jax
import jax.numpy as jnp
import numpy as np

from seed_tpu.data.builders import clean_caption
from seed_tpu.eval.metrics import vqa_accuracy
from seed_tpu.ops.preprocess import random_resized_crop_flip


class TestAugmentation:
    def test_shapes_and_range(self):
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))
        out = random_resized_crop_flip(jax.random.PRNGKey(1), imgs, 32)
        assert out.shape == (4, 32, 32, 3)
        # normalized output: roughly centered
        assert float(jnp.abs(jnp.mean(out))) < 3.0

    def test_stochastic_across_keys_deterministic_per_key(self):
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        a = random_resized_crop_flip(jax.random.PRNGKey(1), imgs, 32)
        b = random_resized_crop_flip(jax.random.PRNGKey(1), imgs, 32)
        c = random_resized_crop_flip(jax.random.PRNGKey(2), imgs, 32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3

    def test_jits(self):
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 48, 48, 3))
        f = jax.jit(lambda k, x: random_resized_crop_flip(k, x, 32))
        out = f(jax.random.PRNGKey(0), imgs)
        assert out.shape == (2, 32, 32, 3)


class TestCaptionCleanup:
    def test_strips_and_lowercases(self):
        assert clean_caption('A  "Big" Cat!!  ') == "a big cat"

    def test_truncates_words(self):
        cap = clean_caption(" ".join(["w"] * 100), max_words=10)
        assert len(cap.split()) == 10


class TestVQA:
    def test_accuracy(self):
        res = [{"question_id": 1, "answer": "cat"},
               {"question_id": 2, "answer": "Dog."}]
        ann = {1: ["cat", "cat", "cat", "kitten"],
               2: ["cat", "cat", "dog"]}
        m = vqa_accuracy(res, ann)
        # q1: 3 matches -> 1.0 ; q2: 1 match -> 1/3
        np.testing.assert_allclose(m["vqa_accuracy"], (1.0 + 1/3) / 2, rtol=1e-6)


def _natural(rng, h, w):
    """Natural-statistics-ish test image: low-pass filtered noise."""
    from scipy import ndimage as ndi
    x = rng.rand(h, w, 3)
    x = np.clip(ndi.gaussian_filter(x, (6, 6, 0)) * 4.0 % 1.0, 0, 1)
    return (x * 255).astype(np.uint8)


class TestResizeParity:
    """Earning the bicubic claim (SURVEY §7 hard part): measured parity
    of device-side resize vs PIL, on random + natural corpora."""

    SIZES = [(256, 256), (180, 300), (112, 112), (448, 320)]

    def test_resize_bicubic_pil_bit_exact(self):
        """resize_bicubic_pil reproduces PIL BICUBIC uint8 resize
        BIT-EXACTLY (both down- and up-scaling, non-square too)."""
        from PIL import Image
        from seed_tpu.ops.preprocess import resize_bicubic_pil
        rng = np.random.RandomState(0)
        for h, w in self.SIZES:
            for img in (rng.randint(0, 256, (h, w, 3), dtype=np.uint8),
                        _natural(rng, h, w)):
                want = np.asarray(
                    Image.fromarray(img).resize((224, 224), Image.BICUBIC))
                got = np.asarray(resize_bicubic_pil(
                    jnp.asarray(img[None]), (224, 224)))[0]
                np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w}")

    def test_resize_bicubic_float_matches_pil_float(self):
        """The float path matches PIL's continuous (mode-F) bicubic to
        3e-5 — same Keys a=-0.5 kernel, same antialiasing."""
        from PIL import Image
        from seed_tpu.ops.preprocess import resize_bicubic
        rng = np.random.RandomState(1)
        for h, w in self.SIZES[:2]:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            chans = [np.asarray(
                Image.fromarray(img[..., c].astype(np.float32), mode="F")
                .resize((224, 224), Image.BICUBIC), np.float32)
                for c in range(3)]
            want = np.stack(chans, -1) / 255.0
            got = np.asarray(resize_bicubic(
                jnp.asarray(img[None], jnp.float32) / 255.0, (224, 224)))[0]
            assert np.abs(got - want).max() <= 3e-5, (h, w)

    def test_preprocess_pil_exact_token_parity(self):
        """uint8 -> device resize -> encode produces the IDENTICAL token
        ids as host-PIL resize -> encode (the reference pipeline order),
        i.e. resize no longer breaks bit-exact SEED token parity."""
        from PIL import Image
        from seed_tpu.models import TINY_TOKENIZER, encode, init_seed_tokenizer
        from seed_tpu.ops.preprocess import preprocess
        cfg = TINY_TOKENIZER
        S = cfg.vit.image_size
        params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(2)
        raw = np.stack([rng.randint(0, 256, (2 * S, 2 * S, 3), dtype=np.uint8),
                        _natural(rng, 2 * S, 2 * S)])
        # reference order: PIL-resize on host, then normalize on device
        host = np.stack([np.asarray(Image.fromarray(r).resize(
            (S, S), Image.BICUBIC)) for r in raw])
        want = np.asarray(encode(
            params, preprocess(jnp.asarray(host), S, jnp.float32), cfg))
        got = np.asarray(encode(
            params, preprocess(jnp.asarray(raw), S, jnp.float32), cfg))
        np.testing.assert_array_equal(got, want)


class TestKeepRatioTransform:
    """The reference's keep_ratio=True branch (models/transforms.py:8-12):
    torchvision Resize(short side, BILINEAR) + CenterCrop, emulated
    bit-exactly on device (center_crop_resize_pil)."""

    def test_torchvision_size_math(self):
        from seed_tpu.ops.preprocess import torchvision_resize_size
        # int() truncation, not round(): 224*300/180 = 373.33 -> 373
        assert torchvision_resize_size(180, 300, 224) == (224, 373)
        assert torchvision_resize_size(300, 180, 224) == (373, 224)
        # short side already at target -> unchanged
        assert torchvision_resize_size(224, 500, 224) == (224, 500)
        assert torchvision_resize_size(448, 448, 224) == (224, 224)

    def test_torchvision_crop_rounding(self):
        from seed_tpu.ops.preprocess import torchvision_crop_box
        # int(round(.)) banker's rounding on odd differences
        assert torchvision_crop_box(231, 224, 224) == (4, 0)   # round(3.5)=4
        assert torchvision_crop_box(229, 224, 224) == (2, 0)   # round(2.5)=2
        assert torchvision_crop_box(230, 226, 224) == (3, 1)

    def test_bilinear_resize_bit_exact_vs_pil(self):
        from PIL import Image
        from seed_tpu.ops.preprocess import resize_bicubic_pil
        rng = np.random.RandomState(3)
        for h, w in [(256, 256), (180, 300), (112, 112)]:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            want = np.asarray(
                Image.fromarray(img).resize((224, 224), Image.BILINEAR))
            got = np.asarray(resize_bicubic_pil(
                jnp.asarray(img[None]), (224, 224),
                interpolation="bilinear"))[0]
            np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w}")

    def test_center_crop_resize_pil_matches_host_pipeline(self):
        """Device keep_ratio transform == host PIL Resize(short,BILINEAR)
        + torchvision CenterCrop + CLIP normalize, on non-square images."""
        from PIL import Image
        from seed_tpu.ops.preprocess import (center_crop_resize_pil,
                                             normalize,
                                             torchvision_crop_box,
                                             torchvision_resize_size)
        rng = np.random.RandomState(4)
        S = 224
        for h, w in [(300, 180), (180, 300), (448, 320)]:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            nh, nw = torchvision_resize_size(h, w, S)
            host = np.asarray(
                Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
            top, left = torchvision_crop_box(nh, nw, S)
            host = host[top:top + S, left:left + S]
            want = np.asarray(normalize(
                jnp.asarray(host[None], jnp.float32) / 255.0, jnp.float32))
            got = np.asarray(center_crop_resize_pil(
                jnp.asarray(img[None]), S, dtype=jnp.float32))
            np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w}")
