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
