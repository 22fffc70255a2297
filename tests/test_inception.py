"""InceptionV3 pool3 FID feature network vs independent torch oracles.

The reference's FID feature extractor is pytorch-fid's InceptionV3
wrapper over torchvision (MultiModalLLM/src/eval/inception.py). Real
torchvision weights are not available in this container, so parity is
earned the same way as the rest of the repo: hand-written torch oracles
for every distinct numeric ingredient (BN folding, align-corners
resize, the pooling semantics, whole Mixed blocks) with random weights,
plus a full-net shape + converter round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from seed_tpu.convert import convert_inception_torch
from seed_tpu.eval.inception import (BN_EPS, INCEPTION_CONVS,
                                     inception_pool3, init_inception,
                                     resize_bilinear_align_corners)


def _rand_state_dict(seed=0):
    """Random torchvision-style state dict covering every conv."""
    rng = np.random.RandomState(seed)
    sd = {}
    for name, (cin, cout, k, _, _) in INCEPTION_CONVS.items():
        sd[f"{name}.conv.weight"] = rng.randn(cout, cin, *k).astype(
            np.float32) * (2.0 / (cin * k[0] * k[1])) ** 0.5
        sd[f"{name}.bn.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{name}.bn.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_var"] = rng.rand(cout).astype(np.float32) + 0.5
    return sd


def _torch_basic_conv(sd, name, x, stride, pad):
    """BasicConv2d oracle: conv(bias=False) + BatchNorm(eps=1e-3) eval
    + relu, NCHW."""
    w = torch.tensor(sd[f"{name}.conv.weight"])
    y = F.conv2d(x, w, stride=stride, padding=pad)
    y = F.batch_norm(y, torch.tensor(sd[f"{name}.bn.running_mean"]),
                     torch.tensor(sd[f"{name}.bn.running_var"]),
                     torch.tensor(sd[f"{name}.bn.weight"]),
                     torch.tensor(sd[f"{name}.bn.bias"]),
                     training=False, eps=BN_EPS)
    return F.relu(y)


def _oracle_conv(sd, name, x):
    _, _, _, stride, pad = INCEPTION_CONVS[name]
    return _torch_basic_conv(sd, name, x, stride, pad)


class TestIngredients:
    def test_bn_folding_exact(self):
        """Folded (scale, bias) == eval-mode BatchNorm to fp32 precision."""
        sd = _rand_state_dict(1)
        params = convert_inception_torch(sd)
        x = np.random.RandomState(2).randn(2, 8, 8, 3).astype(np.float32)
        name = "Conv2d_1a_3x3"
        got = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(params[name]["kernel"]), (2, 2),
            [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")))
        got = np.maximum(got * params[name]["scale"] + params[name]["bias"], 0)
        want = _oracle_conv(sd, name, torch.tensor(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_align_corners_resize_matches_torch(self):
        x = np.random.RandomState(3).rand(2, 17, 23, 3).astype(np.float32)
        want = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                             size=(299, 299), mode="bilinear",
                             align_corners=True).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(resize_bilinear_align_corners(
            jnp.asarray(x), (299, 299)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_avg_pool_count_include_pad(self):
        from seed_tpu.eval.inception import _avg_pool_3x3s1p1
        x = np.random.RandomState(4).rand(1, 5, 5, 2).astype(np.float32)
        want = F.avg_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 3,
                            stride=1, padding=1).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(_avg_pool_3x3s1p1(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_max_pool_3x3s2(self):
        from seed_tpu.eval.inception import _max_pool_3x3s2
        x = np.random.RandomState(5).rand(1, 9, 9, 2).astype(np.float32)
        want = F.max_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 3,
                            stride=2).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(_max_pool_3x3s2(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestMixedBlocks:
    """Whole-block parity vs torch oracles assembled from torchvision's
    InceptionA/D/E forward order (covers 5x5, 1x7/7x1 asymmetric convs,
    stride-2 reductions, the parallel 2a/2b concat, both pool branches)."""

    def _oracle_a(self, sd, pre, x):
        b1 = _oracle_conv(sd, f"{pre}.branch1x1", x)
        b5 = _oracle_conv(sd, f"{pre}.branch5x5_2",
                          _oracle_conv(sd, f"{pre}.branch5x5_1", x))
        b3 = _oracle_conv(sd, f"{pre}.branch3x3dbl_3", _oracle_conv(
            sd, f"{pre}.branch3x3dbl_2",
            _oracle_conv(sd, f"{pre}.branch3x3dbl_1", x)))
        bp = _oracle_conv(sd, f"{pre}.branch_pool",
                          F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)

    def _oracle_d(self, sd, pre, x):
        b3 = _oracle_conv(sd, f"{pre}.branch3x3_2",
                          _oracle_conv(sd, f"{pre}.branch3x3_1", x))
        b7 = x
        for s in ("branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                  "branch7x7x3_4"):
            b7 = _oracle_conv(sd, f"{pre}.{s}", b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)

    def _oracle_e(self, sd, pre, x):
        b1 = _oracle_conv(sd, f"{pre}.branch1x1", x)
        b3 = _oracle_conv(sd, f"{pre}.branch3x3_1", x)
        b3 = torch.cat([_oracle_conv(sd, f"{pre}.branch3x3_2a", b3),
                        _oracle_conv(sd, f"{pre}.branch3x3_2b", b3)], 1)
        bd = _oracle_conv(sd, f"{pre}.branch3x3dbl_2",
                          _oracle_conv(sd, f"{pre}.branch3x3dbl_1", x))
        bd = torch.cat([_oracle_conv(sd, f"{pre}.branch3x3dbl_3a", bd),
                        _oracle_conv(sd, f"{pre}.branch3x3dbl_3b", bd)], 1)
        bp = _oracle_conv(sd, f"{pre}.branch_pool",
                          F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)

    def _check(self, pre, cin, oracle, seed):
        from seed_tpu.eval import inception as I
        sd = _rand_state_dict(seed)
        params = convert_inception_torch(sd)
        x = np.random.RandomState(seed + 1).rand(2, 9, 9, cin).astype(
            np.float32)
        fn = {"a": I._mixed_a, "d": I._mixed_d, "e": I._mixed_e}[oracle]
        got = np.asarray(fn(params, jnp.asarray(x), pre))
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        want = getattr(self, f"_oracle_{oracle}")(sd, pre, xt)
        want = want.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)

    def test_inception_a(self):
        self._check("Mixed_5b", 192, "a", 10)

    def test_inception_d(self):
        self._check("Mixed_7a", 768, "d", 11)

    def test_inception_e(self):
        self._check("Mixed_7b", 1280, "e", 12)


class TestFullNet:
    def test_shapes_and_converter_roundtrip(self):
        """Converted random state dict runs end-to-end -> [B, 2048];
        converter tree matches init_inception's structure/shapes."""
        params = convert_inception_torch(_rand_state_dict(20))
        ref = init_inception(jax.random.PRNGKey(0))
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(ref)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(ref)[0]):
            assert a.shape == b.shape, (pa, a.shape, b.shape)
        x = jnp.asarray(np.random.RandomState(21).rand(2, 64, 64, 3),
                        jnp.float32)
        feats = np.asarray(jax.jit(inception_pool3)(params, x))
        assert feats.shape == (2, 2048)
        assert np.isfinite(feats).all()
        # features feed the existing pluggable FID
        from seed_tpu.eval.metrics import fid
        f2 = np.asarray(inception_pool3(
            params, jnp.asarray(np.random.RandomState(22).rand(4, 64, 64, 3),
                                jnp.float32)))
        base = np.concatenate([feats, feats + 0.01, f2[:2] * 0.5 + feats[:2]])
        val = fid(base + np.random.RandomState(23).randn(*base.shape) * 0.01,
                  base)
        assert np.isfinite(val)

    def test_fc_head_and_inception_score_from_pixels(self):
        """The IS path (inception_score.py:35-43): trunk -> avg pool ->
        fc -> softmax, converter maps torch fc [1000, 2048] -> [2048,
        1000], and metrics.inception_score runs from the resulting
        probs."""
        rng = np.random.RandomState(40)
        sd = _rand_state_dict(41)
        sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32) * 0.02
        sd["fc.bias"] = rng.randn(1000).astype(np.float32) * 0.01
        params = convert_inception_torch(sd)
        from seed_tpu.eval.inception import inception_pool3 as _p3
        from seed_tpu.eval import inception_logits, inception_probs
        x = jnp.asarray(rng.rand(6, 75, 75, 3) * 2 - 1, jnp.float32)
        logits = np.asarray(inception_logits(params, x, resize_input=False))
        assert logits.shape == (6, 1000)
        # fc is exactly pool @ W^T + b against the UN-normalized trunk
        pool = np.asarray(_p3(params, x, resize_input=False,
                              normalize_input=False))
        want = pool @ sd["fc.weight"].T + sd["fc.bias"]
        np.testing.assert_allclose(logits, want, atol=2e-3, rtol=1e-4)
        probs = np.asarray(inception_probs(params, x, resize_input=False))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        from seed_tpu.eval.metrics import inception_score
        mean, std = inception_score(probs, splits=2)
        assert np.isfinite(mean) and np.isfinite(std) and mean >= 1.0 - 1e-5
        # init_inception(with_fc=True) matches the converted structure
        ref = init_inception(jax.random.PRNGKey(0), with_fc=True)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(ref)

    def test_is_resize_matches_torch_upsample(self):
        """nn.Upsample(299, 'bilinear') (align_corners=False) == jax.image
        .resize half-pixel semantics — the IS wrapper's resize branch."""
        x = np.random.RandomState(42).rand(2, 64, 64, 3).astype(np.float32)
        want = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                             size=(299, 299), mode="bilinear",
                             align_corners=False).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(jax.image.resize(jnp.asarray(x), (2, 299, 299, 3),
                                          "bilinear"))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_input_normalization_formula(self):
        """The wrapper's exact channel remap (inception.py:115-118):
        x*(std/0.5) + (mean-0.5)/0.5 — checked against a literal torch
        transcription."""
        params = convert_inception_torch(_rand_state_dict(30))
        x = np.random.RandomState(31).rand(1, 32, 32, 3).astype(np.float32)
        got = np.asarray(inception_pool3(params, jnp.asarray(x),
                                         resize_input=False))
        xt = torch.tensor(x.transpose(0, 3, 1, 2)).clone()
        xt[:, 0] = xt[:, 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
        xt[:, 1] = xt[:, 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
        xt[:, 2] = xt[:, 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
        want = np.asarray(inception_pool3(
            params, jnp.asarray(xt.numpy().transpose(0, 2, 3, 1)),
            resize_input=False, normalize_input=False))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
