"""Config/registry instantiation (the hydra-_target_ replacement)."""
import io
import pickle
import tarfile

import numpy as np
import pytest

import seed_tpu.registry_defs  # noqa: F401 — registers names
from seed_tpu.utils import instantiate, load_config, lookup


class TestRegistry:
    def test_lookup_registered_and_dotted(self):
        assert lookup("seed_llama") is not None
        fn = lookup("seed_tpu.models.llama.init_llama")
        from seed_tpu.models.llama import init_llama
        assert fn is init_llama

    def test_instantiate_tiny_llama(self):
        params, cfg = instantiate({"_target_": "seed_llama", "model": "tiny",
                                   "dtype": "float32"})
        assert cfg.dim == 64
        assert params["layers"]["q_proj"]["kernel"].shape[0] == cfg.layers

    def test_instantiate_int8(self):
        params, cfg = instantiate({"_target_": "seed_llama", "model": "tiny",
                                   "dtype": "float32", "int8": True})
        assert "kernel_q" in params["layers"]["q_proj"]

    def test_config_file_roundtrip(self, tmp_path):
        import json
        path = tmp_path / "cfg.json"
        path.write_text(json.dumps({"_target_": "seed_llama",
                                    "model": "tiny", "dtype": "float32"}))
        cfg = load_config(str(path))
        params, mcfg = instantiate(cfg)
        assert mcfg.dim == 64

    def test_transform(self):
        import jax.numpy as jnp
        t = instantiate({"_target_": "clip_transform", "image_size": 28,
                         "dtype": "float32"})
        out = t(jnp.zeros((1, 28, 28, 3), jnp.uint8))
        assert out.shape == (1, 28, 28, 3)

    def test_multi_datapipe_mixture(self, tmp_path):
        # two tiny pkl shard sources mixed by weight
        for name in ("a", "b"):
            with tarfile.open(tmp_path / f"{name}_000.tar", "w") as tf:
                for i in range(20):
                    rec = {"image_ids": list(range(32)),
                           "text": f"{name} caption {i}"}
                    data = pickle.dumps(rec)
                    info = tarfile.TarInfo(f"{name}{i}.pkl")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        pipe = instantiate({
            "_target_": "multi_datapipe", "_recursive_": False,
            "weights": {"a": 1.0, "b": 1.0},
            "sources": {
                "a": {"_target_": "caption_datapipe",
                      "pattern": str(tmp_path / "a_*.tar"),
                      "batch_size": 4, "max_length": 64, "shuffle": 8,
                      "cycle_count": 1},
                "b": {"_target_": "caption_datapipe",
                      "pattern": str(tmp_path / "b_*.tar"),
                      "batch_size": 4, "max_length": 64, "shuffle": 8,
                      "cycle_count": 1},
            }})
        batches = list(pipe)
        assert len(batches) >= 8
        assert batches[0]["input_ids"].shape == (4, 64)
