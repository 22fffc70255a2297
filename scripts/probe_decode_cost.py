#!/usr/bin/env python
"""Attribute the 8B int8 decode step cost (35.5 ms vs ~8.2 ms weight-bytes
roofline at B=32 S=192).

Method: time M.decode_loop at several layer counts with otherwise-8B
geometry and fit  ms/step = fixed + per_layer * L.  The per-layer slope
isolates the weight-streaming + attention cost; the intercept is
sampling + embed + lm_head + loop overhead. A bf16-weights variant at
L=8 separates "int8 dequant materializes a bf16 weight copy" (slope
would be ~3x the int8 byte roofline) from plain bandwidth.
"""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from seed_tpu.models import llama as M
from seed_tpu.ops.quantization import quantize_tree

B, PROMPT, STEPS, S = 32, 32, 64, 192


def build_params(cfg, int8):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        def mk(k):
            p = M.init_llama(k, cfg, jnp.bfloat16)
            return quantize_tree(p) if int8 else p
        shapes = jax.eval_shape(mk, jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)

        def fill(s):
            if s.dtype == jnp.int8:
                return jnp.asarray(rng.randint(-127, 128, size=s.shape,
                                               dtype=np.int8))
            return jnp.asarray(np.full(s.shape, 0.01, np.float32), s.dtype)

        return jax.tree.map(fill, shapes)


def step_ms(cfg, int8):
    params = jax.device_put(build_params(cfg, int8), jax.devices()[0])
    loop = jax.jit(functools.partial(
        M.decode_loop, cfg=cfg, steps=STEPS, temperature=1.0, top_p=0.0,
        eos_id=-1), donate_argnums=(2,))
    cache = M.init_cache(cfg, B, S)
    cache = cache._replace(
        valid=cache.valid.at[:, :PROMPT].set(True),
        index=jnp.asarray(PROMPT, jnp.int32))
    tok = jnp.ones((B,), jnp.int32)
    key = jax.random.PRNGKey(0)
    toks, _, cache, key = loop(params, tok, cache, key)
    np.asarray(toks[:, -1])
    tok = toks[:, -1]
    t0 = time.perf_counter()
    toks, _, cache, key = loop(params, tok, cache, key)
    np.asarray(toks[:, -1])
    dt = time.perf_counter() - t0
    del params, cache
    return dt / STEPS * 1e3


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    base = M.SEED_LLAMA_8B
    results = {}
    import os as _os
    _raw = _os.environ.get("PROBE_LAYERS", "32,16,8")
    layer_list = tuple(int(x) for x in _raw.split(",")) if _raw else ()
    for L in layer_list:
        cfg = dataclasses.replace(base, layers=L)
        ms = step_ms(cfg, int8=True)
        results[L] = ms
        print(f"int8 L={L:2d}: {ms:6.2f} ms/step", flush=True)
    if len(results) > 1:
        # least-squares fit fixed + slope*L
        Ls = np.array(sorted(results))
        ys = np.array([results[l] for l in Ls])
        A = np.stack([np.ones_like(Ls), Ls], 1).astype(float)
        (fixed, slope), *_ = np.linalg.lstsq(A, ys, rcond=None)
        print(f"fit: fixed {fixed:.2f} ms + {slope:.3f} ms/layer "
              f"(32L -> {fixed + 32*slope:.1f} ms)", flush=True)
    int8_bytes_per_layer = 202e6   # 4 attn + 3 mlp matmuls of the 8B
    print(f"per-layer roofline: int8 weights {int8_bytes_per_layer/819e9*1e3:.3f} ms"
          f" + cache {2*B*S*4096*2*2/32/819e9*1e3:.3f} ms", flush=True)
    if _os.environ.get("PROBE_BF16"):
        Lb = int(_os.environ["PROBE_BF16"])
        ms_bf16 = step_ms(dataclasses.replace(base, layers=Lb), int8=False)
        print(f"bf16 L={Lb}: {ms_bf16:6.2f} ms/step", flush=True)
