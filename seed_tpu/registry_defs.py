"""Registry registrations: the names configs/*.json resolve through.

Mirrors the reference's hydra ``_target_`` + LAVIS ``@register_model``
composability (SURVEY.md §5) with one mechanism: every constructor a YAML/
JSON config may name is registered here; ``seed_tpu.utils.instantiate``
resolves either these names or dotted import paths.
"""
from __future__ import annotations

from .utils.registry import register


@register("seed_tokenizer")
def make_seed_tokenizer(checkpoint=None, arch="full", dtype="bfloat16",
                        seed=0):
    import jax
    import jax.numpy as jnp
    from .models import SEED_TOKENIZER, TINY_TOKENIZER, init_seed_tokenizer
    from .utils.checkpoint import restore_checkpoint
    cfg = TINY_TOKENIZER if arch == "tiny" else SEED_TOKENIZER
    if checkpoint:
        return restore_checkpoint(checkpoint), cfg
    return init_seed_tokenizer(jax.random.PRNGKey(seed), cfg,
                               getattr(jnp, dtype)), cfg


@register("seed_llama")
def make_seed_llama(model="8b", checkpoint=None, dtype="bfloat16", seed=0,
                    int8=False):
    import jax
    import jax.numpy as jnp
    from .models import llama as M
    from .utils.checkpoint import restore_checkpoint
    cfg = {"8b": M.SEED_LLAMA_8B, "14b": M.SEED_LLAMA_14B,
           "tiny": M.TINY_LLAMA}[model]
    if checkpoint:
        params = restore_checkpoint(checkpoint)
    else:
        params = M.init_llama(jax.random.PRNGKey(seed), cfg,
                              getattr(jnp, dtype))
    if int8:
        from .ops.quantization import quantize_tree
        params = quantize_tree(params)
    return params, cfg


@register("unclip_decoder")
def make_unclip_decoder(checkpoint=None, num_inference_steps=20,
                        guidance_scale=10.0, seed=42):
    import jax
    from .models.unclip import SD21_UNCLIP, UnCLIPDecoder, init_unclip
    from .utils.checkpoint import restore_checkpoint
    params = (restore_checkpoint(checkpoint) if checkpoint
              else init_unclip(jax.random.PRNGKey(0), SD21_UNCLIP))
    return UnCLIPDecoder(params, SD21_UNCLIP,
                         num_inference_steps=num_inference_steps,
                         guidance_scale=guidance_scale, seed=seed)


@register("clip_transform")
def make_clip_transform(image_size=224, dtype="bfloat16"):
    import functools
    import jax.numpy as jnp
    from .ops.preprocess import preprocess
    return functools.partial(preprocess, image_size=image_size,
                             dtype=getattr(jnp, dtype))


@register("caption_datapipe")
def make_caption_datapipe(pattern, batch_size=64, max_length=128,
                          reverse_ratio=0.5, mask_left_label=False,
                          cycle_count=None, seed=0, shuffle=4096):
    import random
    from .data import (batched, build_caption_example, collate,
                       shuffle_buffer, tar_source)
    from .serving import ByteTextTokenizer
    tok = ByteTextTokenizer()
    rng = random.Random(seed)

    def stream():
        for rec in tar_source(pattern, cycle_count=cycle_count, seed=seed):
            ex = build_caption_example(rec, tok, max_length, reverse_ratio,
                                       mask_left_label, rng=rng)
            if ex is not None:
                yield ex

    return batched(shuffle_buffer(stream(), shuffle, seed), batch_size,
                   collate)


@register("multi_datapipe")
def make_multi_datapipe(sources, weights=None, seed=0):
    """Weighted mixture of named datapipes
    (build_multi_datapipes, torchdata_train.py:363-385)."""
    from .data import sample_multiplexer
    from .utils.registry import instantiate
    pipes = {name: instantiate(cfg) for name, cfg in sources.items()}
    return sample_multiplexer(pipes, weights or {}, seed)
