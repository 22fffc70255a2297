#!/usr/bin/env python
"""Tokenize + de-tokenize one image (parity with
reference scripts/seed_tokenizer_inference.py).

  python scripts/seed_tokenizer_inference.py --image images/cat.jpg \
      --tokenizer-ckpt ckpts/tokenizer --diffusion-ckpt ckpts/unclip \
      --save out.jpg
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--tokenizer-ckpt", default=None)
    ap.add_argument("--diffusion-ckpt", default=None)
    ap.add_argument("--save", default="reconstruction.jpg")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from seed_tpu.models import (SEED_TOKENIZER, decode_embedding, encode,
                                 init_seed_tokenizer)
    from seed_tpu.models.unclip import SD21_UNCLIP, UnCLIPDecoder, init_unclip
    from seed_tpu.ops.preprocess import preprocess
    from seed_tpu.utils.checkpoint import restore_checkpoint

    cfg = SEED_TOKENIZER
    params = (restore_checkpoint(args.tokenizer_ckpt) if args.tokenizer_ckpt
              else init_seed_tokenizer(jax.random.PRNGKey(0), cfg, jnp.bfloat16))

    img = Image.open(args.image).convert("RGB")
    raw = jnp.asarray(np.asarray(img, np.uint8))[None]

    ids = jax.jit(lambda p, x: encode(p, preprocess(x, 224, jnp.bfloat16), cfg))(
        params, raw)
    print("token ids:", np.asarray(ids)[0].tolist())

    emb = jax.jit(lambda p, i: decode_embedding(p, i, cfg))(params, ids)
    print("unCLIP embedding:", emb.shape)

    if args.diffusion_ckpt:
        unclip = restore_checkpoint(args.diffusion_ckpt)
        dec = UnCLIPDecoder(unclip, SD21_UNCLIP)
        images = dec.generate(np.asarray(emb))
        out = (images[0] * 255).astype(np.uint8)
        Image.fromarray(out).save(args.save)
        print("saved", args.save)
    else:
        print("no --diffusion-ckpt: skipping pixel reconstruction")


if __name__ == "__main__":
    main()
