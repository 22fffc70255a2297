from . import layers
from .vit import (CLIP_VIT_L, EVA_VIT_G, TINY_VIT, ViTConfig, init_vit,
                  vit_apply)
from .qformer import (QFormerConfig, SEED_QFORMER, TINY_QFORMER, init_qformer,
                      qformer_apply, seed_causal_mask)
from .quantizer import init_codebook, lookup, nearest_codes, quantize
from .seed_tokenizer import (SEED_TOKENIZER, TINY_TOKENIZER,
                             SeedTokenizerConfig, decode_embedding, encode,
                             encode_features, encode_to_embedding,
                             init_seed_tokenizer)

__all__ = [
    "layers",
    "CLIP_VIT_L", "EVA_VIT_G", "TINY_VIT", "ViTConfig", "init_vit", "vit_apply",
    "QFormerConfig", "SEED_QFORMER", "TINY_QFORMER", "init_qformer",
    "qformer_apply", "seed_causal_mask",
    "init_codebook", "lookup", "nearest_codes", "quantize",
    "SEED_TOKENIZER", "TINY_TOKENIZER", "SeedTokenizerConfig",
    "decode_embedding", "encode", "encode_features", "encode_to_embedding",
    "init_seed_tokenizer",
]
