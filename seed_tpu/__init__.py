"""seed_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the SEED /
SEED-LLaMA multimodal stack.

The reference implementation (AILab-CVC/SEED) is a CUDA/PyTorch stack:
a SEED-2 visual tokenizer (image -> 32 discrete causal tokens), SEED-LLaMA
(LLaMA with an 8192-entry image-token vocabulary) and an unCLIP-Stable-
Diffusion de-tokenizer. This package provides the same capabilities
re-designed TPU-first:

- ``seed_tpu.models``   — pure-functional model definitions (pytree params)
- ``seed_tpu.ops``      — Pallas TPU kernels + fused device-side preprocessing
- ``seed_tpu.parallel`` — mesh construction and sharding/partition specs
- ``seed_tpu.train``    — trainer loop, optimizers, LoRA, losses
- ``seed_tpu.data``     — streaming shard reader + weighted multiplexing
- ``seed_tpu.serving``  — generation engine + HTTP service
- ``seed_tpu.utils``    — config/registry, checkpointing, logging
- ``seed_tpu.convert``  — PyTorch checkpoint -> native param-tree conversion
"""

__version__ = "0.1.0"

BOI_TOKEN = "<img>"
EOI_TOKEN = "</img>"
IMG_TOKEN = "<img_{:05d}>"
IMG_FLAG = "<image>"
NUM_IMG_TOKENS = 32
NUM_IMG_CODES = 8192
# Vocabulary layout matches the reference string-space fusion
# (scripts/seed_llama_inference_8B.py:18-23): text ids 0..31999, image-code
# ids 32000..40191 (code k <-> id 32000+k), then BOI/EOI.
IMAGE_ID_SHIFT = 32000
BOI_TOKEN_ID = 32000 + NUM_IMG_CODES      # 40192
EOI_TOKEN_ID = BOI_TOKEN_ID + 1           # 40193
VOCAB_SIZE = EOI_TOKEN_ID + 1             # 40194
