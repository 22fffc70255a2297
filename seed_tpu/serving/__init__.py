from .engine import GenerationConfig, LlamaEngine
from .multimodal import (ByteTextTokenizer, HFTextTokenizer, PromptTemplate,
                         Segment, SeedLlamaInterface, image_ids_to_tokens)

__all__ = [
    "GenerationConfig", "LlamaEngine",
    "ByteTextTokenizer", "HFTextTokenizer", "PromptTemplate", "Segment",
    "SeedLlamaInterface", "image_ids_to_tokens",
]
