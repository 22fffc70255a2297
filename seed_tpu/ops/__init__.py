from .attention import causal_mask, decode_mask, mha, sliced_causal_mask
from .preprocess import CLIP_MEAN, CLIP_STD, center_crop_resize, normalize, preprocess

__all__ = [
    "causal_mask", "decode_mask", "mha", "sliced_causal_mask",
    "CLIP_MEAN", "CLIP_STD", "center_crop_resize", "normalize", "preprocess",
]
