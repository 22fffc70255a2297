from .metrics import (bleu, caption_metrics, cider_d, fid, frechet_distance,
                      gaussian_stats, inception_score)

__all__ = ["bleu", "caption_metrics", "cider_d", "fid", "frechet_distance",
           "gaussian_stats", "inception_score"]
