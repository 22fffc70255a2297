from .caption_eval import evaluate_captions, generate_images_for_fid
from .eval_readers import (CAPTION_PROMPT, VQA_PROMPT_SUFFIX,
                           caption_eval_stream, edit_eval_stream,
                           evaluate_vqa, iter_json_records,
                           load_video_frames, sample_frames,
                           video_eval_stream, vqa_eval_stream)
from .inception import (INCEPTION_CONVS, inception_logits, inception_pool3,
                        inception_probs, init_inception,
                        resize_bilinear_align_corners)
from .metrics import (bleu, caption_metrics, cider_d, fid, frechet_distance,
                      gaussian_stats, inception_score, vqa_accuracy)

__all__ = ["INCEPTION_CONVS", "inception_logits", "inception_pool3",
           "inception_probs", "init_inception",
           "resize_bilinear_align_corners",
           "bleu", "caption_metrics", "cider_d", "fid", "frechet_distance",
           "gaussian_stats", "inception_score", "vqa_accuracy",
           "evaluate_captions", "generate_images_for_fid",
           "CAPTION_PROMPT", "VQA_PROMPT_SUFFIX",
           "caption_eval_stream", "edit_eval_stream", "evaluate_vqa",
           "iter_json_records", "load_video_frames", "sample_frames",
           "video_eval_stream", "vqa_eval_stream"]
