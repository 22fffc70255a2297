from .builders import (GENERATION_PROMPTS, build_caption_example,
                       build_conversation_example, build_edit_example,
                       build_interleaved_example, build_multi_edit_example,
                       build_multi_image_qa_example,
                       build_retrieval_augmented_example, build_story_example,
                       build_text_conversation_example, build_video_example,
                       build_video_conversation_example,
                       build_visual_instruction_example, collate,
                       image_token_ids)
from .pipeline import (Prefetcher, batched, cycle, decode_image_text,
                       decode_pkl_records, group_by_key, iter_tar,
                       list_shards, multiplexer_longest, sample_multiplexer,
                       shard_for_host, shuffle_buffer, tar_source)

__all__ = [
    "GENERATION_PROMPTS",
    "build_caption_example", "build_conversation_example",
    "build_edit_example", "build_interleaved_example",
    "build_multi_edit_example", "build_multi_image_qa_example",
    "build_retrieval_augmented_example", "build_story_example",
    "build_text_conversation_example", "build_video_example",
    "build_video_conversation_example", "build_visual_instruction_example",
    "collate", "image_token_ids",
    "Prefetcher", "batched", "cycle", "decode_image_text",
    "decode_pkl_records", "group_by_key", "iter_tar", "list_shards",
    "multiplexer_longest", "sample_multiplexer", "shard_for_host",
    "shuffle_buffer", "tar_source",
]
