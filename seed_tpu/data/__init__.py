from .builders import (build_caption_example, build_conversation_example,
                       collate, image_token_ids)
from .pipeline import (Prefetcher, batched, cycle, decode_image_text,
                       decode_pkl_records, group_by_key, iter_tar,
                       list_shards, multiplexer_longest, sample_multiplexer,
                       shard_for_host, shuffle_buffer, tar_source)

__all__ = [
    "build_caption_example", "build_conversation_example", "collate",
    "image_token_ids",
    "Prefetcher", "batched", "cycle", "decode_image_text",
    "decode_pkl_records", "group_by_key", "iter_tar", "list_shards",
    "multiplexer_longest", "sample_multiplexer", "shard_for_host",
    "shuffle_buffer", "tar_source",
]
