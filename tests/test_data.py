"""Data pipeline: tar reading, corrupt tolerance, multiplexing, builders."""
import io
import os
import pickle
import tarfile

import numpy as np
import pytest

from seed_tpu import BOI_TOKEN_ID, EOI_TOKEN_ID, IMAGE_ID_SHIFT
from seed_tpu.data import (Prefetcher, batched, build_caption_example,
                           build_conversation_example, collate, cycle,
                           decode_pkl_records, group_by_key, iter_tar,
                           sample_multiplexer, shard_for_host, shuffle_buffer,
                           tar_source)
from seed_tpu.data.builders import IGNORE_INDEX
from seed_tpu.serving import ByteTextTokenizer


def write_tar(path, records):
    with tarfile.open(path, "w") as tf:
        for key, rec in records:
            data = pickle.dumps(rec)
            info = tarfile.TarInfo(f"{key}.pkl")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


@pytest.fixture
def shards(tmp_path):
    paths = []
    for s in range(3):
        p = tmp_path / f"shard_{s:03d}.tar"
        write_tar(p, [(f"s{s}_k{i}",
                       {"image_ids": list(range(i, i + 32)),
                        "text": f"caption {s}-{i}"}) for i in range(4)])
        paths.append(str(p))
    return paths


class TestTarPipeline:
    def test_iter_and_decode(self, shards):
        recs = [decode_pkl_records(s) for s in group_by_key(iter_tar(shards[0]))]
        assert len(recs) == 4
        assert recs[0]["text"] == "caption 0-0"
        assert len(recs[0]["image_ids"]) == 32

    def test_corrupt_tar_skipped(self, tmp_path, shards):
        bad = tmp_path / "bad.tar"
        bad.write_bytes(b"this is not a tar file at all........")
        out = list(iter_tar(str(bad)))
        assert out == []  # swallowed, no raise

    def test_tar_source_end_to_end(self, tmp_path, shards):
        stream = tar_source(str(tmp_path / "shard_*.tar"), cycle_count=1,
                            host_index=0, host_count=1)
        recs = list(stream)
        assert len(recs) == 12

    def test_host_sharding_partitions(self, shards):
        a = shard_for_host(shards, 0, 2)
        b = shard_for_host(shards, 1, 2)
        assert sorted(a + b) == sorted(shards)
        assert not set(a) & set(b)

    def test_cycle_reshuffles_per_epoch(self, shards):
        out = list(cycle(shards, count=2, seed=1))
        assert len(out) == 6
        assert sorted(out[:3]) == sorted(shards)

    def test_shuffle_buffer_is_permutation(self):
        out = list(shuffle_buffer(iter(range(100)), size=10, seed=0))
        assert sorted(out) == list(range(100))
        assert out != list(range(100))

    def test_batched_collate(self):
        items = [{"x": np.ones(3) * i} for i in range(7)]
        batches = list(batched(iter(items), 2, collate))
        assert len(batches) == 3  # drop_last
        assert batches[0]["x"].shape == (2, 3)

    def test_multiplexer_weights(self):
        a = iter([{"src": "a"}] * 300)
        b = iter([{"src": "b"}] * 300)
        out = list(sample_multiplexer({"a": a, "b": b},
                                      {"a": 3.0, "b": 1.0}, seed=0))
        counts = {"a": 0, "b": 0}
        for o in out[:200]:
            counts[o["src"]] += 1
        assert counts["a"] > counts["b"] * 1.5

    def test_prefetcher_preserves_order(self):
        out = list(Prefetcher(iter(range(50)), depth=4))
        assert out == list(range(50))


class TestBuilders:
    TOK = ByteTextTokenizer()

    def test_caption_example_layout(self):
        import random
        rec = {"image_ids": list(range(32)), "text": "a cat"}
        ex = build_caption_example(rec, self.TOK, max_length=64,
                                   reverse_ratio=0.0,
                                   rng=random.Random(0))
        ids = ex["input_ids"]
        assert ids[0] == self.TOK.bos_token_id
        b = list(ids).index(BOI_TOKEN_ID)
        assert ids[b + 1] == IMAGE_ID_SHIFT  # code 0
        assert ids[b + 33] == EOI_TOKEN_ID
        # padding masked
        assert ex["attention_mask"][-1] == 0
        assert ex["labels"][-1] == IGNORE_INDEX

    def test_caption_mask_left_label_t2i(self):
        import random
        rec = {"image_ids": list(range(32)), "text": "dog"}
        ex = build_caption_example(rec, self.TOK, max_length=64,
                                   reverse_ratio=0.0, mask_left_label=True,
                                   rng=random.Random(0))
        ids, labels = list(ex["input_ids"]), list(ex["labels"])
        b = ids.index(BOI_TOKEN_ID)
        assert all(l == IGNORE_INDEX for l in labels[:b + 1])
        assert labels[b + 1] == ids[b + 1]  # image tokens supervised

    def test_caption_mask_left_label_i2t(self):
        import random
        rec = {"image_ids": list(range(32)), "text": "dog"}
        ex = build_caption_example(rec, self.TOK, max_length=64,
                                   reverse_ratio=1.0, mask_left_label=True,
                                   rng=random.Random(0))
        ids, labels = list(ex["input_ids"]), list(ex["labels"])
        e = ids.index(EOI_TOKEN_ID)
        assert all(l == IGNORE_INDEX for l in labels[:e + 1])

    def test_empty_caption_filtered(self):
        rec = {"image_ids": list(range(32)), "text": "  .?:  "}
        assert build_caption_example(rec, self.TOK) is None

    def test_conversation_masks_questions(self):
        turns = [{"question": "what?", "answer": "cat",
                  "image_ids": list(range(32))},
                 {"question": "color?", "answer": "black"}]
        ex = build_conversation_example(turns, self.TOK, max_length=256)
        ids, labels = list(ex["input_ids"]), list(ex["labels"])
        assert ids[0] == self.TOK.bos_token_id
        assert labels[0] == IGNORE_INDEX
        # every supervised label equals its input id; question spans ignored
        sup = [(i, l) for i, l in zip(ids, labels) if l != IGNORE_INDEX]
        assert all(i == l for i, l in sup)
        # image tokens are inside a question span -> ignored
        b = ids.index(BOI_TOKEN_ID)
        assert labels[b] == IGNORE_INDEX
        # answers supervised: "cat." appears in labels
        answer_ids = self.TOK.encode("cat.")
        s = "".join(map(chr, [l for l in labels if 0 < l < 300]))
        assert "cat." in "".join(chr(l - 3) for l in labels
                                 if l >= 3 and l < 259)


class TestMoreBuilders:
    TOK = ByteTextTokenizer()

    def test_interleaved_mmc4(self):
        import random
        from seed_tpu.data.builders import build_interleaved_example
        rec = {"image_ids": [None, list(range(32)), None],
               "texts": ["intro text", None, "outro"]}
        ex = build_interleaved_example(rec, self.TOK, max_length=128,
                                       reverse_ratio=0.0,
                                       rng=random.Random(0))
        ids = list(ex["input_ids"])
        b = ids.index(BOI_TOKEN_ID)
        assert ids[b + 33] == EOI_TOKEN_ID
        # full-sequence LM: labels mirror ids on real tokens
        real = ex["attention_mask"].astype(bool)
        np.testing.assert_array_equal(ex["labels"][real], ex["input_ids"][real])

    def test_interleaved_malformed_returns_none(self):
        from seed_tpu.data.builders import build_interleaved_example
        rec = {"image_ids": [list(range(32))], "texts": ["both set"]}
        assert build_interleaved_example(rec, self.TOK) is None

    def test_match_interleaved_sim_filter_and_placement(self):
        import random
        from seed_tpu.data.builders import match_interleaved_images
        img = np.zeros((8, 8, 3), np.uint8)
        rec = {"text_list": ["s0", "s1", "s2"],
               "image_info": [
                   {"image": img, "matched_text_index": 1,
                    "matched_sim": 0.5},
                   {"image": img + 1, "matched_text_index": 2,
                    "matched_sim": 0.1},   # below threshold -> dropped
               ]}
        out = match_interleaved_images(rec, sim_threshold=0.24,
                                       rng=random.Random(3))
        if out is None:   # single surviving image: 50% drop — force keep
            out = match_interleaved_images(rec, sim_threshold=0.24,
                                           single_image_keep=1.0,
                                           rng=random.Random(3))
        assert out is not None
        # the surviving image sits immediately before sentence 1
        slots = [("img" if i is not None else t)
                 for i, t in zip(out["images"], out["texts"])]
        assert slots == ["s0", "img", "s1", "s2"]
        # exactly-one-set contract for build_interleaved_example
        assert all((i is None) != (t is None)
                   for i, t in zip(out["images"], out["texts"]))

    def test_match_interleaved_rejects_imageless_and_caps(self):
        import random
        from seed_tpu.data.builders import match_interleaved_images
        img = np.zeros((4, 4, 3), np.uint8)
        assert match_interleaved_images(
            {"text_list": ["a"], "image_info": []},
            rng=random.Random(0)) is None
        rec = {"text_list": ["a"],
               "image_info": [{"image": img, "matched_text_index": 0,
                               "matched_sim": 0.9}] * 8}
        out = match_interleaved_images(rec, max_images=5,
                                       rng=random.Random(0))
        assert sum(i is not None for i in out["images"]) == 5

    def test_match_interleaved_min_kb_filter(self):
        import io
        import random
        from PIL import Image
        from seed_tpu.data.builders import match_interleaved_images
        buf = io.BytesIO()
        Image.new("RGB", (4, 4)).save(buf, format="PNG")   # tiny: < 10KB
        rec = {"text_list": ["a"],
               "image_info": [{"image_bytes": buf.getvalue(),
                               "matched_text_index": 0,
                               "matched_sim": 0.9}]}
        assert match_interleaved_images(rec, rng=random.Random(0)) is None

    def test_video_flat_frames(self):
        from seed_tpu.data.builders import build_video_example
        rec = {"image_ids": list(range(128)), "answer": "a moving cat"}
        ex = build_video_example(rec, self.TOK, max_length=256)
        ids = list(ex["input_ids"])
        assert ids.count(BOI_TOKEN_ID) == 4 and ids.count(EOI_TOKEN_ID) == 4
        # frames unsupervised, caption supervised
        b = ids.index(BOI_TOKEN_ID)
        assert ex["labels"][b] == IGNORE_INDEX
        sup = [(i, l) for i, l in zip(ids, ex["labels"]) if l != IGNORE_INDEX]
        assert all(i == l for i, l in sup) and len(sup) > 3

    def test_edit_example_supervises_target_only(self):
        from seed_tpu.data.builders import build_edit_example
        rec = {"source_image_ids": list(range(32)),
               "target_image_ids": list(range(32, 64)),
               "instruction": "make it red"}
        ex = build_edit_example(rec, self.TOK, max_length=160)
        ids, labels = list(ex["input_ids"]), list(ex["labels"])
        first_boi = ids.index(BOI_TOKEN_ID)
        second_boi = ids.index(BOI_TOKEN_ID, first_boi + 1)
        assert labels[first_boi + 1] == IGNORE_INDEX      # source masked
        assert labels[second_boi + 1] == ids[second_boi + 1]  # target trained

    def test_quality_filter(self):
        from seed_tpu.data.pipeline import quality_filter
        from PIL import Image
        good = {"image": Image.new("RGB", (256, 256)), "text": "a cat photo"}
        small = {"image": Image.new("RGB", (50, 50)), "text": "a cat"}
        stretched = {"image": Image.new("RGB", (900, 128)), "text": "a cat"}
        empty = {"image": Image.new("RGB", (256, 256)), "text": ""}
        lowsim = {"image": Image.new("RGB", (256, 256)), "text": "x y",
                  "meta": {"similarity": 0.1}}
        assert quality_filter(good)
        assert not quality_filter(small)
        assert not quality_filter(stretched)
        assert not quality_filter(empty)
        assert not quality_filter(lowsim, min_similarity=0.28)


class TestSFTBuilders2:
    TOK = ByteTextTokenizer()

    def test_story_builder(self):
        from seed_tpu.data.builders import build_story_example
        rec = {"story": [
            {"text": "once upon a time", "image_ids": list(range(32))},
            {"text": "then this", "image_ids": list(range(32, 64))}]}
        ex = build_story_example(rec, self.TOK, max_length=256)
        ids, labels = list(ex["input_ids"]), list(ex["labels"])
        first_boi = ids.index(BOI_TOKEN_ID)
        assert labels[first_boi] == IGNORE_INDEX          # context frame
        second_boi = ids.index(BOI_TOKEN_ID, first_boi + 1)
        assert labels[second_boi] == ids[second_boi]      # continuation

    def test_multi_image_qa(self):
        from seed_tpu.data.builders import build_multi_image_qa_example
        rec = {"images_ids": [list(range(32)), list(range(32, 64))],
               "question": "difference?", "answer": "color"}
        ex = build_multi_image_qa_example(rec, self.TOK, max_length=320)
        ids, labels = list(ex["input_ids"]), list(ex["labels"])
        assert ids.count(BOI_TOKEN_ID) == 2
        sup = [l for l in labels if l != IGNORE_INDEX]
        assert len(sup) > 3  # answer + eos supervised
        # images inside the question are NOT supervised
        b = ids.index(BOI_TOKEN_ID)
        assert labels[b + 1] == IGNORE_INDEX

    def test_retrieval_augmented(self):
        from seed_tpu.data.builders import build_retrieval_augmented_example
        rec = {"text": "a red car", "image_ids": list(range(32)),
               "retrieved_texts": ["a blue car", "a fast car"]}
        ex = build_retrieval_augmented_example(rec, self.TOK, max_length=256)
        ids, labels = list(ex["input_ids"]), list(ex["labels"])
        b = ids.index(BOI_TOKEN_ID)
        assert all(l == IGNORE_INDEX for l in labels[:b])   # text prefix
        assert labels[b + 1] == ids[b + 1]                  # image supervised

    def test_resampled_shards(self):
        from seed_tpu.data.pipeline import resampled_shards
        files = ["a", "b", "c"]
        out = list(resampled_shards(files, seed=0, epoch_size=300))
        assert len(out) == 300
        assert set(out) == {"a", "b", "c"}
        # with replacement: some shard repeats within any window of 4
        assert any(out[i] == out[i + 1] or out[i] == out[i + 2]
                   for i in range(50))


class TestSFTBuilders3:
    """The 4 decoders added in round 2 (VERDICT item 7) + full templates."""
    tok = ByteTextTokenizer()

    def test_text_conversation_masks_user_turns(self):
        from seed_tpu.data import build_text_conversation_example
        rec = {"data": ["hi there", "hello!", "how are you", "fine."]}
        ex = build_text_conversation_example(rec, self.tok, max_length=128)
        ids, labels = ex["input_ids"], ex["labels"]
        # assistant spans supervised, user spans -100
        a1 = self.tok.encode("hello!")
        # find the assistant answer inside ids; its labels must equal ids
        pos = None
        for i in range(len(ids) - len(a1)):
            if list(ids[i:i + len(a1)]) == a1:
                pos = i
                break
        assert pos is not None
        assert (labels[pos:pos + len(a1)] == ids[pos:pos + len(a1)]).all()
        assert labels[1] == IGNORE_INDEX  # first user token masked

    def test_text_conversation_system_message_masked(self):
        from seed_tpu.data import build_text_conversation_example
        rec = {"data": ["q", "a"]}
        ex = build_text_conversation_example(
            rec, self.tok, max_length=64, system_message="be nice")
        n_sys = len(self.tok.encode("be nice\n"))
        assert (ex["labels"][1:1 + n_sys] == IGNORE_INDEX).all()

    def test_visual_instruction_multiturn(self):
        from seed_tpu.data import build_visual_instruction_example
        rec = {"image_ids": [list(range(32))],
               "data": ["what is this", "a cat", "sure?", "yes"]}
        ex = build_visual_instruction_example(rec, self.tok, max_length=256)
        ids, labels = ex["input_ids"], ex["labels"]
        assert BOI_TOKEN_ID in ids and EOI_TOKEN_ID in ids
        # image block is in the (masked) question span
        boi = list(ids).index(BOI_TOKEN_ID)
        assert labels[boi] == IGNORE_INDEX
        # answer "a cat." supervised
        a = self.tok.encode("a cat.")
        found = any(list(ids[i:i + len(a)]) == a
                    and (labels[i:i + len(a)] == ids[i:i + len(a)]).all()
                    for i in range(len(ids) - len(a)))
        assert found

    def test_visual_instruction_instruction_format(self):
        from seed_tpu.data import build_visual_instruction_example
        rec = {"image_ids": list(range(32)), "instruction": "describe",
               "inputs": "", "outputs": "a dog"}
        ex = build_visual_instruction_example(rec, self.tok, max_length=256)
        a = self.tok.encode("a dog")
        ids, labels = ex["input_ids"], ex["labels"]
        found = any(list(ids[i:i + len(a)]) == a
                    and (labels[i:i + len(a)] == ids[i:i + len(a)]).all()
                    for i in range(len(ids) - len(a)))
        assert found

    def test_multi_edit_three_turns(self):
        import random as _r
        from seed_tpu.data import build_multi_edit_example
        rec = {"image_ids": list(range(32)) * 4,
               "instruction0": "add a hat", "instruction1": "make it red",
               "instruction2": "remove background"}
        ex = build_multi_edit_example(rec, self.tok, max_length=512,
                                      rng=_r.Random(0))
        ids, labels = ex["input_ids"], ex["labels"]
        # 4 image blocks total: frame0 masked (question), frames 1-3 supervised
        bois = np.nonzero(ids == BOI_TOKEN_ID)[0]
        assert len(bois) == 4
        assert labels[bois[0]] == IGNORE_INDEX
        for b in bois[1:]:
            assert labels[b] == BOI_TOKEN_ID

    def test_video_conversation_multi_qa(self):
        from seed_tpu.data import build_video_conversation_example
        rec = {"image_ids": list(range(32)) * 4,
               "question": "Question: what? Question: why?",
               "answer": "Answer: a thing. Answer: because."}
        ex = build_video_conversation_example(rec, self.tok, max_length=512)
        ids, labels = ex["input_ids"], ex["labels"]
        bois = np.nonzero(ids == BOI_TOKEN_ID)[0]
        assert len(bois) == 4                      # 4 frames, first turn only
        assert all(labels[b] == IGNORE_INDEX for b in bois)
        a = self.tok.encode("a thing.")
        found = any(list(ids[i:i + len(a)]) == a
                    and (labels[i:i + len(a)] == ids[i:i + len(a)]).all()
                    for i in range(len(ids) - len(a)))
        assert found

    def test_twenty_generation_templates(self):
        from seed_tpu.data import GENERATION_PROMPTS, build_caption_example
        assert len(GENERATION_PROMPTS) == 20
        rec = {"image_ids": list(range(32)), "text": "a red fox"}
        ex = build_caption_example(rec, self.tok, max_length=128,
                                   reverse_ratio=0.0, mask_left_label=True,
                                   caption_prompts=GENERATION_PROMPTS)
        assert ex is not None


class TestLmdbIdsSource:
    """CC3M LMDB alt-path reader (MultiModalLLM/src/data/cc3m.py): TSV
    meta + keyed pickled-id store -> caption records; missing keys
    skipped; per-host row sharding."""

    def _store(self):
        import pickle
        return {"img_0": pickle.dumps([1, 2, 3]),
                "img_2": pickle.dumps(list(range(32)))}

    def _meta(self, tmp_path):
        meta = tmp_path / "meta.tsv"
        meta.write_text("a cat\timg_0\n"
                        "dropped (missing key)\timg_1\n"
                        "a dog on grass\timg_2\n")
        return str(meta)

    def test_reads_and_skips_missing(self, tmp_path):
        from seed_tpu.data import lmdb_ids_source
        store = self._store()
        recs = list(lmdb_ids_source(self._meta(tmp_path), "",
                                    get_fn=store.get,
                                    host_index=0, host_count=1))
        assert [r["caption"] for r in recs] == ["a cat", "a dog on grass"]
        assert recs[0]["image_ids"] == [1, 2, 3]
        assert len(recs[1]["image_ids"]) == 32

    def test_feeds_caption_builder(self, tmp_path):
        from seed_tpu.data import build_caption_example, lmdb_ids_source
        from seed_tpu.serving import ByteTextTokenizer
        rec = next(lmdb_ids_source(self._meta(tmp_path), "",
                                   get_fn=self._store().get,
                                   host_index=0, host_count=1))
        rec = {"image_ids": rec["image_ids"], "text": rec["caption"]}
        ex = build_caption_example(rec, ByteTextTokenizer(), max_length=64,
                                   reverse_ratio=0.0)
        assert ex is not None and (ex["input_ids"] >= 0).all()

    def test_host_sharding(self, tmp_path):
        from seed_tpu.data import lmdb_ids_source
        store = self._store()
        r0 = list(lmdb_ids_source(self._meta(tmp_path), "", get_fn=store.get,
                                  host_index=0, host_count=2))
        r1 = list(lmdb_ids_source(self._meta(tmp_path), "", get_fn=store.get,
                                  host_index=1, host_count=2))
        caps = sorted(r["caption"] for r in r0 + r1)
        assert caps == ["a cat", "a dog on grass"]
        assert len(r0) + len(r1) == 2


class TestLazyDecodeDraft:
    """decode_image_text_lazy + resize_draft: the training-stream input
    path (DCT-domain downscale decode). Pixels approximate the eager
    decode+resize; corrupt headers are skipped like the eager decoder."""

    def _shard(self, tmp_path, img_bytes, name="00000.jpg"):
        import io
        import tarfile
        path = tmp_path / "s.tar"
        with tarfile.open(path, "w") as tf:
            info = tarfile.TarInfo(name)
            info.size = len(img_bytes)
            tf.addfile(info, io.BytesIO(img_bytes))
            cap = b"hello"
            info = tarfile.TarInfo(name.rsplit(".", 1)[0] + ".txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))
        return str(path)

    def test_draft_matches_eager_approximately(self, tmp_path):
        import io
        from PIL import Image
        from seed_tpu.data import resize_draft, tar_source
        from seed_tpu.data.pipeline import (decode_image_text,
                                            decode_image_text_lazy)
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 256, (16, 16, 3), np.uint8)
        img = Image.fromarray(arr).resize((512, 512), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)
        path = self._shard(tmp_path, buf.getvalue())

        eager = next(tar_source(path, decode=decode_image_text,
                                host_index=0, host_count=1))
        lazy = next(tar_source(path, decode=decode_image_text_lazy,
                               host_index=0, host_count=1))
        a = np.asarray(eager["image"].resize((224, 224)), np.float32)
        b = np.asarray(resize_draft(lazy["image"], 224), np.float32)
        assert b.shape == (224, 224, 3)
        # draft decodes at a coarser DCT scale: close, not bit-equal
        assert np.abs(a - b).mean() < 8.0
        assert lazy["text"] == "hello"

    def test_corrupt_header_skipped(self, tmp_path):
        from seed_tpu.data import tar_source
        from seed_tpu.data.pipeline import decode_image_text_lazy
        path = self._shard(tmp_path, b"not a jpeg at all")
        recs = list(tar_source(path, decode=decode_image_text_lazy,
                               host_index=0, host_count=1))
        assert recs == []
