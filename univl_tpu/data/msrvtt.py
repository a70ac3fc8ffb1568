"""MSRVTT dataset readers (reference: dataloaders/dataloader_msrvtt_retrieval.py
and dataloader_msrvtt_caption.py).

Files:
  csv:      column video_id (train) or video_id,sentence (JSFUSION test)
  json:     {"videos": [{video_id, url, ...}], "sentences": [{video_id, caption}]}
  features: pickle {video_id: float array [T, video_dim]} (whole video, no
            clip slicing — reference :300-316)
"""

from __future__ import annotations

import csv as _csv
import json
import pickle
from collections import defaultdict
from typing import Dict, List

import numpy as np

from univl_tpu.data import text_encoding as te


def _read_csv(path: str) -> List[dict]:
    with open(path, newline="") as f:
        return list(_csv.DictReader(f))


class _MsrvttBase:
    def __init__(self, features_path, tokenizer, max_words, max_frames, seed=42):
        with open(features_path, "rb") as f:
            self.feature_dict = pickle.load(f)
        self.tokenizer = tokenizer
        self.max_words = max_words
        self.max_frames = max_frames
        self.seed = seed
        self.epoch = 0
        d0 = next(iter(self.feature_dict.values()))
        self.video_dim = int(np.asarray(d0).shape[-1])

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _rng(self, idx):
        # PCG64-backed legacy RandomState: identical API, ~12x cheaper
        # per-sample construction than MT19937 seeding (docs/PERF.md)
        return np.random.RandomState(
            np.random.PCG64((self.seed * 1_000_003 + self.epoch * 97 + idx) % (2**31 - 1))
        )

    def _video(self, video_id, rng, with_mfm=True):
        feats = np.asarray(self.feature_dict[video_id], np.float32)
        video, mask, length = te.pad_video(feats, self.max_frames, self.video_dim)
        out = {"video": video, "video_mask": mask}
        if with_mfm:
            masked, labels = te.mask_frames(video, length, rng)
            out["masked_video"] = masked
            out["video_labels_index"] = labels
        return out


class MsrvttRetrievalEvalDataset(_MsrvttBase):
    """JSFUSION-style test csv with (video_id, sentence) rows."""

    def __init__(self, csv_path, features_path, tokenizer,
                 max_words=48, max_frames=48, seed=42):
        super().__init__(features_path, tokenizer, max_words, max_frames, seed)
        self.rows = _read_csv(csv_path)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        row = self.rows[idx]
        rng = self._rng(idx)
        sample = te.encode_text(row["sentence"], self.tokenizer, self.max_words, rng)
        sample.update(self._video(row["video_id"], rng))
        return sample

    def meta(self, idx):
        return self.rows[idx]["video_id"]


class MsrvttRetrievalTrainDataset(_MsrvttBase):
    """Train set. unfold_sentences expands all ~20 captions/video
    (reference :188-214); otherwise one random caption per video per epoch."""

    def __init__(self, csv_path, json_path, features_path, tokenizer,
                 max_words=48, max_frames=48, unfold_sentences=False, seed=42):
        super().__init__(features_path, tokenizer, max_words, max_frames, seed)
        self.csv_rows = _read_csv(csv_path)
        with open(json_path) as f:
            self.meta_json = json.load(f)
        self.unfold = unfold_sentences
        train_ids = set(r["video_id"] for r in self.csv_rows)
        if self.unfold:
            self.samples = [
                (s["video_id"], s["caption"])
                for s in self.meta_json["sentences"]
                if s["video_id"] in train_ids
            ]
        else:
            self.sentences = defaultdict(list)
            for s in self.meta_json["sentences"]:
                self.sentences[s["video_id"]].append(s["caption"])
            self.samples = [(r["video_id"], None) for r in self.csv_rows]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        video_id, caption = self.samples[idx]
        rng = self._rng(idx)
        if caption is None:
            caps = self.sentences[video_id]
            caption = caps[int(rng.randint(0, len(caps)))]
        sample = te.encode_text(caption, self.tokenizer, self.max_words, rng)
        sample.update(self._video(video_id, rng))
        return sample


# test upper bound is OPEN-ENDED like the reference's video_ids[7010:]
# (dataloader_msrvtt_caption.py:43) — a hard cap would silently drop
# videos past index 10000 from eval on extended jsons
MSRVTT_SPLITS = {"train": (0, 6513), "val": (6513, 7010), "test": (7010, None)}


class MsrvttCaptionDataset(_MsrvttBase):
    """Video-only captioning: encoder text is EMPTY ([CLS][SEP] only,
    reference dataloader_msrvtt_caption.py:82-87); hard-coded video splits
    (:39-44); val/test keep all refs for multi-reference scoring (:49-63)."""

    def __init__(self, csv_path, json_path, features_path, tokenizer,
                 split_type="train", max_words=48, max_frames=48, seed=42):
        super().__init__(features_path, tokenizer, max_words, max_frames, seed)
        with open(json_path) as f:
            self.meta_json = json.load(f)
        video_ids = [v["video_id"] for v in self.meta_json["videos"]]
        lo, hi = MSRVTT_SPLITS[split_type]
        chosen = set(video_ids[lo:hi])
        self.video_sentences: Dict[str, List[str]] = defaultdict(list)
        for s in self.meta_json["sentences"]:
            if s["video_id"] in chosen:
                self.video_sentences[s["video_id"]].append(s["caption"])
        if split_type == "train":
            self.samples = [
                (s["video_id"], s["caption"])
                for s in self.meta_json["sentences"]
                if s["video_id"] in chosen
            ]
        else:
            self.samples = [
                (vid, self.video_sentences[vid][0])
                for vid in video_ids[lo:hi]
                if vid in self.video_sentences
            ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        video_id, caption = self.samples[idx]
        rng = self._rng(idx)
        sample = te.encode_text([], self.tokenizer, self.max_words, rng)  # empty text
        caption_words = self.tokenizer.tokenize(caption)
        sample.update(te.encode_caption(caption_words, self.tokenizer, self.max_words))
        sample.update(self._video(video_id, rng))
        return sample

    def references(self, idx) -> List[str]:
        return self.video_sentences[self.samples[idx][0]]

    def meta(self, idx):
        return self.samples[idx][0]
