"""YouCook2 dataset readers (pickle schema per reference dataloaders/README.md).

  - YoucookRetrievalDataset: (video clip, text) pairs for retrieval
    (reference: dataloaders/dataloader_youcook_retrieval.py)
  - YoucookCaptionDataset: encoder input = ASR transcript (or [CLS][SEP] for
    the video-only variant), decoder target = caption text
    (reference: dataloaders/dataloader_youcook_caption.py)

Data files:
  csv:      columns video_id, feature_file
  data:     pickle {video_id: {start[], end[], text[], transcript[]?}}
  features: pickle {feature_file: float array [T, video_dim]}
"""

from __future__ import annotations

import csv as _csv
import pickle
from typing import Dict, List

import numpy as np

from univl_tpu.data import text_encoding as te
from univl_tpu.data.tokenization import WordPieceTokenizer


def read_csv_ids(csv_path: str):
    with open(csv_path, newline="") as f:
        rows = list(_csv.DictReader(f))
    return [r["video_id"] for r in rows], [r["feature_file"] for r in rows]


class _YoucookBase:
    def __init__(
        self,
        csv_path: str,
        data_path: str,
        features_path: str,
        tokenizer: WordPieceTokenizer,
        feature_framerate: float = 1.0,
        max_words: int = 48,
        max_frames: int = 48,
        seed: int = 42,
    ):
        self.video_ids, self.feature_files = read_csv_ids(csv_path)
        with open(data_path, "rb") as f:
            self.data_dict = pickle.load(f)
        with open(features_path, "rb") as f:
            self.feature_dict = pickle.load(f)
        self.fps = feature_framerate
        self.max_words = max_words
        self.max_frames = max_frames
        self.tokenizer = tokenizer
        self.seed = seed
        self.epoch = 0
        self.vid2file = dict(zip(self.video_ids, self.feature_files))

        self.pairs: List = []
        for vid in self.video_ids:
            n = len(self.data_dict[vid]["start"])
            for sub_id in range(n):
                self.pairs.append((vid, sub_id))

        d0 = next(iter(self.feature_dict.values()))
        self.video_dim = int(np.asarray(d0).shape[-1])

    def __len__(self):
        return len(self.pairs)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _rng(self, idx: int) -> np.random.RandomState:
        # PCG64-backed legacy RandomState: identical API, ~12x cheaper
        # per-sample construction than MT19937 seeding (docs/PERF.md)
        return np.random.RandomState(
            np.random.PCG64((self.seed * 1_000_003 + self.epoch * 97 + idx) % (2**31 - 1))
        )

    def _video(self, vid: str, start: float, end: float, rng, with_mfm=True):
        feats = np.asarray(self.feature_dict[self.vid2file[vid]], np.float32)
        s = int(start * self.fps)
        e = int(end * self.fps) + 1
        video, mask, length = te.pad_video(feats[s:e], self.max_frames, self.video_dim)
        out = {"video": video, "video_mask": mask}
        if with_mfm:
            masked, labels = te.mask_frames(video, length, rng)
            out["masked_video"] = masked
            out["video_labels_index"] = labels
        return out

    def meta(self, idx: int):
        """(video_id, sub_id) for eval bookkeeping."""
        return self.pairs[idx]


class YoucookRetrievalDataset(_YoucookBase):
    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        vid, sub_id = self.pairs[idx]
        d = self.data_dict[vid]
        rng = self._rng(idx)
        sample = te.encode_text(
            str(d["text"][sub_id]), self.tokenizer, self.max_words, rng
        )
        sample.update(
            self._video(vid, float(d["start"][sub_id]), float(d["end"][sub_id]), rng)
        )
        return sample


class YoucookCaptionDataset(_YoucookBase):
    """Encoder text = transcript (reference: dataloader_youcook_caption.py:78);
    decoder target = caption text (:142-162)."""

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        vid, sub_id = self.pairs[idx]
        d = self.data_dict[vid]
        rng = self._rng(idx)
        transcript = str(d.get("transcript", d["text"])[sub_id])
        sample = te.encode_text(transcript, self.tokenizer, self.max_words, rng)
        caption_words = self.tokenizer.tokenize(str(d["text"][sub_id]))
        sample.update(
            te.encode_caption(caption_words, self.tokenizer, self.max_words)
        )
        sample.update(
            self._video(vid, float(d["start"][sub_id]), float(d["end"][sub_id]), rng)
        )
        return sample

    def reference_caption(self, idx: int) -> str:
        vid, sub_id = self.pairs[idx]
        return str(self.data_dict[vid]["text"][sub_id])
