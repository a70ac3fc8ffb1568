"""HowTo100M pretraining reader (reference: dataloaders/dataloader_howto100m.py).

Key behaviors replicated:
  - transcript-clip expansion to min_time/min_words by greedily merging
    neighbor clips (:230-256)
  - window expansion when a video slice is empty (:258-285)
  - MIL pair grouping: n_pair clips per sample; use_mil enumerates groups,
    sampled_use_mil samples one group per video (:59-98, :339-352)
  - fault tolerance: unreadable/empty feature files yield zero video (:294-308)
  - pretrain_enhance_vmodal: blank ALL input text 15% of the time (:354-358)
  - decoder input MLM-masked during pretrain (:199-200)
  - only_sim (stage one) skips masks/captions (:190)

Per-video features are .npy files under features_path (csv column
feature_file), not a pickle.
"""

from __future__ import annotations

import collections
import os
import threading
from typing import Dict, List, Tuple

import numpy as np

from univl_tpu.data import text_encoding as te
from univl_tpu.data.tokenization import WordPieceTokenizer
from univl_tpu.data.youcook import read_csv_ids


class HowTo100MPretrainDataset:
    def __init__(
        self,
        csv_path: str,
        data_dict: dict,  # caption.pickle contents {vid: {start, end, text}}
        features_path: str,  # dir of per-video .npy
        tokenizer: WordPieceTokenizer,
        feature_framerate: float = 1.0,
        max_words: int = 48,
        max_frames: int = 64,
        min_words: int = 0,
        min_time: float = 10.0,
        n_pair: int = 1,
        with_long_context: bool = True,
        only_sim: bool = False,
        use_mil: bool = False,
        sampled_use_mil: bool = False,
        pretrain_enhance_vmodal: bool = False,
        video_dim: int = 1024,
        seed: int = 42,
    ):
        self.video_ids, self.feature_files = read_csv_ids(csv_path)
        self.data_dict = data_dict
        self.features_path = features_path
        self.tokenizer = tokenizer
        self.fps = feature_framerate
        self.max_words = max_words
        self.max_frames = max_frames
        self.min_words = min_words
        self.min_time = min_time
        self.n_pair = n_pair
        self.with_long_context = with_long_context
        self.only_sim = only_sim
        self.pretrain_enhance_vmodal = pretrain_enhance_vmodal
        self.video_dim = video_dim
        self.seed = seed
        self.epoch = 0

        self.use_mil = use_mil or sampled_use_mil
        self.sampled_use_mil = sampled_use_mil

        # Memory-mapped feature handles, LRU-bounded. A sample needs only a
        # [start, end) slice of the per-video .npy (max_frames rows of a
        # file that is typically videos-minutes long); mmap reads just those
        # pages and caching the handle skips the npy header parse on every
        # sample. Lock only guards the dict (Batcher readers are threads).
        self._feat_cache: "collections.OrderedDict[str, np.ndarray]" = (
            collections.OrderedDict()
        )
        self._feat_cache_max = 32
        self._feat_lock = threading.Lock()
        # tokenized-clip LRU (bounded, on self — NOT inside the
        # caller-owned data_dict, which an unbounded cache would bloat by
        # GB at HowTo100M scale and mutate into any re-pickle of it)
        self._tok_cache: "collections.OrderedDict" = collections.OrderedDict()
        self._tok_cache_max = 4096
        self._tok_lock = threading.Lock()
        self._video_err_count = 0

        self.iter_num = len(self.video_ids)
        if self.use_mil:
            self.vid2idx = {v: i for i, v in enumerate(self.video_ids)}
            self.iter2video_pairs: List[Tuple[str, List[int]]] = []
            self.vid2pairslist: Dict[str, List[List[int]]] = {}
            for vid in self.video_ids:
                n_caption = len(self.data_dict[vid]["start"])
                sub_list = self._group_clips(n_caption)
                for sub in sub_list:
                    self.iter2video_pairs.append((vid, sub))
                self.vid2pairslist[vid] = sub_list
            if not self.sampled_use_mil:
                self.iter_num = len(self.iter2video_pairs)

    def _group_clips(self, n_caption: int) -> List[List[int]]:
        """Partition clip indices into n_pair-sized groups (reference :76-90)."""
        if self.n_pair < 0 or self.n_pair == 1:
            return [[i] for i in range(n_caption)]
        ids = list(range(n_caption))
        if self.n_pair > n_caption:
            ids = (ids * (self.n_pair // n_caption + 1))[: self.n_pair]
        else:
            pad_to = ((n_caption + self.n_pair - 1) // self.n_pair) * self.n_pair
            ids = ids + ids[: pad_to - n_caption]
        return [ids[i : i + self.n_pair] for i in range(0, len(ids), self.n_pair)]

    def __len__(self):
        return self.iter_num

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _rng(self, idx):
        # PCG64-backed legacy RandomState: identical API, ~12x cheaper
        # per-sample construction than MT19937 seeding (docs/PERF.md)
        return np.random.RandomState(
            np.random.PCG64((self.seed * 1_000_003 + self.epoch * 97 + idx) % (2**31 - 1))
        )

    # ------------------------------------------------------------ #
    def _clip_tokens(self, d, ind) -> List[str]:
        """Tokenize one clip's text, cached: neighbor-merge re-tokenizes the
        same clips across samples/epochs (no reference equivalent — the
        reference re-tokenizes every time, dataloader_howto100m.py:236-251).
        LRU on self keyed by the video dict's identity (stable for the
        dataset's lifetime), same bounding/locking discipline as
        _feat_cache."""
        key = (id(d), ind)
        with self._tok_lock:
            toks = self._tok_cache.get(key)
            if toks is not None:
                self._tok_cache.move_to_end(key)
                return toks
        toks = self.tokenizer.tokenize(str(d["text"][ind]))
        with self._tok_lock:
            self._tok_cache[key] = toks
            self._tok_cache.move_to_end(key)
            while len(self._tok_cache) > self._tok_cache_max:
                self._tok_cache.popitem(last=False)
        return toks

    def _single_transcript(self, d, ind) -> Tuple[List[str], float, float]:
        """Greedy neighbor merge until min_words/min_time (reference :230-256)."""
        start = end = ind
        words = list(self._clip_tokens(d, ind))
        diff = d["end"][end] - d["start"][start]
        while self.with_long_context and (
            len(words) < self.min_words or diff < self.min_time
        ):
            if start > 0 and end < len(d["end"]) - 1:
                next_words = self._clip_tokens(d, end + 1)
                prev_words = self._clip_tokens(d, start - 1)
                d1 = d["end"][end + 1] - d["start"][start]
                d2 = d["end"][end] - d["start"][start - 1]
                if (self.min_time > 0 and d2 <= d1) or (
                    self.min_time == 0 and len(next_words) <= len(prev_words)
                ):
                    start -= 1
                    words = list(prev_words) + words
                else:
                    end += 1
                    words = words + list(next_words)
            elif start > 0:
                start -= 1
                words = list(self._clip_tokens(d, start)) + words
            elif end < len(d["end"]) - 1:
                end += 1
                words = words + list(self._clip_tokens(d, end))
            else:
                break
            diff = d["end"][end] - d["start"][start]
        return words, float(d["start"][start]), float(d["end"][end])

    def _expand_video_slice(self, s, e, si, ei, feats) -> np.ndarray:
        """Grow the [start, end) window outward until non-empty (ref :258-285)."""
        start = int(s[si] * self.fps)
        end = int(e[ei] * self.fps) + 1
        if start > end:
            start, end = end, start
        video_slice = feats[start:end]
        expand_left = True
        while len(video_slice) < 1:
            if si == 0 and ei == len(s) - 1:
                break
            if expand_left:
                expand_left = False
                si = si - 1 if si > 0 else si
            else:
                expand_left = True
                ei = ei + 1 if ei < len(e) - 1 else ei
            start = int(s[si] * self.fps)
            end = int(e[ei] * self.fps) + 1
            if start > end:
                start, end = end, start
            video_slice = feats[start:end]
        return video_slice[: self.max_frames]

    def _load_features(self, path: str) -> np.ndarray:
        """mmap'd .npy handle, LRU-cached. Raises on corrupt/missing files
        (the caller's zero-video fault tolerance, reference :294-308).
        Slices assigned into the float32 output batch cast on copy, matching
        the reference's astype(np.float32)."""
        with self._feat_lock:
            feats = self._feat_cache.get(path)
            if feats is not None:
                self._feat_cache.move_to_end(path)
                return feats
        feats = np.load(path, mmap_mode="r")
        if feats.ndim != 2:
            raise ValueError(f"{path}: expected [T, D] features")
        with self._feat_lock:
            self._feat_cache[path] = feats
            self._feat_cache.move_to_end(path)
            while len(self._feat_cache) > self._feat_cache_max:
                self._feat_cache.popitem(last=False)
        return feats

    # ------------------------------------------------------------ #
    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = self._rng(idx)
        if self.sampled_use_mil:
            vid = self.video_ids[idx]
            sub_list = self.vid2pairslist[vid]
            sub_ids = sub_list[int(rng.randint(0, len(sub_list)))]
            file_idx = idx
        elif self.use_mil:
            vid, sub_ids = self.iter2video_pairs[idx]
            file_idx = self.vid2idx[vid]
        else:
            vid = self.video_ids[idx]
            sub_ids = None
            file_idx = idx

        enhance_vmodal = (
            not self.only_sim
            and self.pretrain_enhance_vmodal
            and rng.random_sample() < 0.15
        )

        d = self.data_dict[vid]
        if sub_ids is None:
            n_caption = len(d["start"])
            k = self.n_pair if self.n_pair != -1 else n_caption
            if self.n_pair == -1:
                r_ind = list(range(n_caption))
            elif k <= n_caption:
                r_ind = list(rng.choice(n_caption, k, replace=False))
            else:
                r_ind = list(range(n_caption)) + list(
                    rng.choice(n_caption, k - n_caption, replace=True)
                )
                rng.shuffle(r_ind)
        else:
            r_ind = list(sub_ids)
        k = len(r_ind)

        Lw, Lf, D = self.max_words, self.max_frames, self.video_dim
        out = {
            "input_ids": np.zeros((k, Lw), np.int32),
            "attention_mask": np.zeros((k, Lw), np.int32),
            "token_type_ids": np.zeros((k, Lw), np.int32),
            "video": np.zeros((k, Lf, D), np.float32),
            "video_mask": np.zeros((k, Lf), np.int32),
        }
        if not self.only_sim:
            out.update(
                masked_text=np.zeros((k, Lw), np.int32),
                token_labels=np.full((k, Lw), te.IGNORE, np.int32),
                masked_video=np.zeros((k, Lf, D), np.float32),
                video_labels_index=np.full((k, Lf), te.IGNORE, np.int32),
                input_caption_ids=np.zeros((k, Lw), np.int32),
                output_caption_ids=np.zeros((k, Lw), np.int32),
                decoder_mask=np.zeros((k, Lw), np.int32),
            )

        starts = np.zeros(k)
        ends = np.zeros(k)
        caption_words_all = []
        for i, ind in enumerate(r_ind):
            words, s_, e_ = self._single_transcript(d, int(ind))
            caption_words_all.append(words)
            starts[i], ends[i] = s_, e_
            enc_words = [] if enhance_vmodal else words
            # with_mlm folds the clip_and_wrap + mask_tokens + pad steps
            # this block used to inline (identical outputs and rng draw
            # order: the with_mlm=False branch consumes no rng)
            t = te.encode_text(
                enc_words, self.tokenizer, Lw, rng, with_mlm=not self.only_sim
            )
            out["input_ids"][i] = t["input_ids"]
            out["attention_mask"][i] = t["attention_mask"]

            if not self.only_sim:
                out["masked_text"][i] = t["masked_text"]
                out["token_labels"][i] = t["token_labels"]
                cap = te.encode_caption(
                    words, self.tokenizer, Lw, rng, mask_input=True
                )
                out["input_caption_ids"][i] = cap["input_caption_ids"]
                out["output_caption_ids"][i] = cap["output_caption_ids"]
                out["decoder_mask"][i] = cap["decoder_mask"]

        # Video (fault-tolerant, reference :294-308)
        feature_file = os.path.join(self.features_path, self.feature_files[file_idx])
        lengths = [0] * k
        try:
            feats = self._load_features(feature_file)
            if len(feats) < 1:
                raise ValueError(f"{feature_file} is empty")
            for i in range(k):
                sl = self._expand_video_slice(starts, ends, i, i, feats)
                lengths[i] = len(sl)
                if len(sl) >= 1:
                    out["video"][i, : len(sl)] = sl
        except Exception as e:
            # zero video, zero mask — reference behavior on corrupt files
            # (dataloader_howto100m.py:294-308), but LOGGED: an entirely
            # wrong --features_path would otherwise train on silent
            # all-zero video with no signal at all
            self._video_err_count += 1
            c = self._video_err_count
            if c <= 5 or c % 1000 == 0:
                import logging

                logging.getLogger("univl_tpu.data").warning(
                    "video load failed (#%d): %s: %s: %s",
                    c, feature_file, type(e).__name__, e,
                )
        for i, ln in enumerate(lengths):
            out["video_mask"][i, :ln] = 1

        if not self.only_sim:
            for i in range(k):
                masked, labels = te.mask_frames(out["video"][i], lengths[i], rng)
                out["masked_video"][i] = masked
                out["video_labels_index"][i] = labels
        return out
