"""Shared text/caption/video encoding helpers for all dataset readers.

Factors the logic that the reference duplicates across its five dataloaders:
  - CLS/SEP wrapping + truncation + padding to max_words
    (e.g. dataloader_youcook_retrieval.py:70-124)
  - 15% MLM masking with 80/10/10 mask/random/keep and -1 labels on
    CLS/SEP/padding (dataloader_youcook_retrieval.py:76-108)
  - caption encoder ids: input=[CLS]+w, output=w+[SEP], 0-padded
    (dataloader_youcook_caption.py:141-162)
  - 15% frame masking to zeros with frame-index labels
    (dataloader_youcook_retrieval.py:158-174)

All outputs are fixed-shape int32/float32 numpy arrays (TPU-friendly).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from univl_tpu.data.tokenization import WordPieceTokenizer

IGNORE = -1


def clip_and_wrap(words: List[str], max_words: int) -> List[str]:
    """["[CLS]"] + words (truncated to max_words-1 incl CLS) + ["[SEP]"]."""
    words = ["[CLS]"] + words
    if len(words) > max_words - 1:
        words = words[: max_words - 1]
    return words + ["[SEP]"]


def mask_tokens(
    words: List[str], tokenizer: WordPieceTokenizer, rng: np.random.RandomState
) -> Tuple[List[str], List[int]]:
    """MLM masking over a wrapped token list; first/last positions skipped.

    Vectorized draw (one rng call for all positions) with the reference's
    15% x (80 mask / 10 random / 10 keep) split."""
    n = len(words)
    masked = list(words)
    labels = [IGNORE] * n
    if n <= 2:
        return masked, labels
    unk = tokenizer.unk_id
    probs = rng.random_sample(n - 2)
    hit = probs < 0.15
    if not hit.any():
        return masked, labels
    branch = probs[hit] / 0.15
    rand_ids = rng.randint(0, len(tokenizer._vocab_tokens), hit.sum())
    j = 0
    for off in np.nonzero(hit)[0]:
        i = int(off) + 1
        b = branch[j]
        if b < 0.8:
            masked[i] = "[MASK]"
        elif b < 0.9:
            masked[i] = tokenizer._vocab_tokens[int(rand_ids[j])]
        labels[i] = tokenizer.vocab.get(words[i], unk)
        j += 1
    return masked, labels


def encode_text(
    text_or_words,
    tokenizer: WordPieceTokenizer,
    max_words: int,
    rng: Optional[np.random.RandomState] = None,
    with_mlm: bool = True,
) -> Dict[str, np.ndarray]:
    """Tokenize (if str), wrap, MLM-mask, pad. Returns int32 arrays [max_words]."""
    words = (
        tokenizer.tokenize(text_or_words)
        if isinstance(text_or_words, str)
        else list(text_or_words)
    )
    words = clip_and_wrap(words, max_words)

    input_ids = tokenizer.convert_tokens_to_ids(words)
    n = len(input_ids)
    out = {
        "input_ids": _pad(input_ids, max_words, 0),
        "attention_mask": _pad([1] * n, max_words, 0),
        "token_type_ids": np.zeros(max_words, np.int32),
    }
    if with_mlm:
        assert rng is not None
        masked_words, labels = mask_tokens(words, tokenizer, rng)
        out["masked_text"] = _pad(
            tokenizer.convert_tokens_to_ids(masked_words), max_words, 0
        )
        out["token_labels"] = _pad(labels, max_words, IGNORE)
    return out


def encode_caption(
    caption_words: List[str],
    tokenizer: WordPieceTokenizer,
    max_words: int,
    rng: Optional[np.random.RandomState] = None,
    mask_input: bool = False,
) -> Dict[str, np.ndarray]:
    """Decoder teacher-forcing ids. input=[CLS]+w, output=w+[SEP], 0-padded.

    ``mask_input`` applies MLM masking to the decoder INPUT (pretrain does
    this, dataloader_howto100m.py:199-200).
    """
    words = list(caption_words)
    if len(words) > max_words - 1:
        words = words[: max_words - 1]
    input_words = ["[CLS]"] + words
    output_words = words + ["[SEP]"]
    if mask_input:
        assert rng is not None
        input_words, _ = mask_tokens(input_words, tokenizer, rng)
    input_ids = tokenizer.convert_tokens_to_ids(input_words)
    output_ids = tokenizer.convert_tokens_to_ids(output_words)
    n = len(input_ids)
    return {
        "input_caption_ids": _pad(input_ids, max_words, 0),
        "output_caption_ids": _pad(output_ids, max_words, 0),
        "decoder_mask": _pad([1] * n, max_words, 0),
    }


def pad_video(
    video_slice: np.ndarray, max_frames: int, video_dim: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Truncate/zero-pad a [T, D] feature slice to [max_frames, D] + mask."""
    video = np.zeros((max_frames, video_dim), np.float32)
    length = min(video_slice.shape[0], max_frames) if video_slice.size else 0
    if length > 0:
        video[:length] = video_slice[:length]
    mask = np.zeros(max_frames, np.int32)
    mask[:length] = 1
    return video, mask, length


def mask_frames(
    video: np.ndarray, length: int, rng: np.random.RandomState
) -> Tuple[np.ndarray, np.ndarray]:
    """15% frame masking to zeros; labels hold the masked frame index else -1."""
    max_frames = video.shape[0]
    masked = video.copy()
    labels = np.full(max_frames, IGNORE, np.int32)
    if length > 0:
        hit = rng.random_sample(length) < 0.15
        idx = np.nonzero(hit)[0]
        masked[idx] = 0.0
        labels[idx] = idx
    return masked, labels


def _pad(xs: Sequence[int], n: int, fill: int) -> np.ndarray:
    arr = np.full(n, fill, np.int32)
    arr[: len(xs)] = np.asarray(list(xs), np.int32)
    return arr
