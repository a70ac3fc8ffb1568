"""Batched captioning service over raw S3D feature clips.

Serving front-end for the KV-cache beam decoder (evals/fast_decoder.py):
accepts ragged request lists, pads them into the generator's fixed batch
shape, and decodes with or without transcripts:

  - with transcripts: the YouCook2 caption setting (encoder text =
    transcript, reference dataloader_youcook_caption.py:78)
  - without: the MSRVTT video-only setting (encoder text = [CLS][SEP],
    reference dataloader_msrvtt_caption.py:82-87)
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from univl_tpu.data.text_encoding import encode_text, pad_video
from univl_tpu.evals.beam import CaptionGenerator
from univl_tpu.models.univl import UniVL


def resolve_serving_fused_decode(
    explicit: Optional[bool], backend: str, env: str
) -> bool:
    """Serving-side default for the fused decode attention kernel.

    Unlike the eval drivers (whose default decoder keeps the
    bit-identical-to-full-prefix invariant so published metrics stay
    exactly reproducible), serving only needs caption QUALITY, and the
    fused path matches the unfused one to f32 tolerance (teacher-forced
    64-step trajectory: max |logp| diff 1.2e-2, docs/PERF.md). It is
    measurably faster on TPU — decode ceiling 130 vs 164 ms/batch16
    (1.26x), bucket-32 floor 30.1 vs 32.0 ms (1.06x) — so it is the
    serving DEFAULT there. Precedence: an explicit argument (e.g.
    --no-fused_decode from cli/serve.py) wins in both directions; then
    the UNIVL_TPU_FUSED_DECODE env var (three-state: '0'/'false'/'off'/
    'no' disables, any other non-empty value enables, unset defers); then
    on-by-default on the TPU backend, off elsewhere (off-TPU the kernel
    runs in Pallas interpret mode — correct but far too slow to default
    on).
    """
    from univl_tpu.evals.beam import fused_decode_env_state

    if explicit is not None:
        return bool(explicit)
    env_state = fused_decode_env_state(env)
    if env_state is not None:
        return env_state
    return backend == "tpu"


class CaptionService:
    """``batch_size`` sizes the compiled decode program (requests are
    padded/coalesced up to it). Throughput scales sublinearly in latency:
    the measured floor decode runs 1060/1351/1616 clips/s at B=16/32/64
    (docs/PERF.md round-5 batch-scaling table), so deployments with
    latency budgets >= ~40 ms per coalesced batch should size toward
    64; the 16 default favors latency."""

    def __init__(
        self,
        model: UniVL,
        params,
        tokenizer,
        beam_size: int = 5,
        max_len: Optional[int] = None,
        batch_size: int = 16,
        mesh=None,
        fused_decode: Optional[bool] = None,
        fused_vocab: Optional[bool] = None,
    ):
        cfg = model.cfg
        self.tokenizer = tokenizer
        self.max_words = cfg.max_words
        self.max_frames = cfg.max_frames
        self.video_dim = cfg.video_dim
        self.batch_size = batch_size
        import jax

        fused_decode = resolve_serving_fused_decode(
            fused_decode, jax.default_backend(),
            os.environ.get("UNIVL_TPU_FUSED_DECODE", ""),
        )
        self.fused_decode = fused_decode
        # same serving-side default policy as fused_decode: quality-only
        # tolerance contract, measured faster on TPU (docs/PERF.md round 4)
        fused_vocab = resolve_serving_fused_decode(
            fused_vocab, jax.default_backend(),
            os.environ.get("UNIVL_TPU_FUSED_VOCAB", ""),
        )
        self.fused_vocab = fused_vocab
        self._gen = CaptionGenerator(
            model, params, tokenizer,
            beam_size=beam_size,
            max_len=max_len or cfg.max_words,
            batch_size=batch_size,
            incremental=True,
            mesh=mesh,
            fused_decode=fused_decode,
            fused_vocab=fused_vocab,
        )

    def caption(
        self,
        videos: Sequence[np.ndarray],
        transcripts: Optional[Sequence[str]] = None,
    ) -> List[str]:
        """``videos``: [T_i, video_dim] S3D feature arrays (ragged ok).
        ``transcripts``: optional encoder-side text per clip."""
        n = len(videos)
        if transcripts is not None:
            assert len(transcripts) == n
        outs: List[str] = []
        B = self.batch_size
        for i0 in range(0, n, B):
            chunk_v = videos[i0 : i0 + B]
            chunk_t = transcripts[i0 : i0 + B] if transcripts is not None else None
            batch = self._build_batch(chunk_v, chunk_t)
            outs.extend(self._gen.generate(batch)[: len(chunk_v)])
        return outs

    def _build_batch(self, videos, transcripts):
        B = self.batch_size
        feats = np.zeros((B, self.max_frames, self.video_dim), np.float32)
        vmask = np.zeros((B, self.max_frames), np.int32)
        ids = np.zeros((B, self.max_words), np.int32)
        amask = np.zeros((B, self.max_words), np.int32)
        for i in range(B):
            j = min(i, len(videos) - 1)  # repeat last row into the pad slots
            feats[i], vmask[i], _ = pad_video(
                np.asarray(videos[j], np.float32), self.max_frames, self.video_dim
            )
            text = transcripts[j] if transcripts is not None else ""
            e = encode_text(text, self.tokenizer, self.max_words, with_mlm=False)
            ids[i], amask[i] = e["input_ids"], e["attention_mask"]
        return {
            "input_ids": ids,
            "token_type_ids": np.zeros((B, self.max_words), np.int32),
            "attention_mask": amask,
            "video": feats,
            "video_mask": vmask,
        }
