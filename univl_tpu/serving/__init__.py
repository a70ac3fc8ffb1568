"""Production serving layer (no reference equivalent — TPU-native addition).

Two deployable services over a trained UniVL checkpoint:
  - VideoRetrievalIndex: encode a video corpus once, answer text queries by
    dot-product search, optionally rerank the shortlist with the cross
    encoder (the FT-Align head) for FT-Align-quality results at
    dot-product cost.
  - CaptionService: batched beam-search captioning of raw S3D feature
    clips, with or without transcripts.
  - CoalescingCaptionService: thread-safe wrapper merging concurrent
    caption requests into shared decode batches (a decode costs the same
    for 1 clip as for a full batch on TPU — see serving/coalesce.py).
"""

from univl_tpu.serving.index import VideoRetrievalIndex
from univl_tpu.serving.captioning import CaptionService
from univl_tpu.serving.coalesce import CoalescingCaptionService

__all__ = [
    "VideoRetrievalIndex", "CaptionService", "CoalescingCaptionService",
]
