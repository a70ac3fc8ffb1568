"""Request coalescing for the caption service.

The reference has no serving layer at all (its eval loop is offline,
main_task_caption.py:523-545); this is beyond-reference production
surface shaped by TPU economics: a beam decode costs the SAME wall time
for 1 clip as for a full batch (the generator always runs its fixed
[batch_size]-shaped program; pad slots repeat the last row —
serving/captioning.py:_build_batch), so serving N concurrent single-clip
requests as N separate decodes wastes (B-1)/B of every decode.

``CoalescingCaptionService`` keeps one dispatcher thread that drains the
request queue: whatever arrived while the device was busy is merged into
ONE decode (whole requests, up to the generator batch size in clips).
Under a sequential client nothing changes — a lone request is dispatched
immediately with no artificial batching delay (no max-wait timer; the
previous decode IS the batching window).

Per-clip results are unchanged by grouping: the decode batch shape is
constant (always [batch_size], padded), every per-row op (projections,
attention over the row's own cache, softmax, top-k within the row's
beam) depends only on that row, and bit-stability across pad/bucket
content is already pinned by tests/test_fast_decoder.py. The
coalesced-vs-sequential equality is pinned again at the service level in
tests/test_serving.py.

Failure semantics: requests grouped into one decode fail together if the
decode itself raises — input validation (shape/dim checks) happens in
the HTTP handler BEFORE enqueueing (cli/serve.py:_decode_videos), so a
malformed request is rejected without poisoning its neighbors.
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional, Sequence

import numpy as np

from univl_tpu.serving.captioning import CaptionService


class _Pending:
    __slots__ = ("videos", "transcripts", "event", "out", "err")

    def __init__(self, videos, transcripts):
        self.videos = videos
        self.transcripts = transcripts
        self.event = threading.Event()
        self.out: Optional[List[str]] = None
        self.err: Optional[BaseException] = None


_STOP = object()


class CoalescingCaptionService:
    """Wraps a CaptionService; same ``caption()`` API, thread-safe, merges
    concurrent requests into shared decode batches.

    ``device_lock``: optional lock serializing ALL device work in the
    process (cli/serve.py shares one between captioning and the retrieval
    index); held only around the underlying decode, never while waiting
    for requests.
    """

    def __init__(
        self,
        service: CaptionService,
        max_batch: Optional[int] = None,
        max_queue: int = 1024,
        device_lock: Optional[threading.Lock] = None,
    ):
        self._svc = service
        self._max = int(max_batch or service.batch_size)
        self._device_lock = device_lock
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._closed = False
        self._worker = threading.Thread(
            target=self._loop, name="caption-coalescer", daemon=True
        )
        self._worker.start()

    # ------------------------------------------------------------ #
    def caption(
        self,
        videos: Sequence[np.ndarray],
        transcripts: Optional[Sequence[str]] = None,
    ) -> List[str]:
        if self._closed:
            raise RuntimeError("CoalescingCaptionService is closed")
        if transcripts is not None:
            assert len(transcripts) == len(videos)
        req = _Pending(list(videos), list(transcripts) if transcripts else None)
        self._q.put(req)
        # bounded wait: a request that races past the closed flag after
        # the worker's final drain would otherwise block forever
        while not req.event.wait(1.0):
            if self._closed and not self._worker.is_alive():
                raise RuntimeError("CoalescingCaptionService is closed")
        if req.err is not None:
            raise req.err
        return req.out

    def close(self):
        # flag first so no new caption() enqueues after the sentinel; the
        # dispatcher drains-and-fails anything already queued behind it,
        # so no waiter is left blocked forever
        self._closed = True
        self._q.put(_STOP)
        self._worker.join(timeout=10)

    # ------------------------------------------------------------ #
    def _loop(self):
        carry: Optional[_Pending] = None
        stopping = False
        while True:
            first = carry if carry is not None else self._q.get()
            carry = None
            if first is _STOP:
                self._drain_closed()
                return
            group = [first]
            clips = len(first.videos)
            # merge whole requests that arrived while the device was busy,
            # up to one generator batch; a request that would overflow the
            # group is carried (in arrival order) into the next one; a
            # single oversized request runs alone (the underlying service
            # chunks it internally)
            while clips < self._max:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is _STOP:
                    # serve the current group, then drain-and-fail whatever
                    # is left and exit. NEVER re-post the sentinel into the
                    # queue: with a full queue that put would block forever
                    # (this thread is the only consumer).
                    stopping = True
                    break
                if clips + len(nxt.videos) > self._max:
                    carry = nxt
                    break
                group.append(nxt)
                clips += len(nxt.videos)
            self._serve_group(group)
            if stopping:
                if carry is not None:
                    carry.err = RuntimeError("CoalescingCaptionService is closed")
                    carry.event.set()
                self._drain_closed()
                return

    def _drain_closed(self):
        """Fail any requests that raced past the closed flag — their
        callers are blocked in event.wait() and must be released."""
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                return
            if r is _STOP:
                continue
            r.err = RuntimeError("CoalescingCaptionService is closed")
            r.event.set()

    def _serve_group(self, group: List[_Pending]):
        vids = [v for r in group for v in r.videos]
        # transcripts=None and transcript="" encode identically
        # (captioning.py:_build_batch), so mixed groups are exact
        if any(r.transcripts is not None for r in group):
            txts: Optional[List[str]] = []
            for r in group:
                txts.extend(r.transcripts or [""] * len(r.videos))
        else:
            txts = None
        try:
            if self._device_lock is not None:
                with self._device_lock:
                    outs = self._svc.caption(vids, transcripts=txts)
            else:
                outs = self._svc.caption(vids, transcripts=txts)
            i = 0
            for r in group:
                r.out = outs[i : i + len(r.videos)]
                i += len(r.videos)
        except BaseException as e:  # propagate to every waiter
            for r in group:
                r.err = e
        finally:
            for r in group:
                r.event.set()
