"""Fixed-shape batching + host->device prefetch.

Replaces the reference's torch DataLoader worker pool + DistributedSampler
(main_task_retrieval.py:213-222). Everything is fixed-shape numpy, so batches
go straight to HBM with no recompilation; a background thread double-buffers
device transfers so the host pipeline overlaps the TPU step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


class Batcher:
    """Deterministic shuffling batcher.

    Yields [global_batch, ...] dicts; with grad_accum > 1, yields
    [accum, global_batch, ...] (the trainer's expected layout).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        grad_accum: int = 1,
        num_workers: int = 8,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``batch_size`` is the GLOBAL batch; in multi-host runs each host
        materializes only its 1/process_count slice of every batch (same
        seeded order on all hosts — the DistributedSampler equivalent)."""
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.grad_accum = grad_accum
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count
        self.local_batch = batch_size // process_count

    def __len__(self):
        chunk = self.batch_size * self.grad_accum
        n = len(self.dataset)
        return n // chunk if self.drop_last else -(-n // chunk)

    def epoch(
        self, epoch: int = 0, start_batch: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield the epoch's update-batches in the seeded deterministic
        order. ``start_batch`` skips the first N update-batches WITHOUT
        fetching their samples (exact mid-epoch resume: the skipped
        prefix is sliced out of the index order, costing nothing)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        chunk = self.batch_size * self.grad_accum

        def fetch(i):
            return self.dataset[int(i)]

        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            for off in range(start_batch * chunk,
                             n - chunk + 1 if self.drop_last else n, chunk):
                idxs = order[off : off + chunk]
                if len(idxs) < chunk:
                    if self.drop_last:
                        break
                    if self.grad_accum > 1 or self.process_count > 1:
                        # the accum/host reshapes below need a FULL chunk;
                        # wrap-pad the remainder with indices from the
                        # epoch's start (torch DistributedSampler's
                        # equal-size padding — a few samples repeat) so
                        # every micro-batch/host slice keeps its static
                        # shape instead of crashing on the reshape
                        idxs = np.concatenate(
                            [idxs, np.resize(order, chunk - len(idxs))]
                        )
                if self.process_count > 1:
                    # host-local slice of each micro-batch
                    idxs = idxs.reshape(self.grad_accum, self.batch_size)
                    lo = self.process_index * self.local_batch
                    idxs = idxs[:, lo : lo + self.local_batch].reshape(-1)
                samples = list(ex.map(fetch, idxs))
                batch = collate(samples)
                if self.grad_accum > 1:
                    lb = self.local_batch if self.process_count > 1 else self.batch_size
                    batch = {
                        k: v.reshape(self.grad_accum, lb, *v.shape[1:])
                        for k, v in batch.items()
                    }
                yield batch


def pad_rows(x: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad the leading (row) dim to ``size`` — the shared static-shape
    helper for partial eval/serving batches (one home; the cli/evals/
    serving copies used to drift independently)."""
    if x.shape[0] == size:
        return x
    pad = np.zeros((size - x.shape[0], *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0)


def cast_floats(batch: Dict[str, np.ndarray], dtype) -> Dict[str, np.ndarray]:
    """Cast float32 arrays (the video features) to `dtype` ON HOST before
    device transfer — halves host->device bytes at bf16. int/mask arrays
    pass through. The model upcasts to fp32 for the feature LayerNorm
    either way (models/univl.py normalize_video), so only input fidelity
    changes (~3 significant digits at bf16)."""
    import ml_dtypes

    np_dtype = np.dtype(
        ml_dtypes.bfloat16 if str(dtype) == "bfloat16" else dtype
    )
    return {
        k: v.astype(np_dtype) if v.dtype == np.float32 else v
        for k, v in batch.items()
    }


def prefetch_to_device(
    it: Iterator[Any],
    put: Optional[Callable[[Any], Any]] = None,
    size: int = 2,
    put_in_worker: bool = True,
) -> Iterator[Any]:
    """Background-thread prefetch; `put` typically trainer.shard_batch or
    jax.device_put.

    ``put_in_worker=False`` runs `put` on the CONSUMER thread instead: the
    background thread overlaps only the host batch-building, and all device
    interaction stays on one thread (simpler to reason about; measured
    equal to worker-side put on the tunneled backend, docs/PERF.md). With
    put_in_worker=True the host->device copy itself also overlaps the
    running step."""
    if put is None:
        import jax

        put = jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=size)
    END = object()
    err: List[BaseException] = []
    stop = threading.Event()

    def _put(obj):
        # bounded put so the worker can exit when the consumer abandons
        # the generator mid-epoch (preemption return / exception / break)
        # instead of blocking forever on a full queue with device-resident
        # batches pinned
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if stop.is_set():
                    return
                if not _put(put(item) if put_in_worker else item):
                    return
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            _put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is END:
                if err:
                    raise err[0]
                return
            yield item if put_in_worker else put(item)
    finally:
        # early generator close: unblock + terminate the worker and drop
        # its buffered batches
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
