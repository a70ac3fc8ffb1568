"""Retrieval evaluation (reference: main_task_retrieval.py:367-450).

Pipeline:
  1. encode every test clip once (jitted, fixed shapes, padded final batch)
  2. build the full T x V similarity matrix
       - joint mode: cache mean-pooled L2-normalized embeddings, one matmul
         (the reference caches full encoder outputs and re-pools per block —
         we hoist the pooling, numerically identical)
       - cross (FT-Align) mode: chunked cross-encoder rescoring over
         (text-block x video-block) tiles with static shapes (the reference's
         5-row chunks + thread-per-GPU fan-out, main_task_retrieval.py:406-440)
  3. compute R@K from the diagonal rank

On multi-chip meshes the tiles are data-parallel: each device rescores a
row-block (the reference's parallel_apply equivalent, util.py:21-60) — the
sim matrix assembly happens on host.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from univl_tpu.evals.metrics import compute_retrieval_metrics
from univl_tpu.models.univl import UniVL


def _pad_batch(batch: Dict[str, np.ndarray], size: int) -> Tuple[Dict[str, np.ndarray], int]:
    n = next(iter(batch.values())).shape[0]
    if n == size:
        return batch, n
    out = {}
    for k, v in batch.items():
        pad = np.zeros((size - n, *v.shape[1:]), v.dtype)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, n


class RetrievalEvaluator:
    def __init__(
        self,
        model: UniVL,
        params,
        batch_size: int = 64,
        cross_text_block: int = 8,
        cross_video_block: int = 64,
        mesh=None,
    ):
        """``mesh``: optional 1-D dp Mesh. When given, encode batches and
        cross-rescoring text blocks are sharded over the mesh's batch dim —
        the TPU equivalent of the reference's thread-per-GPU parallel_apply
        fan-out (util.py:21-60, main_task_retrieval.py:406-440), except XLA
        partitions one compiled program instead of replicating the model."""
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.tb = cross_text_block
        self.vb = cross_video_block
        self.mesh = mesh
        self._n_dev = mesh.devices.size if mesh is not None else 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            self._shard_rows = NamedSharding(mesh, P(axis))
            self._repl = NamedSharding(mesh, P())
        else:
            self._shard_rows = self._repl = None

        @jax.jit
        def encode_fn(params, input_ids, token_type_ids, attention_mask, video, video_mask):
            seq, vis = model.apply(
                params, input_ids, token_type_ids, attention_mask, video, video_mask,
                method=UniVL.encode,
            )
            return seq, vis

        @jax.jit
        def pool_fn(seq, vis, attention_mask, video_mask):
            text_out, video_out = UniVL.mean_pool(seq, vis, attention_mask, video_mask)
            if not model.cfg.use_mil:
                text_out = text_out / jnp.linalg.norm(text_out, axis=-1, keepdims=True)
                video_out = video_out / jnp.linalg.norm(video_out, axis=-1, keepdims=True)
            return text_out, video_out

        @jax.jit
        def cross_block_fn(params, seq, vis, am, vm):
            return model.apply(
                params, seq, vis, am, vm, method=UniVL.cross_similarity
            )

        self._encode = encode_fn
        self._pool = pool_fn
        self._cross_block = cross_block_fn

    def _host(self, x, dtype=None):
        """np.asarray that works when `x` is sharded over a MULTI-HOST mesh
        (rows on other processes are not addressable here): replicate via a
        jitted identity (XLA all-gather) first. Single-host sharded arrays
        are fully addressable and skip the gather."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = jax.jit(lambda a: a, out_shardings=self._repl)(x)
        return np.asarray(x, dtype) if dtype is not None else np.asarray(x)

    # ------------------------------------------------------------ #
    def _encoded_batches(self, batches: Iterator[Dict[str, np.ndarray]]):
        """Shared pass-1 loop: pad each batch to a mesh-divisible size, shard
        its rows, encode, and mean-pool. Yields ``(batch, n, seq, vis, t, v)``
        with ``n`` the unpadded row count. Consumed by :meth:`encode_dataset`
        (host-side outputs) and :meth:`encode_dataset_device` (HBM-resident
        outputs) — only where the results land differs between the two."""
        for batch in batches:
            # pad to a multiple of the mesh so the batch dim shards evenly
            size = self.batch_size
            if self._n_dev > 1:
                size = ((size + self._n_dev - 1) // self._n_dev) * self._n_dev
            batch, n = _pad_batch(batch, size)
            if self._shard_rows is not None:
                batch = {
                    k: jax.device_put(v, self._shard_rows) for k, v in batch.items()
                }
            seq, vis = self._encode(
                self.params,
                batch["input_ids"], batch["token_type_ids"],
                batch["attention_mask"], batch["video"], batch["video_mask"],
            )
            t, v = self._pool(seq, vis, batch["attention_mask"], batch["video_mask"])
            yield batch, n, seq, vis, t, v

    def encode_dataset(
        self, batches: Iterator[Dict[str, np.ndarray]], store_full: bool = True
    ):
        """Pass 1: encode all clips; returns host-side arrays.

        ``store_full=False`` keeps only the pooled embeddings (all the joint
        mode needs) — full [N, L, H] encoder outputs are only transferred for
        FT-Align rescoring."""
        seqs, viss, ams, vms, texts, videos = [], [], [], [], [], []
        for batch, n, seq, vis, t, v in self._encoded_batches(batches):
            if store_full:
                seqs.append(self._host(seq, np.float32)[:n])
                viss.append(self._host(vis, np.float32)[:n])
                ams.append(self._host(batch["attention_mask"])[:n])
                vms.append(self._host(batch["video_mask"])[:n])
            texts.append(self._host(t, np.float32)[:n])
            videos.append(self._host(v, np.float32)[:n])
        out = {
            "text_emb": np.concatenate(texts),
            "video_emb": np.concatenate(videos),
        }
        if store_full:
            out.update(
                seq=np.concatenate(seqs),
                vis=np.concatenate(viss),
                am=np.concatenate(ams),
                vm=np.concatenate(vms),
            )
        return out

    # ------------------------------------------------------------ #
    def joint_sim_matrix(self, enc) -> np.ndarray:
        """T x V similarity from pooled embeddings.

        With a mesh, the matmul runs ON DEVICE with text rows sharded over
        the dp axis and videos replicated — each device computes its
        row-block of the matrix (the all-gather/tiled design from the
        TPU-native plan; on one host-side matmul this only matters for
        corpus-scale T x V)."""
        if self.mesh is not None:
            t = _pad_rows(
                enc["text_emb"],
                -(-enc["text_emb"].shape[0] // self._n_dev) * self._n_dev,
            )
            text = jax.device_put(jnp.asarray(t), self._shard_rows)
            video = jax.device_put(jnp.asarray(enc["video_emb"]), self._repl)
            sim = jax.jit(lambda a, b: a @ b.T)(text, video)
            return self._host(sim)[: enc["text_emb"].shape[0]]
        return enc["text_emb"] @ enc["video_emb"].T

    def encode_dataset_device(self, batches: Iterator[Dict[str, np.ndarray]]):
        """Pass 1 for corpus-scale FT-Align rescoring: like encode_dataset
        with store_full, but the [N, L, H] encoder outputs STAY IN HBM.

        The host-bounce variant downloads ~0.5 GB of encoder outputs and
        re-uploads every video block once per text block — O(N^2/tb) bytes
        over PCIe (or this environment's ~30 MB/s tunnel, where a YouCook2-
        sized corpus would take hours in transfers alone). Device-resident,
        the quadratic pass moves no bytes off-chip except the [N, N] sim
        matrix itself. A 3.3k-clip corpus holds ~1 GB of fp32 outputs —
        ~6% of one v5e's HBM. With a mesh, encode batches shard over the
        dp axis (same fan-out as encode_dataset)."""
        seqs, viss, ams, vms, texts, videos = [], [], [], [], [], []
        for batch, n, seq, vis, t, v in self._encoded_batches(batches):
            seqs.append(seq[:n])
            viss.append(vis[:n])
            ams.append(jnp.asarray(batch["attention_mask"])[:n])
            vms.append(jnp.asarray(batch["video_mask"])[:n])
            texts.append(self._host(t, np.float32)[:n])
            videos.append(self._host(v, np.float32)[:n])
        return {
            "seq": jnp.concatenate(seqs),
            "vis": jnp.concatenate(viss),
            "am": jnp.concatenate(ams),
            "vm": jnp.concatenate(vms),
            "text_emb": np.concatenate(texts),
            "video_emb": np.concatenate(videos),
        }

    def cross_sim_matrix_device(self, enc) -> np.ndarray:
        """FT-Align rescoring with everything resident in HBM.

        One jitted ROW-STRIPE program: for a [tb]-text block, a fori_loop
        sweeps all video blocks (dynamic slices of the resident [N, L, H]
        visual outputs) and fills [tb, N] scores on device. The Python loop
        dispatches one stripe per text block; dispatches pipeline (no
        per-stripe sync) and only the [tb, N] score rows come back to host.
        Compiles once regardless of N (block sizes are static).

        With a mesh (round-4 VERDICT item 6), the SAME program is
        dp-sharded: the stripe's text rows shard over the dp axis (each
        device rescores tb/n_dev rows, XLA partitions the cross encoder's
        batch dim) while the resident visual outputs are replicated —
        per-device memory equals the single-chip footprint and the
        quadratic rescoring compute divides by dp (the reference's
        thread-per-GPU parallel_apply fan-out, main_task_retrieval.py:
        406-440, without leaving the resident path)."""
        # with a mesh each device handles self.tb text rows per stripe
        tb = self.tb * self._n_dev
        vb = self.vb
        n = int(enc["seq"].shape[0])
        n_pad = -(-n // tb) * tb
        nv_pad = -(-n // vb) * vb

        seq = _pad_rows_device(enc["seq"], n_pad)
        am = _pad_rows_device(enc["am"], n_pad)
        vis = _pad_rows_device(enc["vis"], nv_pad)
        vm = _pad_rows_device(enc["vm"], nv_pad)
        if self.mesh is not None:
            # resident corpus replicated; stripe inputs/rows dp-sharded
            vis = jax.device_put(vis, self._repl)
            vm = jax.device_put(vm, self._repl)
            seq = jax.device_put(seq, self._repl)
            am = jax.device_put(am, self._repl)

        model = self.model

        def stripe_fn(params, seq_i, am_i, vis_all, vm_all):
            nv = vis_all.shape[0] // vb

            def body(j, acc):
                vis_j = jax.lax.dynamic_slice_in_dim(vis_all, j * vb, vb, 0)
                vm_j = jax.lax.dynamic_slice_in_dim(vm_all, j * vb, vb, 0)
                blk = model.apply(
                    params, seq_i, vis_j, am_i, vm_j,
                    method=UniVL.cross_similarity,
                )
                return jax.lax.dynamic_update_slice_in_dim(
                    acc, blk.astype(jnp.float32), j * vb, 1
                )

            acc0 = jnp.zeros((tb, nv * vb), jnp.float32)
            return jax.lax.fori_loop(0, nv, body, acc0)

        if self.mesh is not None:
            stripe = jax.jit(stripe_fn, out_shardings=self._shard_rows)
        else:
            stripe = jax.jit(stripe_fn)

        rows = []
        for i0 in range(0, n_pad, tb):
            seq_i, am_i = seq[i0:i0 + tb], am[i0:i0 + tb]
            if self.mesh is not None:
                # reshard the stripe's text rows over dp (slices of the
                # replicated resident array arrive replicated)
                seq_i = jax.device_put(seq_i, self._shard_rows)
                am_i = jax.device_put(am_i, self._shard_rows)
            rows.append(stripe(self.params, seq_i, am_i, vis, vm))
        sim = np.concatenate([self._host(r) for r in rows], axis=0)
        return sim[:n, :n]

    def cross_sim_matrix(self, enc) -> np.ndarray:
        """FT-Align: cross-encoder rescoring over static-shape tiles.

        With a mesh, each device rescored a row sub-block of the text tile
        in the same compiled program (XLA partitions the batch dim)."""
        seq, vis, am, vm = enc["seq"], enc["vis"], enc["am"], enc["vm"]
        n = seq.shape[0]
        tb = self.tb * self._n_dev
        vb = self.vb
        sim = np.zeros((n, n), np.float32)
        for i0 in range(0, n, tb):
            i1 = min(i0 + tb, n)
            seq_i = _pad_rows(seq[i0:i1], tb)
            am_i = _pad_rows(am[i0:i1], tb)
            if self._shard_rows is not None:
                seq_i = jax.device_put(jnp.asarray(seq_i), self._shard_rows)
                am_i = jax.device_put(jnp.asarray(am_i), self._shard_rows)
            for j0 in range(0, n, vb):
                j1 = min(j0 + vb, n)
                vis_j = _pad_rows(vis[j0:j1], vb)
                vm_j = _pad_rows(vm[j0:j1], vb)
                if self._repl is not None:
                    vis_j = jax.device_put(jnp.asarray(vis_j), self._repl)
                    vm_j = jax.device_put(jnp.asarray(vm_j), self._repl)
                block = self._cross_block(self.params, seq_i, vis_j, am_i, vm_j)
                sim[i0:i1, j0:j1] = self._host(block)[: i1 - i0, : j1 - j0]
        return sim

    # ------------------------------------------------------------ #
    def evaluate(
        self, batches: Iterator[Dict[str, np.ndarray]], mode: Optional[str] = None
    ) -> Dict[str, float]:
        """mode: 'joint' | 'cross' (default from model config).

        Cross mode always takes the device-resident pipeline (encoder
        outputs stay in HBM; tests pin parity with the host-bounce path)
        — the host loop re-uploads the visual outputs O(N/tb) times at
        YouCook2 scale (docs/PERF.md FT-Align section). With a mesh the
        resident row-stripes shard over dp (round-4: the corpus-scale
        path and the multi-chip path are the same code)."""
        if mode is None:
            mode = (
                "cross"
                if (self.model.cfg.train_sim_after_cross or self.model.cfg.stage_two)
                else "joint"
            )
        if mode == "cross":
            enc = self.encode_dataset_device(batches)
            sim = self.cross_sim_matrix_device(enc)
        else:
            enc = self.encode_dataset(batches, store_full=False)
            sim = self.joint_sim_matrix(enc)
        metrics = compute_retrieval_metrics(sim)
        metrics["mode"] = mode  # type: ignore[assignment]
        return metrics


from univl_tpu.data.batching import pad_rows as _pad_rows  # shared helper


def _pad_rows_device(x: jax.Array, size: int) -> jax.Array:
    if x.shape[0] == size:
        return x
    return jnp.pad(x, [(0, size - x.shape[0])] + [(0, 0)] * (x.ndim - 1))
