"""Text -> video retrieval index for serving.

Deployment pattern the reference only hints at in its eval loop
(main_task_retrieval.py:367-450): encode the corpus ONCE, serve queries
against cached embeddings. Two-stage search:

  1. dense stage: mean-pooled L2-normalized tower embeddings, one matmul
     per query batch (the FT-Joint similarity, modeling.py:377-391)
  2. optional rerank stage: the cross encoder + similarity head rescores
     the top-`rerank` shortlist per query (the FT-Align similarity,
     modeling.py:341-375) — FT-Align quality without the quadratic corpus
     scan.

All device work is jitted with fixed shapes; ragged inputs are padded on
host. The index persists to one .npz.
"""

from __future__ import annotations

import os

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from univl_tpu.data.text_encoding import encode_text, pad_video
from univl_tpu.models.univl import UniVL


from univl_tpu.data.batching import pad_rows as _pad_rows  # shared helper


class VideoRetrievalIndex:
    def __init__(
        self,
        model: UniVL,
        params,
        tokenizer,
        max_words: Optional[int] = None,
        max_frames: Optional[int] = None,
        batch_size: int = 64,
        store_full: bool = False,
        mesh=None,
    ):
        """``store_full=True`` keeps full [N, F, H] visual encoder outputs so
        ``search(..., rerank=M)`` can cross-encode the shortlist; costs
        ~F*H*4 bytes per indexed clip. ``mesh``: optional 1-D dp Mesh — index
        encode batches and rerank tiles shard over the batch dim."""
        if getattr(model, "cfg", None) is not None:
            max_words = max_words or model.cfg.max_words
            max_frames = max_frames or model.cfg.max_frames
        if store_full:
            c = model.cfg
            assert c.stage_two or c.train_sim_after_cross, (
                "rerank (store_full) needs the cross encoder: build the model "
                "with stage_two or train_sim_after_cross"
            )
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.max_words = max_words
        self.max_frames = max_frames
        self.batch_size = batch_size
        self.store_full = store_full
        self.video_dim = model.cfg.video_dim

        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            assert batch_size % mesh.devices.size == 0

        self.ids: List[str] = []
        self.video_emb = np.zeros((0, model.cfg.bert.hidden_size), np.float32)
        self.vis_full = (
            np.zeros((0, max_frames, model.cfg.bert.hidden_size), np.float32)
            if store_full
            else None
        )
        self.vm_full = np.zeros((0, max_frames), np.int32) if store_full else None

        @jax.jit
        def encode_video_fn(params, video, video_mask):
            vis = model.apply(
                params, video, video_mask, method=UniVL.encode_video
            )
            vm = video_mask.astype(jnp.float32)[:, :, None]
            denom = jnp.maximum(jnp.sum(vm, axis=1), 1.0)
            pooled = jnp.sum(vis.astype(jnp.float32) * vm, axis=1) / denom
            pooled = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
            )
            return vis, pooled

        @jax.jit
        def encode_text_fn(params, input_ids, token_type_ids, attention_mask):
            seq = model.apply(
                params, input_ids, token_type_ids, attention_mask,
                method=UniVL.encode_text,
            )
            am = attention_mask.astype(jnp.float32)[:, :, None]
            am = am.at[:, 0, :].set(0.0)  # exclude CLS (modeling.py:330-333)
            pooled = jnp.sum(seq.astype(jnp.float32) * am, axis=1) / jnp.maximum(
                jnp.sum(am, axis=1), 1.0
            )
            pooled = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
            )
            return seq, pooled

        @jax.jit
        def rerank_fn(params, seq, vis, am, vm):
            # [Q, L, H] texts x [Q, C, F, H] candidate videos -> [Q, C]
            Q, C = vis.shape[0], vis.shape[1]
            seq_rep = jnp.repeat(seq, C, axis=0)
            am_rep = jnp.repeat(am, C, axis=0)
            return model.apply(
                params,
                seq_rep, vis.reshape(Q * C, *vis.shape[2:]),
                am_rep, vm.reshape(Q * C, vm.shape[-1]),
                method=UniVL.cross_similarity_pairs,
            ).reshape(Q, C)

        self._encode_video = encode_video_fn
        self._encode_text = encode_text_fn
        self._rerank = rerank_fn

    # ------------------------------------------------------------ #
    def add(
        self, videos: Sequence[np.ndarray], ids: Optional[Sequence[str]] = None
    ) -> None:
        """Index raw S3D feature clips. ``videos``: [T_i, video_dim] arrays
        (ragged ok; truncated/padded to max_frames)."""
        if ids is None:
            ids = [str(len(self.ids) + i) for i in range(len(videos))]
        assert len(ids) == len(videos)
        feats = np.zeros((len(videos), self.max_frames, self.video_dim), np.float32)
        masks = np.zeros((len(videos), self.max_frames), np.int32)
        for i, v in enumerate(videos):
            feats[i], masks[i], _ = pad_video(
                np.asarray(v, np.float32), self.max_frames, self.video_dim
            )
        embs, fulls, vms = [], [], []
        B = self.batch_size
        for i0 in range(0, len(videos), B):
            fb = _pad_rows(feats[i0 : i0 + B], B)
            mb = _pad_rows(masks[i0 : i0 + B], B)
            if self._sharding is not None:
                fb = jax.device_put(fb, self._sharding)
                mb = jax.device_put(mb, self._sharding)
            vis, pooled = self._encode_video(self.params, fb, mb)
            n = min(B, len(videos) - i0)
            embs.append(np.asarray(pooled[:n], np.float32))
            if self.store_full:
                fulls.append(np.asarray(vis[:n], np.float32))
                vms.append(np.asarray(mb)[:n])
        self.ids.extend(ids)
        self.video_emb = np.concatenate([self.video_emb] + embs)
        if self.store_full:
            self.vis_full = np.concatenate([self.vis_full] + fulls)
            self.vm_full = np.concatenate([self.vm_full] + vms)

    def __len__(self) -> int:
        return len(self.ids)

    # ------------------------------------------------------------ #
    def search(
        self, queries: Sequence[str], top_k: int = 10, rerank: int = 0
    ) -> List[List[Tuple[str, float]]]:
        """Returns, per query, the top_k (video_id, score) pairs.

        ``rerank=M`` (requires store_full=True) rescored the dense-stage
        top-M shortlist with the cross encoder; scores then come from the
        FT-Align similarity head."""
        if rerank:
            assert self.store_full, "rerank requires store_full=True at build"
            assert rerank >= top_k, "rerank shortlist must cover top_k"
        enc = [
            encode_text(q, self.tokenizer, self.max_words, with_mlm=False)
            for q in queries
        ]
        Q = len(queries)
        B = self.batch_size
        seqs, pooled = [], []
        batch_keys = ("input_ids", "token_type_ids", "attention_mask")
        arrs = {
            k: np.stack([e[k] for e in enc]).astype(np.int32) for k in batch_keys
        }
        for i0 in range(0, Q, B):
            chunk = {k: _pad_rows(v[i0 : i0 + B], B) for k, v in arrs.items()}
            if self._sharding is not None:
                chunk = {
                    k: jax.device_put(v, self._sharding) for k, v in chunk.items()
                }
            seq, p = self._encode_text(
                self.params, chunk["input_ids"], chunk["token_type_ids"],
                chunk["attention_mask"],
            )
            n = min(B, Q - i0)
            seqs.append(np.asarray(seq[:n], np.float32))
            pooled.append(np.asarray(p[:n], np.float32))
        seqs = np.concatenate(seqs)
        pooled = np.concatenate(pooled)

        sim = pooled @ self.video_emb.T  # [Q, N]

        def _top(mat, k):
            # O(N) argpartition + sort of the k winners — a full argsort
            # is O(N log N) per query on the single-vCPU serving host
            k = min(k, mat.shape[1])
            part = np.argpartition(-mat, k - 1, axis=1)[:, :k]
            vals = np.take_along_axis(mat, part, axis=1)
            inner = np.argsort(-vals, axis=1)
            return np.take_along_axis(part, inner, axis=1)

        if not rerank:
            order = _top(sim, top_k)
            return [
                [(self.ids[j], float(sim[q, j])) for j in order[q]]
                for q in range(Q)
            ]

        M = min(rerank, len(self.ids))
        shortlist = _top(sim, M)  # [Q, M]
        am = arrs["attention_mask"]
        out: List[List[Tuple[str, float]]] = []
        for q0 in range(0, Q, 8):  # rerank tile: 8 queries x M candidates
            q1 = min(q0 + 8, Q)
            qn = q1 - q0
            seq_t = _pad_rows(seqs[q0:q1], 8)
            am_t = _pad_rows(am[q0:q1], 8)
            vis_t = self.vis_full[shortlist[q0:q1]]  # [qn, M, F, H]
            vm_t = self.vm_full[shortlist[q0:q1]]
            vis_t = _pad_rows(vis_t, 8)
            vm_t = _pad_rows(vm_t, 8)
            scores = np.asarray(
                self._rerank(self.params, seq_t, vis_t, am_t, vm_t)
            )[:qn]
            for qi in range(qn):
                cand = shortlist[q0 + qi]
                order = np.argsort(-scores[qi])[:top_k]
                out.append(
                    [(self.ids[cand[j]], float(scores[qi, j])) for j in order]
                )
        return out

    # ------------------------------------------------------------ #
    def save(self, path: str) -> None:
        data = dict(
            ids=np.asarray(self.ids),  # fixed-width unicode, no pickle
            video_emb=self.video_emb,
            max_words=self.max_words,
            max_frames=self.max_frames,
            store_full=self.store_full,
        )
        if self.store_full:
            data.update(vis_full=self.vis_full, vm_full=self.vm_full)
        np.savez_compressed(path, **data)

    @classmethod
    def load(cls, path: str, model: UniVL, params, tokenizer, **kw):
        # np.savez_compressed appends '.npz' to a suffix-less path but
        # np.load does not — accept either spelling so save(path) ->
        # load(path) always round-trips
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        z = np.load(path)
        idx = cls(
            model, params, tokenizer,
            max_words=int(z["max_words"]), max_frames=int(z["max_frames"]),
            store_full=bool(z["store_full"]), **kw,
        )
        idx.ids = [str(s) for s in z["ids"]]
        idx.video_emb = z["video_emb"]
        if idx.store_full:
            idx.vis_full = z["vis_full"]
            idx.vm_full = z["vm_full"]
        return idx
