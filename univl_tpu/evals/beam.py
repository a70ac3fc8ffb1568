"""Static-shape jitted beam search for caption decoding.

Reference behavior replicated (modules/beam.py + main_task_caption.py:400-545):
  - beam size 5, cumulative log-prob scores, NO length normalization
  - step 1 expands only the first beam row (beam.py:71)
  - backpointers prev_k = id // V, token = id % V (beam.py:78-80)
  - an instance is finished when its TOP beam emits EOS ([SEP]) (beam.py:82-83)
  - n_best=1: the returned hypothesis is the top beam row

TPU-native design differences (same results, different machinery):
  - the cross encoder runs ONCE per batch and is cached; the reference
    recomputes it inside every decode step (modeling.py:404)
  - finished instances are frozen by masking instead of the reference's
    Python-side active-instance compaction (collate_active_info)
  - the decode loop is a lax.scan with static shapes; beam rows are
    reordered in-place each step instead of walking back pointers at the end
"""

from __future__ import annotations

import os

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from univl_tpu.models.univl import UniVL

NEG_INF = -1e18


def fused_decode_env_state(val: str | None) -> bool | None:
    """Three-state UNIVL_TPU_FUSED_DECODE parse: None (unset/empty) /
    False ('0', 'false', 'off', 'no', any case) / True (anything else).
    An operator exporting UNIVL_TPU_FUSED_DECODE=0 must DISABLE the fused
    kernel, not enable it — truthy-on-any-non-empty was a footgun once
    serving started defaulting fused ON on TPU."""
    if not val:
        return None
    return val.strip().lower() not in ("0", "false", "off", "no")


def make_beam_decode_fn(model: UniVL, beam_size: int, max_len: int,
                        bos_id: int, eos_id: int, pad_id: int = 0):
    """Returns jitted fn(params, seq, vis, am, vm) -> (tokens [B, max_len],
    scores [B]) decoding with beam search. tokens excludes BOS."""
    K = beam_size

    def decode(params, sequence_output, visual_output, attention_mask, video_mask):
        B = sequence_output.shape[0]
        V = model.cfg.decoder.vocab_size

        # Cross-encode ONCE (hoisted out of the decode loop).
        cross_out, _, concat_mask = model.apply(
            params, sequence_output, visual_output, attention_mask, video_mask,
            method=UniVL.get_cross_output,
        )
        H = cross_out.shape[-1]
        Lenc = cross_out.shape[1]
        # repeat each instance K times: [B*K, Lenc, H]
        cross_rep = jnp.repeat(cross_out, K, axis=0)
        mask_rep = jnp.repeat(concat_mask, K, axis=0)

        seqs0 = jnp.full((B, K, max_len), pad_id, jnp.int32)
        seqs0 = seqs0.at[:, :, 0].set(bos_id)
        # only beam 0 is live initially (reference beam.py:71)
        scores0 = jnp.where(
            jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
        ).astype(jnp.float32) * jnp.ones((B, 1), jnp.float32)
        done0 = jnp.zeros((B,), bool)

        positions = jnp.arange(max_len, dtype=jnp.int32)

        def step(carry, t):
            seqs, scores, done = carry
            dec_mask = (positions[None, :] < t).astype(jnp.int32)
            dec_mask = jnp.broadcast_to(dec_mask, (B * K, max_len))
            logits = model.apply(
                params, cross_rep, mask_rep,
                seqs.reshape(B * K, max_len), dec_mask,
                method=UniVL.decode_step_logits,
            )
            # token t is predicted at position t-1
            step_logits = jax.lax.dynamic_index_in_dim(
                logits, t - 1, axis=1, keepdims=False
            )  # [B*K, V]
            logp = jax.nn.log_softmax(step_logits.astype(jnp.float32), axis=-1)
            logp = logp.reshape(B, K, V)

            cand = scores[:, :, None] + logp  # [B, K, V]
            flat = cand.reshape(B, K * V)
            top_scores, top_idx = jax.lax.top_k(flat, K)  # [B, K]
            prev_k = top_idx // V
            next_y = (top_idx % V).astype(jnp.int32)

            reordered = jnp.take_along_axis(
                seqs, prev_k[:, :, None], axis=1
            )
            new_seqs = reordered.at[:, :, t].set(next_y)

            d = done[:, None, None]
            seqs = jnp.where(d, seqs, new_seqs)
            scores = jnp.where(done[:, None], scores, top_scores)
            newly_done = next_y[:, 0] == eos_id
            done = done | newly_done
            return (seqs, scores, done), None

        (seqs, scores, done), _ = jax.lax.scan(
            step, (seqs0, scores0, done0), jnp.arange(1, max_len)
        )
        # top beam, drop BOS
        return seqs[:, 0, 1:], scores[:, 0]

    return jax.jit(decode)


def _cache_buckets(max_len: int, first: int = 32):
    """Static cache-length schedule: [32, 64, ...] doubling up to max_len.

    Early decode steps run with a small KV cache and the cache is padded to
    the next bucket only when position `t` outgrows it. Per-step cache
    reorder + attention traffic scales with the cache length, and typical
    captions stop (top-beam EOS) within ~10-30 steps, so most steps run at
    the smallest bucket. Bit-identical to a fixed max_len cache: positions
    > t are masked to -1e9 and contribute exactly 0 after softmax.
    """
    sizes = []
    s = min(first, max_len)
    while s < max_len:
        sizes.append(s)
        s *= 2
    sizes.append(max_len)
    return sizes


def make_fast_beam_decode_fn(model: UniVL, beam_size: int, max_len: int,
                             bos_id: int, eos_id: int, pad_id: int = 0,
                             fused_decode: bool | None = None,
                             fused_vocab: bool | None = None):
    """KV-cached beam search: O(L) decoder work per hypothesis instead of the
    full-prefix O(L^2) (see univl_tpu/evals/fast_decoder.py). Produces the
    same hypotheses as make_beam_decode_fn (parity-tested).

    ``fused_decode``: opt-in fused decode attention
    (kernels/decode_attention.py) — the pending beam permutation +
    position-t cache update + QK^T/softmax/AV run in ONE pass over the KV
    cache instead of the ~3 passes of reorder-kernel + XLA attention
    (decode ceiling 1.26x, docs/PERF.md). Numerics match the default path
    to f32 tolerance, not bitwise (reduction order), so it is not the
    default. None (default) defers to the UNIVL_TPU_FUSED_DECODE env var
    (three-state: unset -> off here; '0'/'false'/'off'/'no' -> off; any
    other non-empty value enables). Off-TPU the kernel runs in Pallas
    interpret mode, so the option behaves identically everywhere.

    ``fused_vocab``: opt-in fused classifier->top-k kernel
    (kernels/vocab_topk.py) — the 30,522-vocab tied-classifier GEMM,
    log-softmax normalizer, and per-row top-K stream through VMEM vocab
    tiles; the f32 [B*K, V] logits never exist in HBM and lax.top_k runs
    over [B, K*K] candidates instead of [B, K*V]. Same opt-in contract as
    fused_decode (env UNIVL_TPU_FUSED_VOCAB, three-state; interpret mode
    off-TPU); composes freely with fused_decode."""
    from univl_tpu.evals.fast_decoder import FastDecoder

    K = beam_size

    _use_reorder_kernel = jax.default_backend() == "tpu" and not os.environ.get(
        "UNIVL_TPU_NO_REORDER_KERNEL"
    )
    if fused_decode is None:
        fused_decode = bool(
            fused_decode_env_state(os.environ.get("UNIVL_TPU_FUSED_DECODE", ""))
        )
    _use_fused_decode = bool(fused_decode)
    if fused_vocab is None:
        fused_vocab = bool(
            fused_decode_env_state(os.environ.get("UNIVL_TPU_FUSED_VOCAB", ""))
        )
    _use_fused_vocab = bool(fused_vocab)
    if not _use_fused_vocab and fused_decode_env_state(
        os.environ.get("UNIVL_TPU_FUSED_CLS")
    ) is True:
        # the in-kernel classifier transform lives inside the vocab
        # kernel; without it the flag would be silently ignored and an
        # A/B would compare identical programs
        import warnings

        warnings.warn(
            "UNIVL_TPU_FUSED_CLS=1 has no effect without the fused vocab "
            "kernel (--fused_vocab / UNIVL_TPU_FUSED_VOCAB)", stacklevel=2
        )
    # Off-TPU the real kernels cannot lower; run the Pallas interpreter so an
    # explicit fused_decode=True (or the env var) behaves identically
    # everywhere (CPU parity tests rely on this).
    _fused_interpret = _use_fused_decode and jax.default_backend() != "tpu"
    _vocab_interpret = _use_fused_vocab and jax.default_backend() != "tpu"

    def decode(params, sequence_output, visual_output, attention_mask, video_mask):
        B = sequence_output.shape[0]
        V = model.cfg.decoder.vocab_size

        cross_out, _, concat_mask = model.apply(
            params, sequence_output, visual_output, attention_mask, video_mask,
            method=UniVL.get_cross_output,
        )
        # Beam-shared encoder K/V: precomputed PER INSTANCE [B, H, Lenc, D]
        # (NOT beam-expanded to B*K rows) — _layer_tail folds the beam dim
        # into the attention query length, so each step streams the enc
        # K/V from HBM once per instance instead of K times (the round-4
        # floor profile's largest cluster; floor 21.9 -> 15.3, ceiling
        # 115.7 -> 87.2 ms/batch16, docs/PERF.md). Token trajectories are
        # pinned identical to the full-prefix beam (tests/test_fast_decoder
        # .py); on-chip the Lq=K MXU tiling shifts logits at bf16 tolerance
        # (measured 1.1e-2 worst |dlogp| over a forced 31-step trajectory,
        # tools/verify_beam_shared_enc.py). UNIVL_TPU_SHARED_ENC_KV=0
        # restores the beam-expanded layout (and its exact lowering).
        # default-ON three-state parse: unset -> on; '0'/'false'/... -> off
        _shared_enc = fused_decode_env_state(
            os.environ.get("UNIVL_TPU_SHARED_ENC_KV")
        ) is not False
        enc_src, enc_msk = cross_out, concat_mask
        if not _shared_enc:
            enc_src = jnp.repeat(cross_out, K, axis=0)
            enc_msk = jnp.repeat(concat_mask, K, axis=0)
        enc_bias = ((1.0 - enc_msk.astype(jnp.float32)) * -10000.0)[:, None, None, :]

        cache_dtype = jnp.dtype(model.cfg.compute_dtype)
        fd = FastDecoder(model.cfg.decoder, params["params"])
        enc_kv = fd.precompute_enc_kv(enc_src.astype(cache_dtype))
        # Fused per-layer q/k/v projection for the decode step (one
        # [Hid, 3*Hid] GEMM instead of three): the step body is
        # launch-latency-bound at [B*K, Hid] shapes. Concatenated here,
        # OUTSIDE the while_loops (XLA does not reliably hoist).
        # UNIVL_TPU_DECODE_FUSED_QKV=0 restores the three projections.
        _fuse_qkv = fused_decode_env_state(
            os.environ.get("UNIVL_TPU_DECODE_FUSED_QKV")
        ) is not False
        qkv = fd.precompute_qkv() if _fuse_qkv else None
        buckets = _cache_buckets(max_len)
        cache0 = fd.init_cache(B * K, buckets[0], dtype=cache_dtype)
        if _use_fused_vocab:
            from univl_tpu.kernels.vocab_topk import pad_vocab_inputs

            # hoisted out of the decode while-loops: the kernel consumes the
            # tied classifier weight in compute dtype (the unfused path
            # makes the same cast inside _classify) AND pre-padded to the
            # vocab-tile multiple — XLA does not hoist the pad itself
            # (1.94 ms/decode of repeated weight copies, docs/PERF.md r4)
            # UNIVL_TPU_VOCAB_BLOCK: vocab-tile size (pad + kernel must
            # agree or the kernel re-pads INSIDE the decode loop)
            _blk = int(os.environ.get("UNIVL_TPU_VOCAB_BLOCK", "2048") or "2048")
            cls_w, cls_b = pad_vocab_inputs(
                fd.word_embed.astype(cache_dtype),
                fd.p["classifier_bias"].astype(jnp.float32),
                block_v=_blk,
            )
            # UNIVL_TPU_FUSED_CLS=1 (opt-in): run the classifier transform
            # (dense -> erf-GELU -> LN) INSIDE the vocab kernel at tile 0
            # (kernels/vocab_topk.py ``transform=``) — three fewer XLA ops
            # per decode step. Measured a WASH on v5e (two A/B pairs:
            # floor 15.2 vs 15.3 ms means, ceiling 84.8 vs 85.3 — the
            # removed ops were already overlapped, and the tile-0
            # transform serializes ahead of the first vocab GEMM), so it
            # stays off by default; docs/PERF.md round-5 rejection table.
            _fuse_cls = fused_decode_env_state(
                os.environ.get("UNIVL_TPU_FUSED_CLS")
            ) is True
            cls_transform = None
            if _fuse_cls:
                ct = fd.p["classifier_transform"]
                cls_transform = (
                    ct["dense"]["kernel"], ct["dense"]["bias"],
                    ct["ln"]["scale"], ct["ln"]["bias"], 1e-12,
                )
        # what the decoder step should return: logits (False), the
        # post-transform hidden (True), or the raw pre-transform hidden
        # ("raw", transform runs in the vocab kernel)
        _rh = False
        if _use_fused_vocab:
            _rh = "raw" if cls_transform is not None else True

        seqs0 = jnp.full((B, K, max_len), pad_id, jnp.int32)
        seqs0 = seqs0.at[:, :, 0].set(bos_id)
        scores0 = jnp.where(
            jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
        ).astype(jnp.float32) * jnp.ones((B, 1), jnp.float32)
        done0 = jnp.zeros((B,), bool)

        def step(carry, t):
            seqs, scores, done, cache, perm = carry
            tok = seqs[:, :, t - 1].reshape(B * K)
            if _use_fused_decode:
                # Deferred permutation: `perm` is LAST step's beam
                # reordering, applied here during the fused attention's
                # single cache pass (read permuted + write position t-1 +
                # attend), so no separate reorder pass runs at all.
                out, new_cache = fd.step_fused(
                    tok, t - 1, cache, enc_kv, enc_bias,
                    perm.reshape(B * K), K, interpret=_fused_interpret,
                    return_hidden=_rh, qkv=qkv,
                )
            else:
                out, new_cache = fd.step(
                    tok, t - 1, cache, enc_kv, enc_bias,
                    return_hidden=_rh, qkv=qkv,
                )
            if _use_fused_vocab:
                from univl_tpu.kernels.vocab_topk import classify_topk

                # per-row top-K logp + normalizer, no [B*K, V] HBM logits;
                # any global top-K candidate is inside its row's top-K, so
                # the K*K-candidate top_k below selects the same beams as
                # the full K*V one (values to f32 tolerance)
                logp_top, idx_top = classify_topk(
                    out, cls_w, cls_b, K, block_v=_blk,
                    interpret=_vocab_interpret, transform=cls_transform,
                )
                cand = scores[:, :, None] + logp_top.reshape(B, K, K)
                top_scores, pos = jax.lax.top_k(cand.reshape(B, K * K), K)
                prev_k = pos // K
                next_y = jnp.take_along_axis(
                    idx_top.reshape(B, K * K), pos, axis=1
                ).astype(jnp.int32)
            else:
                logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                logp = logp.reshape(B, K, V)

                cand = scores[:, :, None] + logp
                flat = cand.reshape(B, K * V)
                top_scores, top_idx = jax.lax.top_k(flat, K)
                prev_k = top_idx // V
                next_y = (top_idx % V).astype(jnp.int32)

            reordered = jnp.take_along_axis(seqs, prev_k[:, :, None], axis=1)
            new_seqs = reordered.at[:, :, t].set(next_y)

            # Reorder the KV cache to follow the surviving beams. Done
            # instances keep their rows (identity permutation) — folding the
            # done-freeze into the permutation avoids a second full-cache
            # where().
            prev_k_eff = jnp.where(
                done[:, None], jnp.arange(K)[None, :], prev_k
            )
            if _use_fused_decode:
                cache = new_cache
                perm = prev_k_eff  # applied inside NEXT step's fused pass
            elif _use_reorder_kernel:
                # Pallas grouped IN-PLACE permute (donated buffers): every
                # cache byte moves once in its native layout AND the while
                # carry keeps a stable buffer per array, so XLA inserts no
                # round-trip copies. The XLA alternatives both lose: a jnp
                # row gather defeats the carry's in-place aliasing (494 ms
                # vs 398 ms per batch-16 decode), and the one-hot einsum
                # pays retiling copies around the [B,K,flat] reshape
                # (~60% of decode device time, docs/PERF.md).
                from univl_tpu.kernels.reorder import beam_reorder_groups_inplace

                flat = [leaf for layer in new_cache for leaf in layer]
                out = beam_reorder_groups_inplace(
                    flat, prev_k_eff.reshape(B * K), K
                )
                cache = tuple(
                    (out[2 * i], out[2 * i + 1]) for i in range(len(new_cache))
                )
            else:
                perm_oh = jax.nn.one_hot(prev_k_eff, K, dtype=cache_dtype)  # [B,Kn,Ko]

                def reorder(c):
                    cb = c.reshape(B, K, -1)
                    cb = jnp.einsum(
                        "bnk,bkf->bnf", perm_oh, cb.astype(cache_dtype)
                    )
                    return cb.reshape(c.shape)

                cache = jax.tree.map(reorder, new_cache)

            d3 = done[:, None, None]
            seqs = jnp.where(d3, seqs, new_seqs)
            scores = jnp.where(done[:, None], scores, top_scores)
            done = done | (next_y[:, 0] == eos_id)
            return seqs, scores, done, cache, perm

        # Early exit when every instance's top beam has emitted EOS — the
        # reference stops its Python loop the same way
        # (main_task_caption.py:543-545). Typical captions finish in 10-30
        # steps; running the full max_len scan wastes 4-10x decode time.
        # The KV cache runs through STATIC size buckets (32 -> 64 -> ...):
        # one while_loop per bucket, cache zero-padded between buckets, so
        # short captions never pay max_len-sized cache traffic.
        #
        # UNIVL_TPU_DECODE_UNROLL=U (>1) runs U decode steps per while_loop
        # iteration: the per-iteration scheduling bubble (the floor
        # profile's ~0.2 ms/step wall-minus-self gap, docs/PERF.md round-4)
        # is paid once per U steps. Trajectories are unchanged: step() is
        # deterministic and done-freezing masks any sub-step that runs
        # after all instances finish; a 1-step remainder loop covers the
        # bucket tail so no step past the bucket bound ever executes.
        # U=1 compiles the exact pre-unroll program.
        unroll = max(1, int(os.environ.get("UNIVL_TPU_DECODE_UNROLL", "1") or "1"))

        def body(carry):
            t, seqs, scores, done, cache, perm = carry
            seqs, scores, done, cache, perm = step(
                (seqs, scores, done, cache, perm), t
            )
            return (t + 1, seqs, scores, done, cache, perm)

        def body_u(carry):
            for _ in range(unroll):
                carry = body(carry)
            return carry

        t = jnp.asarray(1, jnp.int32)
        seqs, scores, done, cache = seqs0, scores0, done0, cache0
        # pending beam permutation (fused path only): identity at start
        perm = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))
        for b_i, bound in enumerate(buckets):
            if b_i > 0:
                grow = bound - buckets[b_i - 1]
                cache = jax.tree.map(
                    lambda c: jnp.pad(c, ((0, 0), (0, 0), (0, grow), (0, 0))),
                    cache,
                )

            def cond(carry, _bound=bound):
                t = carry[0]
                done = carry[3]
                return (t < _bound) & ~jnp.all(done)

            carry = (t, seqs, scores, done, cache, perm)
            if unroll > 1:
                def cond_u(carry, _bound=bound):
                    t = carry[0]
                    done = carry[3]
                    # all `unroll` sub-steps must satisfy t < bound
                    return (t + (unroll - 1) < _bound) & ~jnp.all(done)

                carry = jax.lax.while_loop(cond_u, body_u, carry)
            t, seqs, scores, done, cache, perm = jax.lax.while_loop(
                cond, body, carry
            )
        return seqs[:, 0, 1:], scores[:, 0]

    return jax.jit(decode)


def ids_to_text(ids, tokenizer) -> str:
    """Strip at first [SEP], drop [PAD], merge '##' wordpieces
    (reference: main_task_caption.py:553-575)."""
    toks = tokenizer.convert_ids_to_tokens(
        [int(i) for i in np.asarray(ids)]
    )
    if "[SEP]" in toks:
        toks = toks[: toks.index("[SEP]")]
    toks = [t for t in toks if t not in ("[PAD]",)]
    words: list = []
    for t in toks:
        if t.startswith("##") and words:
            words[-1] = words[-1] + t[2:]
        else:
            words.append(t)
    return " ".join(words)


class CaptionGenerator:
    """Batched caption generation: encode -> beam decode -> text."""

    def __init__(self, model: UniVL, params, tokenizer, beam_size: int = 5,
                 max_len: int = 48, batch_size: int = 16,
                 incremental: bool = True, mesh=None,
                 fused_decode: bool | None = None,
                 fused_vocab: bool | None = None):
        """``mesh``: optional 1-D dp Mesh — eval batches are sharded over
        the batch dim so each device decodes its share of the beam batch
        (the caption-side analogue of the retrieval eval fan-out).
        ``fused_decode``/``fused_vocab``: see make_fast_beam_decode_fn
        (incremental only)."""
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            assert batch_size % mesh.devices.size == 0, (
                batch_size, mesh.devices.size
            )

        @jax.jit
        def encode_fn(params, input_ids, token_type_ids, attention_mask, video, video_mask):
            return model.apply(
                params, input_ids, token_type_ids, attention_mask, video, video_mask,
                method=UniVL.encode,
            )

        self._encode = encode_fn
        kw = (
            {"fused_decode": fused_decode, "fused_vocab": fused_vocab}
            if incremental else {}
        )
        make = make_fast_beam_decode_fn if incremental else make_beam_decode_fn
        self._decode = make(
            model, beam_size, max_len,
            bos_id=tokenizer.bos_id, eos_id=tokenizer.eos_id,
            pad_id=tokenizer.pad_id, **kw,
        )

    def generate(self, batch: Dict[str, np.ndarray]):
        if self._sharding is not None:
            import jax as _jax

            batch = {
                k: _jax.device_put(v, self._sharding) for k, v in batch.items()
            }
        seq, vis = self._encode(
            self.params,
            batch["input_ids"], batch["token_type_ids"],
            batch["attention_mask"], batch["video"], batch["video_mask"],
        )
        tokens, scores = self._decode(
            self.params, seq, vis, batch["attention_mask"], batch["video_mask"]
        )
        tokens = np.asarray(tokens)
        return [ids_to_text(tokens[i], self.tokenizer) for i in range(tokens.shape[0])]
