"""Incremental (KV-cache) caption decoder — the beam-search hot path.

The reference re-encodes the FULL decode prefix through the decoder at every
beam step (main_task_caption.py:434-477 -> modeling.py:393-407), i.e.
O(L^2) decoder work per hypothesis. This module is a functional inference
engine over the UniVL params tree:

  - encoder-attention K/V are projected ONCE per sequence (precompute)
  - self-attention K/V are cached per position; each step embeds one token
    and attends over the cache -> O(L) total decoder work
  - pure jnp on the params pytree (no flax module re-entry inside lax.scan)

Exact-parity with CaptionDecoder's full-prefix logits is enforced by
tests/test_fast_decoder.py.
"""

from __future__ import annotations

import math
import os

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from univl_tpu.config import DecoderConfig


def _ln(x, p, eps=1e-12):
    # Mirrors nn.layers.LayerNormTF in BOTH of its modes — including the
    # opt-in UNIVL_TPU_FUSED_LN Pallas swap — so the KV-cache decode stays
    # bit-identical to the full-prefix decoder under every configuration
    # (CLAUDE.md invariant; pinned by tests/test_fast_decoder.py).
    from univl_tpu.nn.layers import _fused_ln_enabled

    if _fused_ln_enabled():
        from univl_tpu.kernels.layernorm import fused_layer_norm

        return fused_layer_norm(x, p["scale"], p["bias"], eps)
    xf = x.astype(jnp.float32)
    u = jnp.mean(xf, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
    return ((xf - u) * jax.lax.rsqrt(s + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return (
        jnp.einsum("...i,io->...o", x, p["kernel"], preferred_element_type=jnp.float32)
        + p["bias"]
    ).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# cache: tuple of per-layer (k, v) arrays, each [B, H, Lmax, D].
# Per-layer arrays (not one stacked [n_layers, ...] buffer) keep XLA's
# in-place dynamic-update-slice aliasing effective inside lax.scan, and the
# beam reorder touches each layer independently.
DecodeCache = Tuple


class FastDecoder:
    """Functional incremental decoder over the UniVL params tree."""

    def __init__(self, cfg: DecoderConfig, params: Dict):
        self.cfg = cfg
        self.p = params["decoder"]
        self.word_embed = params["word_embed"]["embedding"]
        self.pos_embed = params["text_pos_embed"]["embedding"]
        self.n_layers = cfg.num_decoder_layers
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads

    def _split(self, x):
        # [B, T, H*D] -> [B, heads, T, D]
        b, t, _ = x.shape
        return x.reshape(b, t, self.heads, self.head_dim).transpose(0, 2, 1, 3)

    # ---------------------------------------------------------------- #
    def precompute_enc_kv(self, encoder_out: jax.Array):
        """Per-layer encoder-attention K/V: tuple of ([B,H,Lenc,D], [B,H,Lenc,D])."""
        out = []
        for i in range(self.n_layers):
            att = self.p[f"layer_{i}"]["enc_attn"]
            out.append((
                self._split(_dense(encoder_out, att["key"])),
                self._split(_dense(encoder_out, att["value"])),
            ))
        return tuple(out)

    def precompute_qkv(self):
        """Per-layer fused self-attention q/k/v projection weights:
        tuple of ([Hid, 3*Hid], [3*Hid]) concatenations of the
        query/key/value kernels. The decode step's three [B*K, Hid] GEMMs
        collapse into one — at decode shapes the projections are
        launch-latency-bound, not MXU-bound (the train-side fused-QKV A/B
        that REJECTED this fusion ran at [1536, 768] MXU-bound shapes,
        docs/PERF.md round-4). Each fused output column is the same dot
        product over the same contraction order as its per-projection
        counterpart. Must be called OUTSIDE the decode loop — XLA does
        not reliably hoist loop-invariant concats (the vocab-pad lesson,
        docs/PERF.md round-4 item 1)."""
        out = []
        for i in range(self.n_layers):
            slf = self.p[f"layer_{i}"]["self_attn"]
            w = jnp.concatenate(
                [slf[k]["kernel"] for k in ("query", "key", "value")], axis=1
            )
            b = jnp.concatenate(
                [slf[k]["bias"] for k in ("query", "key", "value")]
            )
            out.append((w, b))
        return tuple(out)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> DecodeCache:
        shape = (batch, self.heads, max_len, self.head_dim)
        return tuple(
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(self.n_layers)
        )

    # ---------------------------------------------------------------- #
    def _embed(self, tok, t):
        x = self.word_embed[tok] + self.pos_embed[t]
        return _ln(x[:, None, :], self.p["embed_ln"])  # [B, 1, H]

    def _layer_tail(self, ctx, x, lp, enc_kv_i, enc_bias, scale, B):
        """Everything after the self-attention context: self-attn output
        projection + LN, encoder attention, FFN. Shared verbatim between
        the XLA step() and the fused-kernel step_fused() paths."""
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, -1)
        slf_out = _ln(
            _dense(ctx, lp["self_attn_output"]["dense"]) + x,
            lp["self_attn_output"]["ln"],
        )

        enc = lp["enc_attn"]
        ek, ev = enc_kv_i
        q2 = self._split(_dense(slf_out, enc["query"]))  # [B, H, 1, D]
        if ek.shape[0] != B:
            # Beam-shared encoder K/V: enc_kv was precomputed PER INSTANCE
            # ([B/K, H, Lenc, D]) instead of per beam row. The K beams of
            # one instance attend to identical K/V, so folding the beam dim
            # into the attention QUERY length (Lq=K) streams each
            # instance's K/V from HBM once per step instead of K times —
            # the floor profile's largest cluster (3x(1.11+0.84) ms of
            # [B*K,H,Lenc,D] enc-attn reads, docs/PERF.md round-4 floor).
            # Rows are instance-major/beam-minor (seqs[:, :, t].reshape
            # (B*K) in evals/beam.py), matching this reshape. Each output
            # element is the same dot product over the same contraction
            # order as the expanded layout — bit-identity preserved
            # (tests/test_fast_decoder.py).
            Be = ek.shape[0]
            G = B // Be
            q2g = q2.reshape(Be, G, self.heads, self.head_dim)
            q2g = q2g.transpose(0, 2, 1, 3)  # [Be, H, G, D]
            scores2 = (
                jnp.einsum(
                    "bhgd,bhkd->bhgk", q2g, ek,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            scores2 = scores2 + enc_bias.astype(jnp.float32)
            probs2 = jax.nn.softmax(scores2, axis=-1).astype(x.dtype)
            ctx2 = jnp.einsum(
                "bhgk,bhkd->bhgd", probs2, ev,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            ctx2 = ctx2.transpose(0, 2, 1, 3).reshape(B, 1, -1)
        else:
            scores2 = (
                jnp.einsum(
                    "bhqd,bhkd->bhqk", q2, ek,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            scores2 = scores2 + enc_bias.astype(jnp.float32)
            probs2 = jax.nn.softmax(scores2, axis=-1).astype(x.dtype)
            ctx2 = jnp.einsum(
                "bhqk,bhkd->bhqd", probs2, ev,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            ctx2 = ctx2.transpose(0, 2, 1, 3).reshape(B, 1, -1)
        enc_out = _ln(
            _dense(ctx2, lp["enc_attn_output"]["dense"]) + slf_out,
            lp["enc_attn_output"]["ln"],
        )

        inter = _gelu(_dense(enc_out, lp["intermediate"]))
        return _ln(
            _dense(inter, lp["output"]["dense"]) + enc_out,
            lp["output"]["ln"],
        )

    def _classify_hidden(self, x):
        """Classifier transform (dense -> GELU -> LN), WITHOUT the tied
        30k-vocab GEMM: the fused vocab-topk decode path
        (kernels/vocab_topk.py) runs that GEMM inside the kernel."""
        ct = self.p["classifier_transform"]
        return _ln(_gelu(_dense(x, ct["dense"])), ct["ln"])  # [B, 1, H]

    def _classify(self, x):
        h = self._classify_hidden(x)
        return (
            jnp.einsum(
                "bqh,vh->bqv", h, self.word_embed.astype(h.dtype),
                preferred_element_type=jnp.float32,
            )
            + self.p["classifier_bias"]
        )[:, 0, :]

    def step(
        self,
        tok: jax.Array,  # [B] int32 token at position t
        t: jax.Array,  # scalar position
        cache: DecodeCache,  # tuple of per-layer (k, v) [B, H, Lmax, D]
        enc_kv: DecodeCache,  # tuple of per-layer (k, v) [B, H, Lenc, D]
        enc_bias: jax.Array,  # [B, 1, 1, Lenc] additive
        return_hidden: bool = False,
        qkv=None,  # optional precompute_qkv() output: fused projections
    ) -> Tuple[jax.Array, DecodeCache]:
        """Returns (logits [B, V], new cache). Embeds token at position t and
        predicts position t+1's distribution. ``return_hidden=True`` returns
        the post-classifier-transform hidden [B, H] instead of logits (the
        fused vocab-topk path computes the tied GEMM in-kernel)."""
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, jnp.float32))
        B = tok.shape[0]
        Lmax = cache[0][0].shape[2]

        x = self._embed(tok, t)

        pos_mask = (
            jnp.arange(Lmax)[None, None, None, :] <= t
        )  # [1,1,1,Lmax] keys up to and incl. t

        new_cache = []
        for i in range(self.n_layers):
            lp = self.p[f"layer_{i}"]
            slf = lp["self_attn"]
            if qkv is not None:
                f = _dense(x, {"kernel": qkv[i][0], "bias": qkv[i][1]})
                qh, kh, vh = jnp.split(f, 3, axis=-1)
                q, k_t, v_t = map(self._split, (qh, kh, vh))
            else:
                q = self._split(_dense(x, slf["query"]))  # [B, H, 1, D]
                k_t = self._split(_dense(x, slf["key"]))
                v_t = self._split(_dense(x, slf["value"]))
            ck, cv = cache[i]
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k_t.astype(ck.dtype), t, axis=2
            )
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v_t.astype(cv.dtype), t, axis=2
            )
            new_cache.append((ck, cv))

            scores = (
                jnp.einsum(
                    "bhqd,bhkd->bhqk", q, ck,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            scores = jnp.where(pos_mask, scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx = jnp.einsum(
                "bhqk,bhkd->bhqd", probs, cv.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            x = self._layer_tail(ctx, x, lp, enc_kv[i], enc_bias, scale, B)

        if return_hidden:
            if return_hidden == "raw":
                # pre-transform hidden: the fused vocab kernel runs the
                # classifier transform in-kernel (kernels/vocab_topk.py
                # ``transform=``)
                return x[:, 0, :], tuple(new_cache)
            return self._classify_hidden(x)[:, 0, :], tuple(new_cache)
        return self._classify(x), tuple(new_cache)

    def step_fused(
        self,
        tok: jax.Array,  # [B] int32 token at position t (NEW beam order)
        t: jax.Array,  # scalar position
        cache: DecodeCache,  # per-layer (k, v) in PREVIOUS beam order
        enc_kv: DecodeCache,
        enc_bias: jax.Array,
        perm: jax.Array,  # [B] int32 LOCAL source row within each group
        group: int,  # beam width K
        interpret: bool = False,
        return_hidden: bool = False,
        qkv=None,  # optional precompute_qkv() output: fused projections
    ) -> Tuple[jax.Array, DecodeCache]:
        """step() with the pending beam permutation fused into the
        self-attention cache pass (kernels/decode_attention.py): the cache
        arrives one permutation behind and leaves reordered + updated.
        Numerics match step()+reorder to f32-tolerance (reduction-order
        differences only); opt-in via UNIVL_TPU_FUSED_DECODE."""
        from univl_tpu.kernels.decode_attention import beam_decode_self_attention

        scale = 1.0 / math.sqrt(self.head_dim)
        B = tok.shape[0]

        x = self._embed(tok, t)

        new_cache = []
        for i in range(self.n_layers):
            lp = self.p[f"layer_{i}"]
            slf = lp["self_attn"]
            if qkv is not None:
                f = _dense(x, {"kernel": qkv[i][0], "bias": qkv[i][1]})[:, 0]
                qh, kh, vh = jnp.split(f, 3, axis=-1)
                q, k_t, v_t = (
                    a.reshape(B, self.heads, self.head_dim) for a in (qh, kh, vh)
                )
            else:
                q = _dense(x, slf["query"])[:, 0].reshape(B, self.heads, self.head_dim)
                k_t = _dense(x, slf["key"])[:, 0].reshape(B, self.heads, self.head_dim)
                v_t = _dense(x, slf["value"])[:, 0].reshape(B, self.heads, self.head_dim)
            ck, cv = cache[i]
            # UNIVL_TPU_DECODE_GPB: beam groups per Pallas grid program
            # (kernels/decode_attention.py groups_per_block) — fewer,
            # larger block DMAs amortize per-program transfer latency.
            # Default 4: the round-5 delta-protocol sweep
            # (tools/bench_decode_gpb.py) measured 38.3 -> 29.6 us/call at
            # the L=32 floor (1.29x; 8 and 16 regress) and parity at
            # L=128. The kernel falls back to gpb=1 when the beam batch
            # does not divide; interpret-mode bitwise identity across
            # gpb in {1,2,4} is pinned in tests/test_fast_decoder.py.
            gpb = int(os.environ.get("UNIVL_TPU_DECODE_GPB", "4") or "4")
            ctx, ck, cv = beam_decode_self_attention(
                q, k_t, v_t, ck, cv, perm, t, group,
                scale=scale, interpret=interpret, groups_per_block=gpb,
            )
            new_cache.append((ck, cv))
            x = self._layer_tail(
                ctx[:, :, None, :], x, lp, enc_kv[i], enc_bias, scale, B
            )

        if return_hidden:
            if return_hidden == "raw":
                # pre-transform hidden: the fused vocab kernel runs the
                # classifier transform in-kernel (kernels/vocab_topk.py
                # ``transform=``)
                return x[:, 0, :], tuple(new_cache)
            return self._classify_hidden(x)[:, 0, :], tuple(new_cache)
        return self._classify(x), tuple(new_cache)
