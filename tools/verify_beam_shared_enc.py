"""On-chip verify: beam-shared encoder K/V in the fast decoder.

evals/beam.py precomputes the encoder-attention K/V PER INSTANCE
([B, H, Lenc, D]) and FastDecoder._layer_tail folds the beam dim into the
attention query length (Lq=K) — each decode step streams the enc K/V from
HBM once per instance instead of K times (the round-4 floor profile's
largest cluster, docs/PERF.md). The contract is that this is the SAME
math as the beam-expanded layout ([B*K, H, Lenc, D], Lq=1): identical dot
products in identical contraction order.

This script drives a teacher-forced trajectory (same forced tokens, no
beam search — excluding top-k tie chaos, same rationale as
tools/verify_fused_decode.py) through FastDecoder.step() twice: once with
the expanded enc K/V, once with the per-instance grouped layout, and
compares per-step log-probs on the REAL chip (CPU bit-identity is pinned
by tests/test_fast_decoder.py; the MXU's bf16 tiling is what this checks).

Exits 1 if max |Δlogp| exceeds the backend tolerance: 5e-2 on TPU (the
Lq=K layout retiles the bf16 MXU contractions — measured 1.1e-2 worst
over 31 forced steps, docs/PERF.md round-4) or 1e-4 on CPU (f32, where
the layouts are bit-identical). Usage: python tools/verify_beam_shared_enc.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from univl_tpu.config import UniVLConfig
    from univl_tpu.evals.fast_decoder import FastDecoder
    from univl_tpu.models.univl import UniVL

    on_tpu = jax.default_backend() == "tpu"
    B, K, T = 16, 5, 31
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False, stage_two=True, task_type="caption",
        batch_size_per_device=B,
    )
    model = UniVL(cfg)
    rng = np.random.RandomState(0)
    Lw, Lf, D = cfg.max_words, cfg.max_frames, cfg.video_dim
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 30000, (B, Lw)), jnp.int32),
        "token_type_ids": jnp.zeros((B, Lw), jnp.int32),
        "attention_mask": jnp.ones((B, Lw), jnp.int32),
        "video": jnp.asarray(rng.randn(B, Lf, D), jnp.float32),
        "video_mask": jnp.ones((B, Lf), jnp.int32),
    }
    init_batch = dict(
        batch,
        input_caption_ids=jnp.asarray(rng.randint(1, 30000, (B, Lw)), jnp.int32),
        decoder_mask=jnp.ones((B, Lw), jnp.int32),
        output_caption_ids=jnp.asarray(rng.randint(1, 30000, (B, Lw)), jnp.int32),
    )
    params = jax.jit(lambda k: model.init(k, init_batch, deterministic=True))(
        jax.random.key(0)
    )
    seq_out, vis_out = jax.jit(
        lambda p, b: model.apply(
            p, b["input_ids"], b["token_type_ids"], b["attention_mask"],
            b["video"], b["video_mask"], method=UniVL.encode,
        )
    )(params, batch)
    cross_out, _, concat_mask = jax.jit(
        lambda p, so, vo, am, vm: model.apply(
            p, so, vo, am, vm, method=UniVL.get_cross_output
        )
    )(params, seq_out, vis_out, batch["attention_mask"], batch["video_mask"])

    cache_dtype = jnp.dtype(model.cfg.compute_dtype)
    fd = FastDecoder(model.cfg.decoder, params["params"])

    # layout A: beam-expanded [B*K, H, Lenc, D] (the pre-round-4 layout)
    cross_rep = jnp.repeat(cross_out, K, axis=0).astype(cache_dtype)
    mask_rep = jnp.repeat(concat_mask, K, axis=0)
    bias_a = ((1.0 - mask_rep.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    kv_a = fd.precompute_enc_kv(cross_rep)
    # layout B: per-instance [B, H, Lenc, D] (beam-shared)
    bias_b = ((1.0 - concat_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    kv_b = fd.precompute_enc_kv(cross_out.astype(cache_dtype))

    toks = jnp.asarray(rng.randint(1, 30000, (T, B * K)), jnp.int32)

    # everything big is an ARGUMENT, not a closure: closed-over device
    # arrays become HLO literals and the tunneled remote-compile endpoint
    # rejects them (HTTP 413, CLAUDE.md)
    @jax.jit
    def run(p, kv_a, bias_a, kv_b, bias_b, toks):
        fd = FastDecoder(model.cfg.decoder, p["params"])

        def body(carry, inp):
            cache_a, cache_b = carry
            t, tok = inp
            out_a, cache_a = fd.step(tok, t, cache_a, kv_a, bias_a)
            out_b, cache_b = fd.step(tok, t, cache_b, kv_b, bias_b)
            la = jax.nn.log_softmax(out_a.astype(jnp.float32), axis=-1)
            lb = jax.nn.log_softmax(out_b.astype(jnp.float32), axis=-1)
            return (cache_a, cache_b), jnp.max(jnp.abs(la - lb))

        init = (
            fd.init_cache(B * K, T, dtype=cache_dtype),
            fd.init_cache(B * K, T, dtype=cache_dtype),
        )
        _, diffs = jax.lax.scan(
            body, init, (jnp.arange(T, dtype=jnp.int32), toks)
        )
        return diffs

    diffs = np.asarray(run(params, kv_a, bias_a, kv_b, bias_b, toks))
    # CPU/f32: the two layouts agree to fp32 noise (measured 3.8e-6).
    # TPU/bf16: the Lq=K einsum tiles the MXU differently from Lq=1, so
    # logits shift at bf16 tolerance (measured 1.1e-2 worst over 31
    # steps). The trajectory contract (identical tokens vs the full-prefix
    # beam) is pinned separately by tests/test_fast_decoder.py.
    tol = 5e-2 if jax.default_backend() == "tpu" else 1e-4
    print(f"backend={jax.default_backend()} steps={T} "
          f"max|dlogp|={diffs.max():.3e} (tol {tol}) per-step head: "
          f"{[f'{d:.1e}' for d in diffs[:6]]}", flush=True)
    if diffs.max() > tol:
        print("FAIL: beam-shared enc K/V diverges from expanded layout")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
