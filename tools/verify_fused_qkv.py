"""On-chip verify: fused decode-step q/k/v projection.

evals/fast_decoder.py precompute_qkv() concatenates each decoder layer's
self-attention query/key/value kernels into one [Hid, 3*Hid] matrix so
the decode step issues ONE GEMM instead of three (default ON since
round 5; UNIVL_TPU_DECODE_FUSED_QKV=0 restores the per-projection
path). Each fused output column is the same dot product over the same
contraction order — but the MXU may TILE a [B*K, 768] x [768, 2304]
GEMM differently from three [768, 768] ones, shifting bf16 logits in
the last ulps on the real chip (the same failure class the beam-shared
enc K/V layout gate covers, tools/verify_beam_shared_enc.py).

This script drives a teacher-forced trajectory (same forced tokens, no
beam search — excluding top-k tie chaos) through FastDecoder.step()
twice, with and without the fused projection, and compares per-step
log-probs on the REAL chip (CPU token/score parity vs the full-prefix
beam is pinned by tests/test_fast_decoder.py for both paths).

Exits 1 if max |dlogp| exceeds the backend tolerance: 5e-2 on TPU
(bf16 retiling headroom, same budget as the shared-enc gate) or 1e-4
on CPU (f32). Usage: python tools/verify_fused_qkv.py
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
    fd_host = FastDecoder(model.cfg.decoder, params["params"])

    # beam-shared per-instance enc K/V (the production layout)
    bias = ((1.0 - concat_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    enc_kv = fd_host.precompute_enc_kv(cross_out.astype(cache_dtype))

    toks = jnp.asarray(rng.randint(1, 30000, (T, B * K)), jnp.int32)

    # everything big is an ARGUMENT, not a closure: closed-over device
    # arrays become HLO literals and the tunneled remote-compile endpoint
    # rejects them (HTTP 413, CLAUDE.md)
    @jax.jit
    def run(p, enc_kv, bias, toks):
        fd = FastDecoder(model.cfg.decoder, p["params"])
        qkv = fd.precompute_qkv()  # hoisted outside the scan, like beam.py

        def body(carry, inp):
            cache_a, cache_b = carry
            t, tok = inp
            out_a, cache_a = fd.step(tok, t, cache_a, enc_kv, bias)
            out_b, cache_b = fd.step(tok, t, cache_b, enc_kv, bias, qkv=qkv)
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

    diffs = np.asarray(run(params, enc_kv, bias, toks))
    tol = 5e-2 if jax.default_backend() == "tpu" else 1e-4
    print(f"backend={jax.default_backend()} steps={T} "
          f"max|dlogp|={diffs.max():.3e} (tol {tol}) per-step head: "
          f"{[f'{d:.1e}' for d in diffs[:6]]}", flush=True)
    if diffs.max() > tol:
        print("FAIL: fused step-QKV diverges from per-projection path")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
