"""On-chip verify: UNIVL_TPU_FUSED_DECODE fused decode-attention kernel.

A/B of the default fast beam decoder (grouped Pallas reorder + XLA
attention) vs the fused deferred-permutation kernel
(kernels/decode_attention.py) at the YouCook2 caption eval config
(B=16, beam 5, 3-layer decoder):

  1. parity: same hypotheses tokens (near-tie top-k flips reported, not
     failed — the two paths differ in reduction order, docs/PERF.md notes
     the same caveat for the default kernel path) + scores allclose
  2. throughput at the no-EOS ceiling (max_words=128, all buckets)
  3. throughput at the bucket-32 floor (max_words=32 — the regime real
     ~20-30-step captions run in)

Timing: chained decodes + ONE host fetch (axon does not sync on
block_until_ready). Exits 1 on parity failure.

Usage: python tools/verify_fused_decode.py [n_timed=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build(B=16):
    from univl_tpu.config import UniVLConfig
    from univl_tpu.models.univl import UniVL

    on_tpu = jax.default_backend() == "tpu"
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False,
        stage_two=True,
        task_type="caption",
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
    return model, params, batch, seq_out, vis_out


def timed(decode, args, n, B):
    t0 = time.time()
    seqs, scores = decode(*args)
    s = np.asarray(scores)
    print(f"  compile+first: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(n):
        seqs, scores = decode(*args)
    s = np.asarray(scores)
    dt = (time.time() - t0) / n
    print(f"  {dt * 1000:.1f} ms/batch{B} ({dt / B * 1000:.2f} ms/caption)",
          flush=True)
    return np.asarray(seqs), s, dt


def main():
    n_timed = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")
    from univl_tpu.evals.beam import make_fast_beam_decode_fn
    import univl_tpu.evals.beam as beam_mod

    B, K = 16, 5
    model, params, batch, seq_out, vis_out = build(B)
    args = (params, seq_out, vis_out, batch["attention_mask"], batch["video_mask"])

    ok = True
    results = {}
    for name, max_len in (("ceiling(max128, no-EOS)", 128), ("floor(max32, no-EOS)", 32)):
        os.environ.pop("UNIVL_TPU_FUSED_DECODE", None)
        base = make_fast_beam_decode_fn(model, K, max_len, bos_id=101, eos_id=-1)
        print(f"[{name}] default (reorder kernel + XLA attention):", flush=True)
        t1, s1, dt1 = timed(base, args, n_timed, B)

        os.environ["UNIVL_TPU_FUSED_DECODE"] = "1"
        fused = make_fast_beam_decode_fn(model, K, max_len, bos_id=101, eos_id=-1)
        print(f"[{name}] fused decode-attention kernel:", flush=True)
        t2, s2, dt2 = timed(fused, args, n_timed, B)
        os.environ.pop("UNIVL_TPU_FUSED_DECODE", None)

        mism = int((t1 != t2).sum())
        sdiff = float(np.max(np.abs(s1 - s2)))
        print(f"[{name}] speedup {dt1 / dt2:.2f}x; token mismatches "
              f"{mism}/{t1.size}; max |score diff| {sdiff:.2e}", flush=True)
        results[name] = (dt1, dt2, mism, sdiff)
        # near-tie top-k flips cascade into different (equally-scored)
        # hypotheses; require scores to stay close and mismatches rare
        if sdiff > 5e-2 or mism > 0.05 * t1.size:
            ok = False

    print("VERIFY", "PASS" if ok else "FAIL", results, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
