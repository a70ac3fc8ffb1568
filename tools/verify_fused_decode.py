"""On-chip verify: UNIVL_TPU_FUSED_DECODE fused decode-attention kernel.

Two legs, at the YouCook2 caption eval config (B=16, beam 5, 3-layer
decoder, bf16 compute):

  1. PARITY (the pass/fail criterion): teacher-forced trajectory — drive
     FastDecoder.step()+reorder and FastDecoder.step_fused() with the SAME
     forced tokens and the SAME forced beam permutations for a full
     63-step trajectory, comparing per-step log-probs. This checks the
     deferred-permutation semantics + kernel numerics over a long rollout
     while excluding beam-search tie chaos: a FREE-RUNNING A/B on random
     weights produces near-uniform logits whose top-k flips at bf16
     reduction-order differences and then diverges irrecoverably —
     hypothesis mismatch there measures argmax sensitivity, not kernel
     correctness (the bitwise cache-movement check lives in
     tools/tpu_checks.py).
  2. THROUGHPUT: free-running decode A/B at the no-EOS ceiling
     (max_words=128, all buckets) and the bucket-32 floor (max_words=32 —
     the regime real ~20-30-step captions exit in). Token mismatches are
     reported for visibility, not gated.

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


def teacher_forced_parity(model, params, batch, seq_out, vis_out,
                          B=16, K=5, T=64):
    """Max per-step |log-prob diff| between the unfused step()+one-hot
    reorder chain and step_fused()'s deferred-permutation pass, with
    identical forced tokens/permutations (no beam chaos). Runs both paths
    inside ONE jitted scan and fetches only the [T-1] diff vector."""
    from univl_tpu.evals.fast_decoder import FastDecoder
    from univl_tpu.models.univl import UniVL

    cross_out, _, concat_mask = jax.jit(
        lambda p, so, vo, am, vm: model.apply(
            p, so, vo, am, vm, method=UniVL.get_cross_output
        )
    )(params, seq_out, vis_out, batch["attention_mask"], batch["video_mask"])

    cache_dtype = jnp.dtype(model.cfg.compute_dtype)
    fd = FastDecoder(model.cfg.decoder, params["params"])
    cross_rep = jnp.repeat(cross_out, K, axis=0).astype(cache_dtype)
    mask_rep = jnp.repeat(concat_mask, K, axis=0)
    enc_bias = ((1.0 - mask_rep.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    enc_kv = fd.precompute_enc_kv(cross_rep)

    rng = np.random.RandomState(7)
    toks = jnp.asarray(rng.randint(1, 30000, (T, B * K)), jnp.int32)
    # Mix bijective permutations with duplicating gathers (rng.randint):
    # real beam search routinely selects the same source row for several
    # beam slots, and the fused kernel's deferred gather must handle that
    # (a permutation-only trajectory would leave duplicates untested on
    # the compiled kernel — round-2 ADVICE item).
    perm_rows = np.stack([
        np.stack([
            rng.permutation(K) if (t + b) % 2 == 0 else rng.randint(0, K, K)
            for b in range(B)
        ]) for t in range(T)
    ])
    perms = jnp.asarray(perm_rows, jnp.int32)  # [T, B, K] local source rows, applied AFTER each step

    def run(toks, perms):
        cache_u = fd.init_cache(B * K, T, dtype=cache_dtype)
        cache_f = fd.init_cache(B * K, T, dtype=cache_dtype)
        perm0 = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))

        def body(carry, inp):
            cache_u, cache_f, perm_prev = carry
            t, tok, perm_t = inp
            lu, cache_u = fd.step(tok, t, cache_u, enc_kv, enc_bias)
            # unfused path applies this step's permutation immediately
            perm_oh = jax.nn.one_hot(perm_t, K, dtype=cache_dtype)

            def reorder(c):
                cb = c.reshape(B, K, -1)
                return jnp.einsum("bnk,bkf->bnf", perm_oh, cb).reshape(c.shape)

            cache_u = jax.tree.map(reorder, cache_u)
            # fused path applies LAST step's permutation inside this pass
            lf, cache_f = fd.step_fused(
                tok, t, cache_f, enc_kv, enc_bias, perm_prev.reshape(B * K), K,
                interpret=(jax.default_backend() != "tpu"),
            )
            d = jnp.max(jnp.abs(
                jax.nn.log_softmax(lu.astype(jnp.float32), axis=-1)
                - jax.nn.log_softmax(lf.astype(jnp.float32), axis=-1)
            ))
            return (cache_u, cache_f, perm_t), d

        _, diffs = jax.lax.scan(
            body, (cache_u, cache_f, perm0),
            (jnp.arange(T, dtype=jnp.int32), toks, perms),
        )
        return diffs

    diffs = np.asarray(jax.jit(run)(toks, perms))
    # step 0 compares identically-ordered caches; the deferred perm first
    # bites at step 1. Report the trajectory max.
    print(f"[teacher-forced parity] T={T} steps, max |logp diff| "
          f"{diffs.max():.3e} (median {np.median(diffs):.1e}, "
          f"final step {diffs[-1]:.1e})", flush=True)
    return float(diffs.max())


def main():
    n_timed = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")
    from univl_tpu.evals.beam import make_fast_beam_decode_fn
    import univl_tpu.evals.beam as beam_mod

    B, K = 16, 5
    model, params, batch, seq_out, vis_out = build(B)
    args = (params, seq_out, vis_out, batch["attention_mask"], batch["video_mask"])

    max_diff = teacher_forced_parity(model, params, batch, seq_out, vis_out,
                                     B=B, K=K)
    # bf16 compute through a 3-layer stack: reduction-order differences
    # show up at ~1e-2 log-prob scale; a semantic bug (wrong row permuted,
    # off-by-one position, stale cache) produces O(1) divergence.
    ok = max_diff < 0.15
    results = {"teacher_forced_max_logp_diff": max_diff}
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
        # informational only — free-running mismatch measures near-tie
        # argmax sensitivity on random weights, not kernel correctness
        # (see module docstring); correctness is the teacher-forced leg.

    print("VERIFY", "PASS" if ok else "FAIL", results, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
