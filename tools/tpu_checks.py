"""On-hardware assertions for the kernels CI cannot exercise.

Round-1 ADVICE items 2 and 3: interpret-mode tests do not exercise real
``input_output_aliases`` buffer sharing (beam cache reorder), and
``pltpu.prng_random_bits`` returns zeros in interpret mode (in-kernel
dropout), so both need a real-chip check runnable from the driver rather
than pytest.

Usage: python tools/tpu_checks.py     (prints PASS/FAIL per check, rc != 0
on any failure; requires the TPU backend)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_beam_reorder() -> str:
    """Compiled grouped in-place reorder == one-hot-einsum oracle, bitwise.

    Guards the Mosaic scheduling hazard documented in kernels/reorder.py:
    with donation the input/output blocks share one VMEM buffer, so a
    scheduling change that reorders the load/store pattern would consume
    already-overwritten rows — undetectable in interpret mode.
    """
    import jax
    import jax.numpy as jnp

    from univl_tpu.kernels.reorder import beam_reorder_groups_inplace

    B, K, H, L, D = 16, 5, 12, 64, 64  # fast_decoder cache shapes (bucket 64)
    rng = np.random.RandomState(0)
    caches = [
        jnp.asarray(rng.randn(B * K, H, L, D), jnp.bfloat16) for _ in range(6)
    ]
    prev_k = jnp.asarray(
        np.stack([rng.permutation(K) for _ in range(B)]).reshape(B * K), jnp.int32
    )

    out = jax.jit(
        lambda arrs, idx: beam_reorder_groups_inplace(list(arrs), idx, K)
    )(tuple(caches), prev_k)

    perm = np.asarray(prev_k).reshape(B, K)
    ok = True
    for a, o in zip(caches, out):
        a_np = np.asarray(a).reshape(B, K, H, L, D)
        expect = np.take_along_axis(
            a_np, perm[:, :, None, None, None], axis=1
        ).reshape(B * K, H, L, D)
        got = np.asarray(o)
        if not (got == expect).all():
            ok = False
            break
    return "PASS" if ok else "FAIL: reordered cache != one-hot oracle"


def check_train_attention_dropout(rate: float = 0.1) -> str:
    """rate>0 fused attention on hardware: (a) the dropped-prob matrix has
    ~rate zero mass per row, (b) the backward regenerates the SAME mask
    (dv computed from the fwd-extracted probs matches jax.grad's dv).

    Mask extraction: with head_dim == Lk and v[:, :, h*d:(h+1)*d] = I per
    head, the attention output IS the dropped/rescaled prob matrix
    (the oracle from docs/PERF.md's kernel validation).
    """
    import jax
    import jax.numpy as jnp

    from univl_tpu.kernels.train_attention import fused_train_attention

    B, H, L = 8, 4, 64
    d = L  # head_dim == Lk so v can be identity per head
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, L, H * d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, H * d), jnp.bfloat16)
    v = jnp.asarray(
        np.tile(np.eye(L, dtype=np.float32), (B, 1, H)), jnp.bfloat16
    )
    key_mask = jnp.ones((B, L), jnp.int32)
    seed = jnp.asarray(12345, jnp.int32)

    fn = jax.jit(
        lambda q, k, v: fused_train_attention(q, k, v, key_mask, seed, rate, H)
    )
    probs = np.asarray(fn(q, k, v), np.float32)  # [B, Lq, H*Lk] dropped probs

    zero_frac = float((probs == 0.0).mean())
    if not (rate - 0.04 <= zero_frac <= rate + 0.04):
        return (
            f"FAIL: dropout zero fraction {zero_frac:.3f} not ~{rate} "
            "(prng_random_bits may be returning degenerate bits)"
        )

    # (b) backward-pass mask regeneration: dv from jax.grad vs dv computed
    # from the forward-extracted dropped probs. A different bwd mask makes
    # these disagree almost surely.
    g = jnp.asarray(rng.randn(B, L, H * d), jnp.bfloat16)
    dv = jax.jit(
        jax.grad(
            lambda v_: jnp.sum(
                fused_train_attention(
                    q, k, v_, key_mask, seed, rate, H
                ).astype(jnp.float32)
                * g.astype(jnp.float32)
            )
        )
    )(v)
    dv = np.asarray(dv, np.float32)

    p = probs.reshape(B, L, H, L).transpose(0, 2, 1, 3)  # [B,H,Lq,Lk]
    g4 = np.asarray(g, np.float32).reshape(B, L, H, d).transpose(0, 2, 1, 3)
    dv_expect = np.einsum("bhij,bhie->bhje", p, g4)  # [B,H,Lk,d]
    dv_expect = dv_expect.transpose(0, 2, 1, 3).reshape(B, L, H * d)
    # bf16 kernel arithmetic: allow ulp-scale error, but a wrong mask
    # produces O(1) differences at dropped/kept disagreement sites
    err = np.abs(dv - dv_expect).max()
    if err > 0.05:
        return f"FAIL: bwd dv deviates from fwd-mask prediction (max {err:.3f})"
    return "PASS"


def check_ffn_block_dropout(rate: float = 0.5) -> str:
    """rate>0 fused FFN block on hardware: (a) the dropout zeroes ~rate of
    the FFN output before the residual add, (b) same seed => bit-identical
    forward (determinism), (c) the backward regenerates the SAME mask
    (db2 from jax.grad equals the oracle computed with the fwd-extracted
    mask; a different bwd mask disagrees almost surely).

    Mask extraction: the saved LN input s satisfies s - x = dropout(FFN(x)),
    so (s - x == 0) at non-zero FFN outputs identifies dropped elements.
    """
    import jax
    import jax.numpy as jnp

    from univl_tpu.kernels.ffn import (
        _ffn_block_fwd_call,
        ffn_reference,
        fused_ffn_block,
    )

    N, H, F = 512, 256, 512
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(N, H), jnp.float32)
    w1 = jnp.asarray(rng.randn(H, F) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(F) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(F, H) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)
    scale = jnp.asarray(rng.rand(H) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    seed = jnp.asarray(777, jnp.int32)
    eps = 1e-12

    fwd = jax.jit(
        lambda: _ffn_block_fwd_call(
            x, w1, b1, w2, b2, scale, bias, seed, rate, eps, save=True
        )
    )
    out1, (pre1, s1) = fwd()
    out2, (_, s2) = fwd()
    if not (np.asarray(out1) == np.asarray(out2)).all():
        return "FAIL: same seed gave different forward outputs"

    drop = np.asarray(s1) - np.asarray(x)  # dropout(FFN(x))
    kept = drop != 0.0
    frac_dropped = 1.0 - kept.mean()
    if not (rate - 0.05 <= frac_dropped <= rate + 0.05):
        return (
            f"FAIL: dropped fraction {frac_dropped:.3f} not ~{rate} "
            "(prng_random_bits may be returning degenerate bits)"
        )

    # (c) bwd mask regeneration via db2: db2 = colsum(ds * mask / (1-rate)).
    g = jnp.asarray(rng.randn(N, H), jnp.float32)

    def loss(b2_):
        return jnp.sum(
            fused_ffn_block(x, w1, b1, w2, b2_, scale, bias, seed, rate, eps)
            .astype(jnp.float32) * g
        )

    db2 = np.asarray(jax.jit(jax.grad(loss))(b2), np.float32)

    # oracle: same LN backward from the saved s, masked with the extracted
    # keep mask (fp32 on host; TPU bf16 matmul quantization only perturbs
    # s/pre, which both paths share)
    sf = np.asarray(s1, np.float64)
    u = sf.mean(-1, keepdims=True)
    var = ((sf - u) ** 2).mean(-1, keepdims=True)
    rstd = 1.0 / np.sqrt(var + eps)
    xhat = (sf - u) * rstd
    gs = np.asarray(g, np.float64) * np.asarray(scale, np.float64)
    m1 = gs.mean(-1, keepdims=True)
    m2 = (gs * xhat).mean(-1, keepdims=True)
    ds = rstd * (gs - m1 - xhat * m2)
    db2_expect = (ds * kept / (1.0 - rate)).sum(0)
    err = np.abs(db2 - db2_expect).max() / max(1.0, np.abs(db2_expect).max())
    if err > 0.02:
        return f"FAIL: bwd db2 deviates from fwd-mask oracle (rel {err:.3f})"
    return "PASS"


def check_dense_block_dropout(rate: float = 0.5) -> str:
    """rate>0 fused dense block (attention-output epilogue): dropout mass
    ~rate, deterministic per seed, bwd regenerates the fwd mask (db via
    the saved-s oracle, same scheme as check_ffn_block_dropout)."""
    import jax
    import jax.numpy as jnp

    from univl_tpu.kernels.ffn import _dense_block_fwd_call, fused_dense_block

    N, H = 512, 256
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(N, H), jnp.float32)
    r = jnp.asarray(rng.randn(N, H), jnp.float32)
    w = jnp.asarray(rng.randn(H, H) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)
    scale = jnp.asarray(rng.rand(H) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    seed = jnp.asarray(4242, jnp.int32)
    eps = 1e-12

    fwd = jax.jit(
        lambda: _dense_block_fwd_call(x, r, w, b, scale, bias, seed, rate,
                                      eps, save=True)
    )
    out1, s1 = fwd()
    out2, _ = fwd()
    if not (np.asarray(out1) == np.asarray(out2)).all():
        return "FAIL: same seed gave different forward outputs"
    kept = (np.asarray(s1) - np.asarray(r)) != 0.0
    frac_dropped = 1.0 - kept.mean()
    if not (rate - 0.05 <= frac_dropped <= rate + 0.05):
        return f"FAIL: dropped fraction {frac_dropped:.3f} not ~{rate}"

    g = jnp.asarray(rng.randn(N, H), jnp.float32)
    db = np.asarray(jax.jit(jax.grad(
        lambda b_: jnp.sum(
            fused_dense_block(x, r, w, b_, scale, bias, seed, rate, eps)
            .astype(jnp.float32) * g
        )
    ))(b), np.float32)
    sf = np.asarray(s1, np.float64)
    u = sf.mean(-1, keepdims=True)
    var = ((sf - u) ** 2).mean(-1, keepdims=True)
    rstd = 1.0 / np.sqrt(var + eps)
    xhat = (sf - u) * rstd
    gs = np.asarray(g, np.float64) * np.asarray(scale, np.float64)
    ds = rstd * (gs - gs.mean(-1, keepdims=True)
                 - xhat * (gs * xhat).mean(-1, keepdims=True))
    db_expect = (ds * kept / (1.0 - rate)).sum(0)
    err = np.abs(db - db_expect).max() / max(1.0, np.abs(db_expect).max())
    if err > 0.02:
        return f"FAIL: bwd db deviates from fwd-mask oracle (rel {err:.3f})"
    return "PASS"


def check_fused_decode_attention() -> str:
    """Compiled fused decode attention (kernels/decode_attention.py) ==
    the reorder-update-attend jnp oracle, on hardware.

    Guards the same donated-buffer load-before-store hazard as the reorder
    check (the in/out cache blocks share one VMEM buffer; all K source
    rows must be read before the first store), which interpret mode cannot
    exercise, plus the f32 softmax/accumulation tolerance of the real
    Mosaic lowering at the production shapes (bucket 64, bf16 cache).
    """
    import jax
    import jax.numpy as jnp

    from univl_tpu.kernels.decode_attention import beam_decode_self_attention

    B, K, H, L, D = 16, 5, 12, 64, 64
    N = B * K
    t = 37
    rng = np.random.RandomState(0)
    q = rng.randn(N, H, D).astype(np.float32)
    kn = rng.randn(N, H, D).astype(np.float32)
    vn = rng.randn(N, H, D).astype(np.float32)
    kc = np.zeros((N, H, L, D), np.float32)
    vc = np.zeros((N, H, L, D), np.float32)
    kc[:, :, :t, :] = rng.randn(N, H, t, D)
    vc[:, :, :t, :] = rng.randn(N, H, t, D)
    prev_k = np.stack([rng.permutation(K) for _ in range(B)]).reshape(N)
    scale = 1.0 / np.sqrt(D)
    dt = jnp.bfloat16

    ctx, ko, vo = jax.jit(
        lambda *a: beam_decode_self_attention(*a, K, scale=float(scale)),
        static_argnums=(),
    )(
        jnp.asarray(q, dt), jnp.asarray(kn, dt), jnp.asarray(vn, dt),
        jnp.asarray(kc, dt), jnp.asarray(vc, dt),
        jnp.asarray(prev_k, jnp.int32), jnp.asarray(t, jnp.int32),
    )

    src = (np.arange(N) // K) * K + prev_k
    bf = lambda x: np.asarray(jnp.asarray(x, dt), np.float32)  # noqa: E731
    ko_ref = bf(kc)[src]
    vo_ref = bf(vc)[src]
    ko_ref[:, :, t, :] = bf(kn)
    vo_ref[:, :, t, :] = bf(vn)
    scores = np.einsum("nhd,nhld->nhl", bf(q), ko_ref) * scale
    scores = np.where(np.arange(L)[None, None, :] <= t, scores, -1e9)
    scores -= scores.max(-1, keepdims=True)
    probs = np.exp(scores)
    probs /= probs.sum(-1, keepdims=True)
    ctx_ref = np.einsum("nhl,nhld->nhd", bf(probs.astype(np.float32)), vo_ref)

    # permuted+updated caches must be BITWISE right (pure data movement)
    if not (np.asarray(ko, np.float32) == ko_ref).all():
        return "FAIL: fused kernel k-cache != permuted/updated oracle"
    if not (np.asarray(vo, np.float32) == vo_ref).all():
        return "FAIL: fused kernel v-cache != permuted/updated oracle"
    # attention context to bf16-input tolerance
    err = np.max(np.abs(np.asarray(ctx, np.float32) - ctx_ref))
    if err > 0.05:
        return f"FAIL: fused ctx max err {err:.3e} vs bf16 oracle"
    return f"PASS (ctx max err {err:.1e})"


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: requires the TPU backend (jax.default_backend() = "
              f"{jax.default_backend()})")
        return 0
    rc = 0
    for name, fn in (
        ("beam_reorder_groups_inplace bit-identity", check_beam_reorder),
        ("fused decode attention vs oracle", check_fused_decode_attention),
        ("train_attention in-kernel dropout", check_train_attention_dropout),
        ("ffn_block in-kernel dropout", check_ffn_block_dropout),
        ("dense_block in-kernel dropout", check_dense_block_dropout),
    ):
        try:
            res = fn()
        except Exception as e:  # noqa: BLE001
            res = f"FAIL: {type(e).__name__}: {e}"
        print(f"{name}: {res}")
        if res.startswith("FAIL"):
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
