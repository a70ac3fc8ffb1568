"""Sweep groups_per_block for the fused beam-decode attention kernel.

The round-4 floor profile (docs/PERF.md) measured this kernel at ~53
us/layer-step at L=32 vs ~19 us of raw cache bytes; the hypothesis is
per-grid-program DMA latency (16 programs of ~1 MB each). gpb > 1
processes several beam groups per program — fewer, larger block DMAs —
with bitwise-identical outputs (pinned in interpret mode; the grouping
changes only the block partitioning, not any reduction).

Times the kernel chained over a fori_loop position sweep (ONE host
fetch; axon does not sync on block_until_ready), donate=True (the
production configuration), at the floor (L=32) and ceiling (L=128)
cache sizes.

Usage: python tools/bench_decode_gpb.py [n_steps=192] [trials=3]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from univl_tpu.kernels.decode_attention import (
    beam_decode_self_attention,
    effective_gpb,
)

B, K, H, D = 16, 5, 12, 64
N = B * K
dtype = jnp.bfloat16


def make_args(L, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(N, H, D), dtype)
    kn = jnp.asarray(rng.randn(N, H, D), dtype)
    vn = jnp.asarray(rng.randn(N, H, D), dtype)
    kc = jnp.asarray(rng.randn(N, H, L, D), dtype)
    vc = jnp.asarray(rng.randn(N, H, L, D), dtype)
    perm = jnp.asarray(rng.randint(0, K, (N,)), jnp.int32)
    return q, kn, vn, kc, vc, perm


@partial(jax.jit, static_argnames=("n_steps", "gpb", "L"))
def run(q, kn, vn, kc, vc, perm, n_steps: int, gpb: int, L: int):
    def body(i, carry):
        kc, vc, acc = carry
        t = jnp.minimum(i, L - 1)
        ctx, kc, vc = beam_decode_self_attention(
            q, kn, vn, kc, vc, perm, t, K,
            scale=1.0 / np.sqrt(D), groups_per_block=gpb,
        )
        return kc, vc, acc + jnp.sum(ctx.astype(jnp.float32))

    kc, vc, acc = jax.lax.fori_loop(
        0, n_steps, body, (kc, vc, jnp.float32(0.0))
    )
    return acc


def main():
    # Two-point delta protocol: time the chained run at n_lo and n_hi
    # steps with the SAME device-resident args and report
    # (t_hi - t_lo) / (n_hi - n_lo). This cancels the ~25 ms dispatch RTT
    # AND keeps the (~230 ms at L=32!) tunnel upload of fresh caches out
    # of the measurement — the original per-trial protocol re-uploaded
    # make_args inside the timed region and measured the 30-40 MB/s wire,
    # not the kernel (first round-5 run: "19 GB/s" ~= 15.7 MB per step of
    # apparent traffic at the wire rate).
    n_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_lo = n_hi // 4
    for L in (32, 128):
        cache_mb = 2 * N * H * L * D * 2 / 1e6
        print(f"L={L}: K+V={cache_mb:.1f} MB, delta {n_lo}->{n_hi} steps",
              flush=True)
        accs = {}
        args = make_args(L)
        # force-complete the uploads before any clock starts (axon: the
        # only reliable sync is a host fetch depending on the data)
        _ = float(sum(jnp.sum(a.astype(jnp.float32)) for a in args[:5]))
        # Label rows by the gpb the kernel ACTUALLY runs (the scoped-VMEM
        # guard added after the original sweep clamps big requests — e.g.
        # requested 4/8/16 at L=128 all run as 2) and skip duplicates, so
        # the sweep cannot report the same config under distinct labels.
        measured = set()
        for req in (1, 2, 4, 8, 16):
            gpb = effective_gpb(req, N, K, H, L, D, 2)
            if gpb in measured:
                print(f"  gpb={req:2d}: clamped to {gpb} (VMEM guard) — "
                      "already measured", flush=True)
                continue
            measured.add(gpb)
            for n in (n_lo, n_hi):  # compile both step counts
                accs.setdefault(gpb, []).append(
                    float(run(*args, n_steps=n, gpb=gpb, L=L))
                )
            best = float("inf")
            for tr in range(trials):
                t0 = time.time()
                _ = float(run(*args, n_steps=n_lo, gpb=gpb, L=L))
                t1 = time.time()
                _ = float(run(*args, n_steps=n_hi, gpb=gpb, L=L))
                t2 = time.time()
                dt = ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)
                best = min(best, dt)
            gbps = 2 * cache_mb / 1e3 / best
            print(f"  gpb={gpb:2d}: best {best * 1e6:6.1f} us/step "
                  f"({gbps:.0f} GB/s vs ~820 roofline)", flush=True)
        # same-args accumulators must agree across gpb (same math)
        base = accs[1]
        for gpb, a in accs.items():
            for x, y in zip(base, a):
                assert abs(x - y) < 1e-3 * max(1.0, abs(x)), (gpb, x, y)
        print(f"  accs consistent across gpb at L={L}", flush=True)


if __name__ == "__main__":
    main()
