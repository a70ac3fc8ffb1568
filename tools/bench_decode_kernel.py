"""A/B the fused beam-decode attention kernel's DMA schedule in isolation.

docs/PERF.md (round 2) measured the donated-buffer kernel at ~38% of HBM
roofline at the bucket-128 ceiling and predicted double-buffering the
group DMAs "could roughly halve the 54 ms" kernel phase. The cheap way to
get double-buffering is to DROP the input_output_aliases: Mosaic then
pipelines group g+1's block loads against group g's stores (fresh output
buffers, no in-place hazard). This tool times exactly that A/B on one
kernel chained over a 64-step position sweep, at the YouCook2 ceiling
shapes (B=16, K=5, H=12, L=128, D=64, bf16, 3 layers' worth folded into
the step count).

Timing per CLAUDE.md: chain steps inside jit via the carry, ONE host
fetch at the end (block_until_ready does not sync on axon).

Usage: python tools/bench_decode_kernel.py [n_steps=192] [trials=3]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from univl_tpu.kernels.decode_attention import beam_decode_self_attention

B, K, H, L, D = 16, 5, 12, 128, 64
N = B * K
dtype = jnp.bfloat16


def make_args(seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(N, H, D), dtype)
    kn = jnp.asarray(rng.randn(N, H, D), dtype)
    vn = jnp.asarray(rng.randn(N, H, D), dtype)
    kc = jnp.asarray(rng.randn(N, H, L, D), dtype)
    vc = jnp.asarray(rng.randn(N, H, L, D), dtype)
    # duplicating gathers, like real beam search
    perm = jnp.asarray(rng.randint(0, K, (N,)), jnp.int32)
    return q, kn, vn, kc, vc, perm


@partial(jax.jit, static_argnames=("n_steps", "donate"))
def run(q, kn, vn, kc, vc, perm, n_steps: int, donate: bool):
    def body(i, carry):
        kc, vc, acc = carry
        t = jnp.minimum(i, L - 1)
        ctx, kc, vc = beam_decode_self_attention(
            q, kn, vn, kc, vc, perm, t, K,
            scale=1.0 / np.sqrt(D), donate=donate,
        )
        return kc, vc, acc + jnp.sum(ctx.astype(jnp.float32))

    kc, vc, acc = jax.lax.fori_loop(
        0, n_steps, body, (kc, vc, jnp.float32(0.0))
    )
    return acc


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cache_mb = 2 * N * H * L * D * 2 / 1e6
    print(f"shapes: N={N} H={H} L={L} D={D} bf16, K+V={cache_mb:.1f} MB, "
          f"{n_steps} chained steps", flush=True)
    results = {}
    for donate in (True, False):
        args = make_args()
        _ = float(run(*args, n_steps=1, donate=donate))  # compile small
        _ = float(run(*args, n_steps=n_steps, donate=donate))  # compile+warm
        best = float("inf")
        for tr in range(trials):
            args = make_args(tr)
            t0 = time.time()
            acc = float(run(*args, n_steps=n_steps, donate=donate))
            dt = (time.time() - t0) / n_steps
            best = min(best, dt)
            gbps = 2 * cache_mb / 1e3 / dt  # 1 read + 1 write of K+V
            print(f"donate={donate} trial{tr}: {dt*1e6:.1f} us/step "
                  f"({gbps:.0f} GB/s vs ~820 roofline) acc={acc:.1f}",
                  flush=True)
        results[donate] = best
    speedup = results[True] / results[False]
    print(f"no-donate speedup: {speedup:.2f}x "
          f"({results[True]*1e6:.1f} -> {results[False]*1e6:.1f} us/step)")


if __name__ == "__main__":
    main()
