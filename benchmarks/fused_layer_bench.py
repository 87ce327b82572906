"""Microbenchmark: whole-layer fused kernel fwd/bwd at the flagship
shape (B=2048, T=200, D=64, C=128) on the current backend.

Usage: python benchmarks/fused_layer_bench.py [--mm_bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x0, iters=20, warmup=3):
    """fn(i, x) -> array of x's shape; each call feeds the next (serial
    data dependency) and the final value is fetched to host — defeats
    any async/dedup behavior in the remote executor."""
    x = x0
    for i in range(warmup):
        x = fn(i, x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    x = x0
    t0 = time.perf_counter()
    for i in range(iters):
        x = fn(i, x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mm_bf16", action="store_true")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--seq", type=int, default=200)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--rows", type=int, default=0, help="block rows (0=auto)")
    args = ap.parse_args()

    from datamining_recblr_tpu.ops import fused_layer as FL

    b, t, d, c = args.batch, args.seq, 64, 128
    nv = 64  # every call gets a distinct seed input -> no launch dedup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    dout = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    seeds = [jnp.full((1,), i, jnp.int32) for i in range(nv)]

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.02), jnp.float32)

    params = {
        "w_in": mk((d, 2 * c)), "wc": mk((4, c)), "bc": mk((c,)),
        "wg": mk((c, 2 * c)), "bg": mk((2 * c,)), "lam": mk((c,)),
        "w_out": mk((c, d)), "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "w1": mk((d, 4 * d)), "b1": mk((4 * d,)), "w2": mk((4 * d, d)),
        "b2": mk((d,)), "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
    }

    kw = {"mm_bf16": args.mm_bf16}
    if args.rows:
        kw["block_rows"] = args.rows

    depth = 10  # kernel calls per jitted chain: amortizes dispatch latency

    @jax.jit
    def fwd_chain(xc, seed):
        for j in range(depth):
            xc = FL._layer_fwd(
                xc, seed + j, params, True, True, args.dropout, **kw
            )
        return xc

    @jax.jit
    def bwd_chain(xc, seed):
        for j in range(depth):
            xc = FL._layer_bwd(
                xc, dout, seed + j, params, True, True, args.dropout, **kw
            )[0]
        return xc

    fwd_ms = timeit(lambda i, xc: fwd_chain(xc, seeds[i % nv]), x) / depth
    bwd_ms = timeit(lambda i, xc: bwd_chain(xc, seeds[i % nv]), x) / depth
    print(
        f"mm_bf16={args.mm_bf16} dropout={args.dropout} "
        f"fwd={fwd_ms:.2f} ms  bwd={bwd_ms:.2f} ms"
    )


if __name__ == "__main__":
    main()
