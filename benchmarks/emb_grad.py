"""Head-to-head the two embedding-grad paths (XLA chunked one-hot vs
Pallas hi/lo) at a given vocab/D/N shape on the TPU.

Usage: python benchmarks/emb_grad.py [V] [D] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30, warmup=5):
    acc = None
    for _ in range(warmup):
        acc = fn(*args)
    _ = float(acc.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(*args)
    _ = float(acc.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from datamining_recblr_tpu.ops import embedding as E

    v = int(sys.argv[1]) if len(sys.argv) > 1 else 3417
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 409600
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, v, size=(n,)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(n, d)), jnp.bfloat16)

    xla = jax.jit(lambda i, gg: E._bwd_xla(i, gg, v, d))
    pallas = jax.jit(lambda i, gg: E._bwd_pallas(i, gg, v, d))
    t_x = timeit(xla, ids, g)
    t_p = timeit(pallas, ids, g)
    print(f"V={v} D={d} N={n}: xla one-hot {t_x:.2f} ms | pallas hi/lo {t_p:.2f} ms")


if __name__ == "__main__":
    main()
