"""Quantify the BD-LRU scan's share of fused-layer kernel time by
monkeypatching _scan_body with an identity (wrong math, same memory
traffic).  TPU-only experiment tool.

Usage: python benchmarks/scan_share.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x0, iters=20, warmup=3):
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


def bench(label):
    from datamining_recblr_tpu.ops import fused_layer as FL

    b, t, d, c = 2048, 200, 64, 128
    nv = 64
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

    def fwd(i, xv):
        return FL._layer_fwd(xv, seeds[i % nv], params, True, True, 0.2)

    def bwd(i, xv):
        dx, _ = FL._layer_bwd(xv, dout, seeds[i % nv], params, True, True, 0.2)
        return dx

    tf = timeit(fwd, x)
    tb = timeit(bwd, x)
    print(f"{label}: fwd={tf:.2f} ms  bwd={tb:.2f} ms")
    return tf, tb


def main():
    tf0, tb0 = bench("real scan  ")

    import datamining_recblr_tpu.ops.pallas_scan as PS
    import datamining_recblr_tpu.ops.fused_bdlru as FB
    import datamining_recblr_tpu.ops.fused_layer as FL

    def fake_scan(x, f, reverse=False):
        return x + f  # keeps both operands live, no scan

    PS._scan_body = fake_scan
    FB._scan_body = fake_scan
    # fused_layer imported _scan_body by name
    FL._scan_body = fake_scan
    # force recompile by clearing jit caches
    FL._layer_fwd.clear_cache()
    FL._layer_bwd.clear_cache()

    tf1, tb1 = bench("no scan    ")
    print(
        f"scan share: fwd {tf0 - tf1:.2f} ms ({(tf0 - tf1) / tf0 * 100:.0f}%), "
        f"bwd {tb0 - tb1:.2f} ms ({(tb0 - tb1) / tb0 * 100:.0f}%)"
    )


if __name__ == "__main__":
    main()
