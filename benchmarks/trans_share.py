"""Quantify the transcendental (tanh/exp2) share of the fused-layer
kernels by monkeypatching fastmath.sigmoid/exp and jnp.tanh call sites
with cheap linear stand-ins (wrong math, same shapes/traffic).
TPU-only experiment tool.

Usage: python benchmarks/trans_share.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x0, iters=30, warmup=5):
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

    fwd = jax.jit(lambda xx, s: FL._layer_fwd(xx, s, params, True, True, 0.2))

    def fstep(i, xx):
        return fwd(xx, seeds[i % nv])

    bwd = jax.jit(
        lambda xx, dd, s: FL._layer_bwd(xx, dd, s, params, True, True, 0.2)[0]
    )

    def bstep(i, xx):
        return bwd(xx, dout, seeds[i % nv])

    tf = timeit(fstep, x)
    tb = timeit(bstep, x)
    print(f"{label:28s} fwd={tf:6.2f} ms  bwd={tb:6.2f} ms")
    return tf, tb


def main():
    from datamining_recblr_tpu.ops import fastmath

    base = bench("baseline (fastmath)")

    # cheap linear stand-ins: one mul+add instead of tanh/exp2.  The
    # kernels resolve fastmath.sigmoid/exp by module attribute at trace
    # time, so patching + clearing jit caches is enough.
    fastmath.sigmoid = lambda v: v * 0.25 + 0.5
    fastmath.exp = lambda v: v * 0.5 + 1.0
    jax.clear_caches()
    notrans = bench("no transcendentals")

    print(
        f"transcendental share: fwd {base[0]-notrans[0]:.2f} ms, "
        f"bwd {base[1]-notrans[1]:.2f} ms"
    )


if __name__ == "__main__":
    main()
