"""Ablate fused-layer kernel components on the TPU to find the time
sinks: dropout PRNG, conv, FFN, gate transcendentals.

Usage: python benchmarks/layer_ablate.py
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


def main():
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

    def run(label, use_conv, use_ffn, p):
        def fwd(i, xv):
            return FL._layer_fwd(xv, seeds[i % nv], params, use_conv, use_ffn, p)

        def bwd(i, xv):
            dx, _ = FL._layer_bwd(
                xv, dout, seeds[i % nv], params, use_conv, use_ffn, p
            )
            return dx

        tf = timeit(fwd, x)
        tb = timeit(bwd, x)
        print(f"{label:28s} fwd={tf:6.2f} ms  bwd={tb:6.2f} ms")
        return tf, tb

    run("full (conv+ffn+drop0.2)", True, True, 0.2)
    run("no dropout", True, True, 0.0)
    run("no conv", False, True, 0.2)
    run("no ffn", True, False, 0.2)
    run("bare (no conv/ffn/drop)", False, False, 0.0)


if __name__ == "__main__":
    main()
