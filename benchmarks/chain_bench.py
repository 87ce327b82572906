"""Multi-chain fused-layer backward: measured near-dead (round 4).

One program running N independent _bwd_core copies (chains x rows) lets
the Mosaic scheduler overlap chains' MXU/VPU work.  Despite the 0.92
overlap fraction synthetic probes show (benchmarks/unit_overlap.py),
the real kernel gains only ~1.7% (4.79 -> 4.71 ms at 2x8) because both
chains compete for the same VPU/VMEM-pass budget that actually bounds
the kernel (benchmarks/bwd_anatomy.py: removing ALL matmuls saves 4%).
Kept as the record for why `chains` stays 1 in production; the winning
lever was the h-stash (skip the forward scan in the backward).

Usage: python benchmarks/chain_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, x0, iters=30, warmup=5):
    x = x0
    for i in range(warmup): x = fn(i, x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    x = x0
    t0 = time.perf_counter()
    for i in range(iters): x = fn(i, x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3

from datamining_recblr_tpu.ops import fused_layer as FL
b, t, d, c = 2048, 200, 64, 128
nv = 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
dout = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
seeds = [jnp.full((1,), i, jnp.int32) for i in range(nv)]
mk = lambda s_: jnp.asarray(rng.normal(size=s_, scale=0.02), jnp.float32)
params = {
    "w_in": mk((d, 2*c)), "wc": mk((4, c)), "bc": mk((c,)),
    "wg": mk((c, 2*c)), "bg": mk((2*c,)), "lam": mk((c,)),
    "w_out": mk((c, d)), "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
    "w1": mk((d, 4*d)), "b1": mk((4*d,)), "w2": mk((4*d, d)),
    "b2": mk((d,)), "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
}
depth = 6
for label, kw in [
    ("single 8-row", dict()),
    ("dual 2x8", dict(chains=2)),
    ("quad 4x4", dict(chains=4, block_rows=4)),
    ("quad 4x8", dict(chains=4)),
    ("oct 8x2", dict(chains=8, block_rows=2)),
]:
    @jax.jit
    def chain(xc, seed, kw=tuple(kw.items())):
        kwd = dict(kw)
        for j in range(depth):
            xc = FL._layer_bwd(xc, dout, seed + j, params, True, True, 0.2, **kwd)[0]
        return xc
    try:
        ms = timeit(lambda i, xc: chain(xc, seeds[i % nv]), x) / depth
        print(f"{label:16s} bwd={ms:6.2f} ms")
    except Exception as e:
        print(f"{label:16s} FAILED: {type(e).__name__}: {str(e)[:160]}")
