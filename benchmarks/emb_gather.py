"""Embedding-gather experiments: can a Pallas kernel beat XLA's
dynamic-gather fusion (~0.71 ms/step at N=409600, V=3417, D=64 on v5e,
~10x off the 52 MB output-write roofline)?

Variants:
  xla      — jnp.take baseline (what the model uses outside kernels)
  pallas   — in-kernel jnp.take of a VMEM-resident table (Mosaic
             DynamicGatherOp, if this jax/Mosaic version supports it)

Usage: python benchmarks/emb_gather.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, V, D = 2048, 200, 3417, 64
N = B * T


def _gather_kernel(ids_ref, tab_ref, o_ref):
    ids = ids_ref[:]  # [bn] int32
    tab = tab_ref[:]  # [V, D]
    # Mosaic's dynamic gather is per-lane: out[i,j] = tab[idx2[i,j], j]
    idx2 = jnp.broadcast_to(ids[:, None], (ids.shape[0], tab.shape[1]))
    o_ref[:] = jnp.take_along_axis(tab, idx2, axis=0)


@functools.partial(jax.jit, static_argnames=("bn",))
def pallas_gather(ids, tab, bn=4096):
    n = ids.shape[0]
    v, d = tab.shape
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d), tab.dtype),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((v, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(ids, tab)
    return out


@jax.jit
def xla_gather(ids, tab):
    return tab[ids]


def timeit(fn, *args, steps=50):
    s = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(s(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        r = s(*args)
    float(r)
    t1 = time.perf_counter()
    for _ in range(3 * steps):
        r = s(*args)
    float(r)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * steps)


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, V, size=N), jnp.int32)
    tab = jnp.asarray(rng.normal(size=(V, D)), jnp.bfloat16)

    ref = np.asarray(xla_gather(ids, tab))
    try:
        got = np.asarray(pallas_gather(ids, tab))
        ok = np.array_equal(ref, got)
        print("pallas gather correct:", ok)
        if ok:
            t = timeit(pallas_gather, ids, tab)
            print(f"pallas gather: {t*1e3:.3f} ms")
    except Exception as e:
        print("pallas gather FAILED:", type(e).__name__, str(e)[:500])
    t = timeit(xla_gather, ids, tab)
    print(f"xla gather:    {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
