"""Two-level chunked scan vs flat Hillis-Steele inside a Pallas kernel.

Flat H-S over T=200 runs ceil(log2 T)=8 rounds of
(2 rolls + 2 wheres + 3 mul/add) over the full [bt, T, C] block.  The
two-level variant does 3 rounds within 8-wide chunks (sublane-tile
aligned), a 5-round scan over the 25 chunk carries (1/8 of the data),
and one combine pass — ~half the VPU work.  This measures both on the
real grid shape used by the fused layer kernels.

Usage: python benchmarks/scan_chunked.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datamining_recblr_tpu.ops.pallas_scan import _scan_body

B, T, C = 2048, 200, 128
BT = 8


def _scan_chunked(x, f, chunk=8):
    """Inclusive first-order scan h_t = f_t*h_{t-1} + x_t along axis 1,
    two-level: local scans within `chunk`, then a carry scan across
    chunks, then combine."""
    bt, t, c = x.shape
    assert t % chunk == 0
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    pos = idx % chunk  # wait — modulo may be slow; use iota of pos directly
    d = 1
    while d < chunk:
        keep = pos >= d
        xl = jnp.where(keep, pltpu.roll(x, d, axis=1), 0.0)
        fl = jnp.where(keep, pltpu.roll(f, d, axis=1), 1.0)
        x = xl * f + x
        f = fl * f
        d *= 2
    # x, f now hold within-chunk inclusive scan / cumprod
    nk = t // chunk
    x4 = x.reshape(bt, nk, chunk, c)
    f4 = f.reshape(bt, nk, chunk, c)
    cx = x4[:, :, chunk - 1, :]  # [bt, nk, c] chunk carries
    cf = f4[:, :, chunk - 1, :]
    kidx = jax.lax.broadcasted_iota(jnp.int32, cx.shape, dimension=1)
    d = 1
    while d < nk:
        keep = kidx >= d
        cxl = jnp.where(keep, pltpu.roll(cx, d, axis=1), 0.0)
        cfl = jnp.where(keep, pltpu.roll(cf, d, axis=1), 1.0)
        cx = cxl * cf + cx
        cf = cfl * cf
        d *= 2
    # exclusive carry prefix per chunk
    kkeep = kidx >= 1
    pcx = jnp.where(kkeep, pltpu.roll(cx, 1, axis=1), 0.0)  # [bt, nk, c]
    out = x4 + pcx[:, :, None, :] * f4
    return out.reshape(bt, t, c)


def _kernel_flat(g_ref, x_ref, o_ref):
    o_ref[:] = _scan_body(x_ref[:], g_ref[:])


def _kernel_chunk(g_ref, x_ref, o_ref):
    o_ref[:] = _scan_chunked(x_ref[:], g_ref[:])


@functools.partial(jax.jit, static_argnames=("which",))
def run(g, x, which):
    kern = _kernel_flat if which == "flat" else _kernel_chunk
    b = x.shape[0]
    spec = pl.BlockSpec((BT, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // BT,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=jax.default_backend() != "tpu",
    )(g, x)
    return jnp.sum(out[:, -1])


def timeit(fn, *args, steps=30):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        r = fn(*args)
    float(r)
    t1 = time.perf_counter()
    for _ in range(3 * steps):
        r = fn(*args)
    float(r)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * steps)


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.uniform(0.9, 0.999, size=(B, T, C)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)

    # correctness vs serial oracle on a small slice
    gs, xs = np.asarray(g[:4]), np.asarray(x[:4])
    h = np.zeros_like(xs)
    acc = np.zeros((4, C), np.float32)
    for t in range(T):
        acc = gs[:, t] * acc + xs[:, t]
        h[:, t] = acc
    from datamining_recblr_tpu.ops.pallas_scan import _pad_to  # noqa: F401
    got = jax.jit(lambda g_, x_: _scan_chunked(x_, g_))(g[:4], x[:4])
    np.testing.assert_allclose(np.asarray(got), h, rtol=2e-4, atol=2e-5)
    print("chunked correct vs serial oracle")

    tf = timeit(run, g, x, "flat")
    tc = timeit(run, g, x, "chunk")
    print(f"flat H-S  : {tf*1e3:.3f} ms")
    print(f"chunked   : {tc*1e3:.3f} ms   ({tf/tc:.2f}x)")


if __name__ == "__main__":
    main()
