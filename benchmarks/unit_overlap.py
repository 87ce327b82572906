"""Do independent MXU and VPU instruction chains overlap inside one
Mosaic kernel on v5e?

The round-3 step-floor audit modeled each fused-layer block as a
*serial* sum (~9 us MXU matmul + ~10 us VPU gate math = 18.3 us
measured).  If the two units can overlap on independent work, the block
floor is ~max(9, 10), not 19 — worth ~30-40% of the kernel time.  This
probe measures it directly with synthetic chains at the fused-kernel
block scale ([1600, 128] f32 registers = 8 rows x T=200 flattened):

  mm_only   : NM dependent matmuls  [1600,128] @ [128,128]
  vpu_only  : NV dependent elementwise ops (mul-add + tanh mix)
  serial    : one chain alternating mm and vpu (data-dependent)
  indep_il  : TWO independent inputs; chain A = matmuls, chain B = vpu,
              authored stage-interleaved (a1 b1 a2 b2 ...)
  indep_seq : same two chains, authored A-then-B (tests whether the
              scheduler reorders across long distances on its own)

If indep_* ~= max(mm_only, vpu_only): the units overlap, and the fused
kernels' serial-roofline floor is beatable by giving Mosaic independent
per-half-block chains.  If indep_* ~= mm_only + vpu_only: issue is
serialized and the serial roofline stands.

Usage: python benchmarks/unit_overlap.py [--nm 16] [--nv 48] [--grid 64]

MEASURED (v5e, round 4): mm_only 18.5 us, vpu_only 24.9 us,
serial 20.8 us, indep_il 26.4 us, indep_seq 32.6 us per program —
overlap fraction 0.92 on interleaved independent chains, and even the
data-dependent serial chain overlaps at register granularity (20.8 <
18.5 + 24.9).  The round-3 serial-sum roofline model is dead.
"""

import argparse
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

ROWS, C = 1600, 128


def _mm_step(y, w):
    return jnp.dot(y, w, preferred_element_type=jnp.float32)


def _vpu_step(v, a, b, i):
    # mul-add with a tanh every 4th step: roughly the fused kernels'
    # transcendental density after the fastmath rewrite
    v = v * a + b
    if i % 4 == 0:
        v = jnp.tanh(v)
    return v


def _kernel(x_ref, x2_ref, w_ref, a_ref, b_ref, o_ref, *, mode, nm, nv):
    x = x_ref[:]
    x2 = x2_ref[:]
    w = w_ref[:]
    a = a_ref[:]
    b = b_ref[:]
    if mode == "mm_only":
        y = x
        for _ in range(nm):
            y = _mm_step(y, w)
        o_ref[:] = y
    elif mode == "vpu_only":
        v = x
        for i in range(nv):
            v = _vpu_step(v, a, b, i)
        o_ref[:] = v
    elif mode == "serial":
        # one dependent chain touching both units
        y = x
        per = max(1, nv // nm)
        for j in range(nm):
            y = _mm_step(y, w)
            for i in range(per):
                y = _vpu_step(y, a, b, i)
        o_ref[:] = y
    elif mode == "indep_il":
        # stage-interleaved authoring of two independent chains
        y = x
        v = x2
        steps = max(nm, nv)
        for s in range(steps):
            if s < nm:
                y = _mm_step(y, w)
            lo = (s * nv) // steps
            hi = ((s + 1) * nv) // steps
            for i in range(lo, hi):
                v = _vpu_step(v, a, b, i)
        o_ref[:] = y + v
    elif mode == "indep_seq":
        y = x
        for _ in range(nm):
            y = _mm_step(y, w)
        v = x2
        for i in range(nv):
            v = _vpu_step(v, a, b, i)
        o_ref[:] = y + v
    else:
        raise ValueError(mode)


@functools.partial(jax.jit, static_argnames=("mode", "nm", "nv", "grid"))
def _run(x, x2, w, a, b, mode, nm, nv, grid):
    block = pl.BlockSpec((ROWS, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode, nm=nm, nv=nv),
        out_shape=jax.ShapeDtypeStruct((grid * ROWS, C), jnp.float32),
        grid=(grid,),
        in_specs=[block, block, full, vec, vec],
        out_specs=block,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x, x2, w, a, b)


def timeit(fn, x0, iters=30, warmup=5):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nm", type=int, default=16)
    ap.add_argument("--nv", type=int, default=48)
    ap.add_argument("--grid", type=int, default=64)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.grid * ROWS, C), scale=0.1), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(args.grid * ROWS, C), scale=0.1), jnp.float32)
    # orthogonal-ish W keeps the dependent matmul chain from over/underflowing
    q, _ = np.linalg.qr(rng.normal(size=(C, C)))
    w = jnp.asarray(q * 0.99, jnp.float32)
    a = jnp.asarray(rng.normal(size=(1, C), scale=0.01) + 0.9, jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, C), scale=0.01), jnp.float32)

    res = {}
    for mode in ["mm_only", "vpu_only", "serial", "indep_il", "indep_seq"]:
        ms = timeit(
            lambda xv, m=mode: _run(
                xv, x2, w, a, b, m, args.nm, args.nv, args.grid
            ),
            x,
        )
        us_per_prog = ms * 1e3 / args.grid
        res[mode] = us_per_prog
        print(f"{mode:10s} {ms:7.3f} ms  {us_per_prog:7.2f} us/program")

    mm, vpu = res["mm_only"], res["vpu_only"]
    print(
        f"\nsum(mm,vpu)={mm + vpu:.2f} us  max={max(mm, vpu):.2f} us  "
        f"indep_il={res['indep_il']:.2f}  indep_seq={res['indep_seq']:.2f}"
    )
    overlap_il = (mm + vpu - res["indep_il"]) / min(mm, vpu)
    print(f"overlap fraction (interleaved): {overlap_il:.2f} "
          f"(1.0 = full overlap, 0.0 = fully serialized)")


if __name__ == "__main__":
    main()
