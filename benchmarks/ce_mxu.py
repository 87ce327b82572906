#!/usr/bin/env python
"""VERDICT r4 #4: what fraction of bf16 MXU peak can the K=64 CE
contraction reach on v5e, and does the fused whole-table CE kernel
leave matmul throughput on the table?

BERT4Rec's cloze CE scores [rows, 64] x [64, V] with rows = 81,920
(40-position budget x B=2048) and V = 3,417 (+bias) — ~107 GFLOP per
fwd+bwd at 2.36 ms measured in the step (CLAUDE.md round-4
accounting).  This bench isolates that contraction three ways:

  * ``xla-mm``      — bare bf16 jnp.dot at the same shape: the XLA
                      upper envelope for the matmul alone (fwd
                      counts 2ND V FLOPs; "bwd" = the 3-matmul
                      g@tab / g^T@x / x@tab^T trio, 6ND V).
  * ``pallas-mm``   — the same matmul inside a Pallas kernel with the
                      fused-CE grid (row-blocks, whole [V, D] table in
                      VMEM), no softmax math: the kernel-side matmul
                      ceiling, per row-block height.
  * ``fused-ce``    — the real _ce_fwd/_ce_bwd kernels, per row-block
                      height (the shipped policy picks bn=512 at this
                      V via _block_n's 8 MiB logits target).

Usage: python benchmarks/ce_mxu.py [rows] [V] [bn ...]

MEASURED (v5e, 2026-08-22, scalar-fetch sync): the answer to VERDICT
r4 #4 is that >60% of bf16 peak is UNREACHABLE at this shape — the
bare XLA matmul trio (no softmax at all) reaches only 22.0% of peak
(fwd+bwd 2.51 ms; fwd alone 29 TF/s = 15%), because a K=64
contraction feeds the 128x128 MXU at half depth and the [rows, V]
product is write-heavy relative to its FLOPs.  The fused CE kernel
measures 16% of peak (runs 9.5-16% across tunnel-noise re-runs),
i.e. ~70% of the matmul-only envelope, the remainder being the
softmax's ~7 VPU passes (round-3 floor).  Row-block height is a
non-factor (flat 256->2048).  pallas-mm (same grid, logits written
to HBM instead of reduced in VMEM) runs 4.17 ms = 4.4% peak —
HBM-write-bound at ~270 GB/s — confirming the streaming-CE design
rather than bounding its matmul.  Conclusion: the BERT4Rec 8.5x
retirement argument stands with a measured ceiling in place of the
round-4 "50%" estimate.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from datamining_recblr_tpu.ops.fused_ce import (
    _VMEM_LIMIT,
    _ce_bwd_kernel,
    _ce_fwd_kernel,
    _full_spec,
    _interpret,
)
from datamining_recblr_tpu.ops.pallas_scan import _pad_to

PEAK_TFLOPS = 197.0  # v5e bf16


def timeit(f, *args, k=30):
    """Every timed function returns a SCALAR; the end-of-loop float()
    fetch is the sync (jax.block_until_ready is a no-op under the axon
    remote client — CLAUDE.md round-5 note).  The device executes
    dispatches in order, so fetching the last scalar waits for all k."""
    float(f(*args))  # compile
    float(f(*args))  # warm
    t0 = time.perf_counter()
    for _ in range(k):
        out = f(*args)
    float(out)
    return (time.perf_counter() - t0) / k


def report(name, t_fwd, t_bwd, n, d, v):
    gf_fwd = 2 * n * d * v / 1e9
    gf_tot = 6 * n * d * v / 1e9
    print(
        f"{name:>22}: fwd {t_fwd*1e3:6.3f} ms "
        f"({gf_fwd/t_fwd/1e3:6.1f} TF/s = {gf_fwd/t_fwd/10/PEAK_TFLOPS:4.1f}% peak)"
        + (
            f"   fwd+bwd {t_bwd*1e3:6.3f} ms "
            f"({gf_tot/t_bwd/1e3:6.1f} TF/s = {gf_tot/t_bwd/10/PEAK_TFLOPS:4.1f}% peak)"
            if t_bwd is not None
            else ""
        ),
        flush=True,
    )


def _mm_kernel(x_ref, tab_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        tab_ref[:].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def pallas_mm(x, table, bn):
    """Grid-of-row-blocks matmul with the whole table resident — the
    fused-CE structure minus every non-matmul pass.  Writes the full
    [N, V] product (the CE kernel does NOT pay this write; it reduces
    in VMEM — so this is a lower bound on the kernel's matmul
    headroom, not an exact model)."""
    n, d = x.shape
    v = table.shape[0]
    xp = _pad_to(x, 0, bn, 0.0)
    np_ = xp.shape[0]
    out = pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, v), jnp.float32),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _full_spec(table.shape),
        ],
        out_specs=pl.BlockSpec(
            (bn, v), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, table)
    return out[:n]


def fused_ce_at_bn(x, table, bias, targets, bn, valid_v):
    """_ce_fwd / _ce_bwd wrappers with a parametric row-block height
    (the shipped wrappers hardcode _block_n's policy)."""
    n, d = x.shape
    xp = _pad_to(x, 0, bn, 0.0)
    tp = _pad_to(targets[:, None], 0, bn, 0)
    np_ = xp.shape[0]
    xblock = pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tblock = pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def fwd(xp, table, bias, tp):
        out = pl.pallas_call(
            functools.partial(_ce_fwd_kernel, valid_v=valid_v, mm_bf16=True),
            out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            grid=(np_ // bn,),
            in_specs=[xblock, _full_spec(table.shape),
                      _full_spec(bias.shape), tblock],
            out_specs=tblock,
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(xp, table, bias, tp)
        return jnp.sum(out)

    @jax.jit
    def fwdbwd(xp, table, bias, tp):
        dp = jnp.ones((np_, 1), jnp.float32)
        nll = pl.pallas_call(
            functools.partial(_ce_fwd_kernel, valid_v=valid_v, mm_bf16=True),
            out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            grid=(np_ // bn,),
            in_specs=[xblock, _full_spec(table.shape),
                      _full_spec(bias.shape), tblock],
            out_specs=tblock,
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(xp, table, bias, tp)
        dx, dtab, dbias = pl.pallas_call(
            functools.partial(_ce_bwd_kernel, valid_v=valid_v, mm_bf16=True),
            out_shape=(
                jax.ShapeDtypeStruct((np_, d), x.dtype),
                jax.ShapeDtypeStruct(table.shape, jnp.float32),
                jax.ShapeDtypeStruct(bias.shape, jnp.float32),
            ),
            grid=(np_ // bn,),
            in_specs=[xblock, _full_spec(table.shape),
                      _full_spec(bias.shape), tblock, tblock],
            out_specs=(xblock, _full_spec(table.shape),
                       _full_spec(bias.shape)),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(xp, table, bias, tp, dp)
        return jnp.sum(nll) + jnp.sum(dx) + dtab[0, 0] + dbias[0]

    return fwd, fwdbwd, (xp, table, bias, tp)


def main(n=81_920, v=3_456, bns=(256, 512, 1024, 2048)):
    d = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32) * 0.1)
    table = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((v,)).astype(np.float32) * 0.01)
    targets = jnp.asarray(rng.integers(1, 3417, size=n).astype(np.int32))
    print(f"rows={n} V={v} D={d}   peak={PEAK_TFLOPS} TF/s bf16 (v5e)")

    # XLA envelope
    @jax.jit
    def xla_fwd(x, table):
        return jnp.sum(
            jnp.dot(x.astype(jnp.bfloat16), table.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
        )

    @jax.jit
    def xla_trio(x, table):
        g = jnp.dot(x.astype(jnp.bfloat16), table.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
        gb = g.astype(jnp.bfloat16)
        dx = jnp.dot(gb, table.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        dtab = jnp.dot(gb.T, x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(dx) + dtab[0, 0]

    report("xla-mm", timeit(xla_fwd, x, table), timeit(xla_trio, x, table),
           n, d, v)

    for bn in bns:
        f = jax.jit(lambda x, t_, bn=bn: jnp.sum(pallas_mm(x, t_, bn)))
        t = timeit(f, x, table)
        report(f"pallas-mm bn={bn}", t, None, n, d, v)

    for bn in bns:
        fwd, fwdbwd, args = fused_ce_at_bn(x, table, bias, targets, bn, 3417)
        report(f"fused-ce bn={bn}", timeit(fwd, *args),
               timeit(fwdbwd, *args), n, d, v)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 81_920
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 3_456
    bns = [int(a) for a in sys.argv[3:]] or (256, 512, 1024, 2048)
    main(n, v, bns)
