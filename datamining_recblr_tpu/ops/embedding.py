"""Embedding lookup with an MXU-friendly gradient.

XLA lowers the embedding gather's gradient to a serial scatter-add;
profiling shows it as the largest non-kernel op in the train step
(~3 ms at B=2048, T=200).  This custom VJP computes the table gradient
as one-hot matmuls instead — bf16 MXU work.  Two implementations:

* ``_bwd_xla``: chunked ``onehot.T @ g`` matmuls.  XLA fuses the
  one-hot into the dot and runs at the D=64 half-lane speed of light
  (~2.0 ms at V=3417, N=409600 on v5e) — used for small vocabs.
* ``_bwd_pallas`` (TPU, large vocabs): a Pallas kernel whose grid walks
  id-chunks with the fp32 accumulator VMEM-resident.  A direct one-hot
  build costs O(N*V) VPU compares which dominates at large V; we split
  ``id = hi*LO + lo`` and contract ``A[n,lo]`` against the much
  narrower ``(hi-mask * tiled g)[n, hi*D+d]`` — O(N*(LO + V*D/LO*3))
  VPU work with identical MXU FLOPs and full 128-lane utilization on
  both matmul operands (~4 ms at V=10544 vs 6 ms for the XLA path).
  The loop-invariant iota/column tables are passed as inputs with
  constant index maps so they are built once, not per grid step.

Forward is a plain gather.  (The reference has no analogue: torch's
``nn.Embedding`` backward is a CUDA scatter, reference RecBLR.py:44.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 65536  # XLA fallback chunk
_PL_CHUNK = 1024  # ids per Pallas grid step (1024-aligned: XLA s32 1-D tiling)
_ACC_BYTES = 4 << 20  # VMEM cap on the fp32 [LO, h_blk*D] accumulator


@jax.custom_vjp
def embedding_lookup(table, ids):
    """table: [V, D]; ids: int[...]; returns table[ids] in bf16.

    The gather reads a bf16 CAST of the table: the gather is byte-bound
    (round-3: cost scales with bytes), so halving the row bytes halves
    the random-access traffic, and XLA's memory-space assignment can
    place the one bf16 table copy in VMEM next to the kernels that
    consume bf16 anyway.  Measured on the XLong shape (V=329,722,
    N=524,288, v5e): f32-gather 6.99 ms -> bf16-gather ~1.0 ms.  Every
    caller casts the result to the bf16 compute dtype right after (the
    call gate in models.base.embed is bf16-only), so the rounding point
    is unchanged.  The VJP still accumulates the table grad in f32.
    """
    return table.astype(jnp.bfloat16)[ids]


def _fwd(table, ids):
    # saving the table costs nothing (same param buffer); it carries
    # the shape/dtype the backward needs
    return table.astype(jnp.bfloat16)[ids], (table, ids)


def _emb_grad_kernel(ids_ref, g_ref, li_ref, hc_ref, o_ref, *, lo_w, h_blk, d):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    ids = ids_ref[:]  # [chunk] int32
    lo = jnp.bitwise_and(ids, lo_w - 1)
    hi = jnp.right_shift(ids, lo_w.bit_length() - 1) - pl.program_id(0) * h_blk
    # A[n, l] = 1[lo_n == l]
    a = (lo[:, None] == li_ref[0:1, :]).astype(jnp.bfloat16)
    # G[n, h*D + d] = 1[hi_n == h] * g[n, d]
    g = g_ref[:].astype(jnp.bfloat16)  # [chunk, D]
    mask = hi[:, None] == hc_ref[0:1, :]
    gm = jnp.where(mask, pltpu.repeat(g, h_blk, axis=1), jnp.bfloat16(0))
    # contract over the chunk dim: [lo_w, chunk] x [chunk, h_blk*D]
    o_ref[:] += jax.lax.dot_general(
        a, gm, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("v", "d"))
def _bwd_pallas(flat_ids, flat_g, v: int, d: int):
    """[N] ids + [N, D] cotangents -> [V, D] fp32 table gradient.

    Decomposition: id = hi * lo_w + lo; grad[hi*lo_w+lo, :] =
    sum_n 1[lo_n==lo] * (1[hi_n==hi] * g_n) — one [lo_w, chunk] x
    [chunk, h_blk*D] matmul per chunk with the accumulator VMEM-resident,
    laid out [lo, hi*D+d] and untangled to [V, D] once at the end."""
    n = flat_ids.shape[0]
    # lo_w ~ sqrt(3*D*V) balances the A build vs the mask/tile build
    lo_w = 1024 if v * d * 3 >= 1024 * 1024 else 512
    n_hi = -(-v // lo_w)
    h_blk = min(n_hi, max(1, _ACC_BYTES // (lo_w * d * 4)))
    n_hi = -(-n_hi // h_blk) * h_blk
    vp = n_hi * lo_w
    npad = (-n) % _PL_CHUNK
    if npad:
        # padded ids point past the padded vocab -> match no column
        flat_ids = jnp.concatenate(
            [flat_ids, jnp.full((npad,), vp, flat_ids.dtype)]
        )
        flat_g = jnp.concatenate([flat_g, jnp.zeros((npad, d), flat_g.dtype)])
    grid = (n_hi // h_blk, flat_ids.shape[0] // _PL_CHUNK)
    li = jnp.broadcast_to(jnp.arange(lo_w, dtype=jnp.int32)[None, :], (8, lo_w))
    hcol = jnp.broadcast_to(
        (jnp.arange(h_blk * d, dtype=jnp.int32) // d)[None, :], (8, h_blk * d)
    )
    out = pl.pallas_call(
        functools.partial(_emb_grad_kernel, lo_w=lo_w, h_blk=h_blk, d=d),
        out_shape=jax.ShapeDtypeStruct((lo_w, n_hi * d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_PL_CHUNK,), lambda i, j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PL_CHUNK, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lo_w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h_blk * d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (lo_w, h_blk * d), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() != "tpu",
    )(flat_ids.astype(jnp.int32), flat_g, li, hcol)
    # [lo, hi, d] -> [hi*lo_w + lo, d]
    out = out.reshape(lo_w, n_hi, d).transpose(1, 0, 2).reshape(vp, d)
    return out[:v]


def _bwd_xla(flat_ids, flat_g, v: int, d: int):
    n = flat_ids.shape[0]
    out = jnp.zeros((v, d), jnp.float32)
    for s in range(0, n, _CHUNK):
        oh = jax.nn.one_hot(flat_ids[s : s + _CHUNK], v, dtype=jnp.bfloat16)
        out = out + jnp.dot(
            oh.T,
            flat_g[s : s + _CHUNK].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return out


def _bwd_scatter(flat_ids, flat_g, v: int, d: int):
    """Plain XLA scatter-add (fp32 accumulate).  O(N*D) work vs the
    one-hot matmul's O(N*V*D) FLOPs: the scatter is ~flat in V
    (N-bound) while the matmul grows linearly, so beyond the crossover
    vocabulary the serial scatter wins outright.

    Round-5 dead end (xplane-profiled at the XLong shape, V=330k
    N=524k): pre-sorting the updates + ``indices_are_sorted=True``
    made the STEP 10 ms SLOWER — the argsort's id/row permutes cost
    3.7 + ~8 ms, the scatter itself didn't speed up, and the extra
    [N, D] temp evicted the bf16 table copy from VMEM, degrading the
    forward embedding gather 0.97 -> 7.7 ms.  Keep the scatter
    unsorted and temp-light."""
    return (
        jnp.zeros((v, d), jnp.float32).at[flat_ids].add(flat_g.astype(jnp.float32))
    )


# Measured on v5e, D=64 (round 3): V=3417/N=409600 -> scatter 3.19 ms,
# one-hot 1.16, hi/lo Pallas 1.81; V=10544/N=409600 -> 3.20 / 3.59 /
# 3.89; V=20000/N=524288 -> 4.16 / 9.46 / 12.97.  The one-hot matmul
# is FLOP-bound in N*V and loses to the N-bound scatter at V ~>= 9000;
# the hi/lo Pallas kernel never wins on this jax version and is kept
# only for the record (benchmarks/emb_grad.py).
_SCATTER_MIN_V = 9000


def _bwd(res, grad):
    table, ids = res
    v, d = table.shape
    flat_ids = ids.reshape(-1)
    flat_g = grad.reshape(-1, d)
    if v >= _SCATTER_MIN_V:
        out = _bwd_scatter(flat_ids, flat_g, v, d)
    else:
        out = _bwd_xla(flat_ids, flat_g, v, d)
    return out.astype(table.dtype), None


embedding_lookup.defvjp(_fwd, _bwd)
