"""Fused full-catalog softmax cross-entropy Pallas kernel.

The XLA composition of ``logits = x @ table^T`` + logsumexp + gather +
backward materializes the [N, V] logits tensor in HBM several times —
for BERT4Rec's cloze loss (N = batch * mask_len = 81,920, V = 3,417
on ML-1M shapes) that is ~1.1 GB of f32 per pass and dominated the
step profile (~19 ms/step of HBM-bound fusions on v5e).  This kernel
streams row-blocks through VMEM instead: logits, the softmax, and the
one-hot target math exist only on-chip; HBM sees one read of x/table
and one [N] nll write (backward: dx, plus dtable/dbias accumulated
across the row grid in-kernel).

Semantics parity (reference ``RecBLR.py:100-102`` via torch
``nn.CrossEntropyLoss``; ``bert4rec.py:200-213``): fp32 logits,
stable logsumexp, vocab columns >= ``valid_v`` masked to -1e30 (the
padded-vocab convention of ``models/base.py``).  Per-row nll is
returned so callers apply their own weighting/normalization.

Fits when the whole [V, D] table plus a [bn, V] logits block sit in
VMEM — v5e: V*D*4 <= 32 MiB, i.e. any catalog up to ~130k items at
D=64.  Larger vocabularies fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from datamining_recblr_tpu.ops import fastmath
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datamining_recblr_tpu.ops.fused_layer import (
    _full_spec,
    _interpret,
    _make_mm,
    _mmT,
    _VMEM_LIMIT,
)
from datamining_recblr_tpu.ops.pallas_scan import _pad_to

_NEG = -1e30


def _block_n(v: int) -> int:
    """Row-block height: the [bn, V] logits block is the VMEM driver
    (three live copies in the backward), target ~8 MiB each."""
    bn = (8 * 1024 * 1024) // (4 * v)
    return max(8, min(512, (bn // 8) * 8))


# Below this many loss rows, XLA's materialized [rows, V] CE beats the
# streaming kernel (it fuses CE into the surrounding train step); the
# kernel's ~7 elementwise passes only pay off once the logits block is
# large.  Measured crossover on v5e: 2048 rows lose, 81,920 win
# (benchmarks/ce_ab.py, 2026-08-20).
MIN_ROWS = 8192


def supports(v: int, d: int) -> bool:
    return v * d * 4 <= 32 * 1024 * 1024 and d <= 512


def _logits_block(x, tab, bias, valid_v, mm):
    n, v = x.shape[0], tab.shape[0]
    logits = jax.lax.dot_general(
        x if mm is None else x.astype(jnp.bfloat16),
        tab if mm is None else tab.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits + bias
    if valid_v < v:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, v), 1)
        logits = jnp.where(col < valid_v, logits, _NEG)
    return logits


def _ce_fwd_kernel(x_ref, tab_ref, bias_ref, tgt_ref, out_ref, *,
                   valid_v, mm_bf16):
    x = x_ref[:].astype(jnp.float32)
    tab = tab_ref[:].astype(jnp.float32)
    bias = bias_ref[:].astype(jnp.float32)
    tgt = tgt_ref[:, 0]
    logits = _logits_block(x, tab, bias, valid_v, True if mm_bf16 else None)
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m[:, 0] + jnp.log(jnp.sum(fastmath.exp(logits - m), axis=-1))
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = col == tgt[:, None]
    tgt_logit = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)
    out_ref[:, 0] = lse - tgt_logit


def _ce_bwd_kernel(x_ref, tab_ref, bias_ref, tgt_ref, dnll_ref,
                   dx_ref, dtab_ref, dbias_ref, *, valid_v, mm_bf16):
    first = pl.program_id(0) == 0
    x = x_ref[:].astype(jnp.float32)
    tab = tab_ref[:].astype(jnp.float32)
    bias = bias_ref[:].astype(jnp.float32)
    tgt = tgt_ref[:, 0]
    dnll = dnll_ref[:, 0].astype(jnp.float32)
    logits = _logits_block(x, tab, bias, valid_v, True if mm_bf16 else None)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = fastmath.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = (col == tgt[:, None]).astype(jnp.float32)
    g = (p - onehot) * dnll[:, None]
    mm = _make_mm(mm_bf16)
    dx_ref[:] = mm(g, tab).astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        dtab_ref[:] = jnp.zeros_like(dtab_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dtab_ref[:] += _mmT(g, x)
    dbias_ref[:] += jnp.sum(g, axis=0)


@functools.partial(jax.jit, static_argnames=("valid_v", "mm_bf16"))
def _ce_fwd(x, table, bias, targets, valid_v, mm_bf16):
    n, d = x.shape
    v = table.shape[0]
    bn = _block_n(v)
    xp = _pad_to(x, 0, bn, 0.0)
    tp = _pad_to(targets[:, None], 0, bn, 0)
    np_ = xp.shape[0]
    xblock = pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tblock = pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, valid_v=valid_v, mm_bf16=mm_bf16),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        grid=(np_ // bn,),
        in_specs=[xblock, _full_spec(table.shape), _full_spec(bias.shape), tblock],
        out_specs=tblock,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, table, bias, tp)
    return out[:n, 0]


@functools.partial(jax.jit, static_argnames=("valid_v", "mm_bf16"))
def _ce_bwd(x, table, bias, targets, dnll, valid_v, mm_bf16):
    n, d = x.shape
    v = table.shape[0]
    bn = _block_n(v)
    xp = _pad_to(x, 0, bn, 0.0)
    tp = _pad_to(targets[:, None], 0, bn, 0)
    dp = _pad_to(dnll[:, None], 0, bn, 0.0)  # zero cotangent on padded rows
    np_ = xp.shape[0]
    xblock = pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tblock = pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, dtab, dbias = pl.pallas_call(
        functools.partial(_ce_bwd_kernel, valid_v=valid_v, mm_bf16=mm_bf16),
        out_shape=(
            jax.ShapeDtypeStruct((np_, d), x.dtype),
            jax.ShapeDtypeStruct(table.shape, jnp.float32),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ),
        grid=(np_ // bn,),
        in_specs=[
            xblock, _full_spec(table.shape), _full_spec(bias.shape),
            tblock, tblock,
        ],
        out_specs=(
            xblock, _full_spec(table.shape), _full_spec(bias.shape),
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, table, bias, tp, dp)
    return dx[:n], dtab, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_ce(x, table, bias, targets, valid_v, mm_bf16):
    return _ce_fwd(x, table, bias, targets, valid_v, mm_bf16)


def _fce_fwd(x, table, bias, targets, valid_v, mm_bf16):
    return _ce_fwd(x, table, bias, targets, valid_v, mm_bf16), (
        x, table, bias, targets,
    )


def _fce_bwd(valid_v, mm_bf16, res, dnll):
    x, table, bias, targets = res
    dx, dtab, dbias = _ce_bwd(x, table, bias, targets, dnll, valid_v, mm_bf16)
    return dx, dtab.astype(table.dtype), dbias.astype(bias.dtype), None


_fused_ce.defvjp(_fce_fwd, _fce_bwd)


def fused_softmax_ce(x, table, targets, bias=None, valid_v=None,
                     mm_bf16=False, mesh=None):
    """Per-row softmax cross-entropy nll [N] f32 of ``x [N, D]`` against
    catalog ``table [V, D]`` (optionally + ``bias [V]``), with vocab
    columns >= ``valid_v`` masked out.  Differentiable in x, table and
    bias via one fused backward kernel.

    With ``mesh`` the kernel runs per-shard over the ``data`` axis via
    shard_map (pallas_call has no GSPMD partitioning rule): x/targets
    rows must be data-sharded, table/bias replicated — callers gate on
    ``parallel.sharding.rows_sharded`` being False for the table.
    shard_map's transpose psums the table/bias cotangents over ``data``
    automatically (same contract as the shard_map-wrapped layer kernels
    in models/recblr.py, verified bitwise vs single-device in
    tests/test_mesh_fused.py / test_multiprocess.py)."""
    v = table.shape[0]
    if valid_v is None:
        valid_v = v
    bias = (
        jnp.zeros((v,), jnp.float32) if bias is None
        else bias.astype(jnp.float32)
    )
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from datamining_recblr_tpu.parallel.mesh import DATA_AXIS

        sharded = functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(lambda xs, tab, b, tgt: _fused_ce(
            xs, tab, b, tgt, int(valid_v), bool(mm_bf16)
        ))
        return sharded(x, table, bias, targets)
    return _fused_ce(x, table, bias, targets, int(valid_v), bool(mm_bf16))
