"""Fully-fused BD-LRU Pallas kernel: causal conv + gates + decay + scan.

The unfused path materializes, per layer and per step, several
[B, T, C] / [B, T, 2C] fp32 tensors in HBM (conv output, the gates
projection, alpha, beta — reference math at ``RecBLR.py:182-200``);
profiling shows the train step dominated by that HBM traffic plus the
small per-channel gradient reductions XLA schedules around it.  This
kernel computes, per [BT, T, C] VMEM block:

    u    = causal_depthwise_conv(x, w_c) + b_c      (K rolls, VPU)
    xc   = silu(u)                                   [skipped if no conv]
    g    = xc @ W_g + b_g                            (MXU, in-kernel)
    r, i = split(g);  a = exp(-softplus(L) * sigmoid(r))
    beta = sqrt(1 - a^2 + 1e-8) * sigmoid(i)
    h    = scan(a, beta * xc)                        (Hillis-Steele, VPU)

with *nothing* but x and h touching HBM.  The backward kernel
recomputes everything from the saved x, runs the native reverse scan of
the cotangent, and produces dx plus all weight gradients (dw_c, db_c,
dW_g, db_g, dLambda) with in-kernel MXU matmuls and reductions
accumulated across the batch grid.

Constraint: C (the expanded hidden dim) must be <= 128 so the channel
axis fits one lane tile and the gates contraction stays whole; the
flagship config (hidden 64 x expand 2 = 128) hits this exactly.
Larger C falls back to the unfused path (models/recblr.py dispatches).

Derivative math mirrors the reference VJP (``parallel_scan.py:97-114``)
extended through the gate and conv definitions:
    d_states = reverse_scan(shift_left(a), dh)
    d_beta'  = d_states ;  d_a_scan = shift_right(h) * d_states
    d_beta   = d_beta' * xc ;           dxc_direct = d_beta' * beta
    d_i      = d_beta * s * si * (1 - si)          [s = sqrt(1-a^2+eps)]
    d_a      = d_a_scan - d_beta * si * a / s
    d_r      = -d_a * a * softplus(L) * sr * (1 - sr)
    dLambda  = sum_{B,T} -d_a * a * sr * sigmoid(L)
    dxc      = [d_r, d_i] @ W_g^T + dxc_direct
    dW_g     = xc^T [d_r, d_i] ;  db_g = sum_{B,T} [d_r, d_i]
    du       = dxc * silu'(u)
    dx[t]    = sum_k w_c[k] * du[t + (K-1) - k]     (transposed conv)
    dw_c[k]  = sum_{B,T} x[t-(K-1)+k] * du[t] ;  db_c = sum du
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datamining_recblr_tpu.ops import fastmath
from datamining_recblr_tpu.ops.pallas_scan import _pad_to, _scan_body

LANE = 128
EPS = 1e-8


def _block_rows(t: int, budget: int) -> int:
    """Batch rows per block: largest power of two with rows*t <= budget,
    capped at 8 — keeps each kernel's fp32 working set within VMEM for
    long sequences (XLong-scale T~1000, paper §4.1) without chunking
    the scan.  The backward kernel holds ~2x the live arrays of the
    forward, so it gets a smaller budget."""
    bt = 8
    while bt > 1 and bt * t > budget:
        bt //= 2
    return bt


_FWD_BUDGET = 2048   # rows*T; measured-safe on v5e
_BWD_BUDGET = 1600
# v5e VMEM is 128 MiB; the default scoped limit (16 MiB) OOMs the
# backward's ~24 live [bt, T, C] f32 arrays at T=2048 even at 1-row
# blocks — ask for most of the chip like ops/fused_layer.py does
_VMEM_LIMIT = 100 * 1024 * 1024


def _shift_right(x, j, fill=0.0):
    """x[t] <- x[t-j] along axis 1 (zero history), static j."""
    if j == 0:
        return x
    t = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx >= j, pltpu.roll(x, j % t, axis=1), fill)


def _shift_left(x, j, fill=0.0):
    if j == 0:
        return x
    t = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx < t - j, pltpu.roll(x, (t - j) % t, axis=1), fill)


def _conv_fwd(x, wc, bc):
    """Causal depthwise conv: u[t] = bc + sum_k wc[k] * x[t-(K-1)+k]."""
    k = wc.shape[0]
    u = x * wc[k - 1] + bc
    for j in range(1, k):
        u = u + _shift_right(x, j) * wc[k - 1 - j]
    return u


def _silu(u):
    return u * fastmath.sigmoid(u)


def _gate_math(xc, wg, bg, lam, mm_bf16=False):
    bt, t, c = xc.shape
    x2 = xc.reshape(bt * t, c)
    if mm_bf16:
        # bf16 operands, fp32 accumulate: the production matmul policy
        # (gate *math* below stays fp32, like the reference's fp32 scan)
        x2 = x2.astype(jnp.bfloat16)
        wg = wg.astype(jnp.bfloat16)
    g = jnp.dot(x2, wg, preferred_element_type=jnp.float32) + bg
    g = g.reshape(bt, t, 2 * c)
    r, i = g[..., :c], g[..., c:]
    sr = fastmath.sigmoid(r)
    si = fastmath.sigmoid(i)
    alpha = fastmath.exp(-jax.nn.softplus(lam) * sr)
    s = jnp.sqrt(1.0 - alpha * alpha + EPS)
    beta = s * si
    return alpha, beta, sr, si, s


def _fwd_kernel(
    x_ref, wc_ref, bc_ref, wg_ref, bg_ref, lam_ref, h_ref, *, use_conv, mm_bf16
):
    x = x_ref[:].astype(jnp.float32)
    wg = wg_ref[:].astype(jnp.float32)
    bg = bg_ref[:].astype(jnp.float32)
    lam = lam_ref[:].astype(jnp.float32)
    if use_conv:
        u = _conv_fwd(x, wc_ref[:].astype(jnp.float32), bc_ref[:].astype(jnp.float32))
        xc = _silu(u)
    else:
        xc = x
    alpha, beta, _, _, _ = _gate_math(xc, wg, bg, lam, mm_bf16)
    h = _scan_body(beta * xc, alpha)
    h_ref[:] = h.astype(h_ref.dtype)


def _bwd_kernel(
    x_ref, dh_ref, wc_ref, bc_ref, wg_ref, bg_ref, lam_ref,
    dx_ref, dwc_ref, dbc_ref, dwg_ref, dbg_ref, dlam_ref,
    *, use_conv, mm_bf16,
):
    first = pl.program_id(0) == 0
    x = x_ref[:].astype(jnp.float32)
    dh = dh_ref[:].astype(jnp.float32)
    wc = wc_ref[:].astype(jnp.float32)
    wg = wg_ref[:].astype(jnp.float32)
    bg = bg_ref[:].astype(jnp.float32)
    lam = lam_ref[:].astype(jnp.float32)
    bt, t, c = x.shape
    kk = wc.shape[0]

    # recompute forward
    if use_conv:
        u = _conv_fwd(x, wc, bc_ref[:].astype(jnp.float32))
        sg = fastmath.sigmoid(u)
        xc = u * sg
    else:
        xc = x
    alpha, beta, sr, si, s = _gate_math(xc, wg, bg, lam, mm_bf16)
    h = _scan_body(beta * xc, alpha)

    a_shift = _shift_left(alpha, 1, fill=1.0)
    d_states = _scan_body(dh, a_shift, reverse=True)
    h_prev = _shift_right(h, 1)
    d_a_scan = h_prev * d_states

    d_beta = d_states * xc
    dxc_direct = d_states * beta
    d_i = d_beta * s * si * (1.0 - si)
    d_a = d_a_scan - d_beta * si * alpha / s
    spl = jax.nn.softplus(lam)
    d_r = -d_a * alpha * spl * sr * (1.0 - sr)
    d_lam = jnp.sum(-d_a * alpha * sr * fastmath.sigmoid(lam), axis=(0, 1))

    dg = jnp.concatenate([d_r, d_i], axis=-1)
    dg2 = dg.reshape(bt * t, 2 * c)
    xc2 = xc.reshape(bt * t, c)
    if mm_bf16:
        dg2m = dg2.astype(jnp.bfloat16)
        dxc = jnp.dot(
            dg2m, wg.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ).reshape(bt, t, c) + dxc_direct
        dwg = jnp.dot(
            xc2.T.astype(jnp.bfloat16), dg2m, preferred_element_type=jnp.float32
        )
    else:
        dxc = jnp.dot(
            dg2, wg.T, preferred_element_type=jnp.float32
        ).reshape(bt, t, c) + dxc_direct
        dwg = jnp.dot(xc2.T, dg2, preferred_element_type=jnp.float32)
    dbg = jnp.sum(dg2, axis=0)

    if use_conv:
        # silu'(u) = sigmoid(u) * (1 + u * (1 - sigmoid(u)))
        du = dxc * sg * (1.0 + u * (1.0 - sg))
        dx = du * wc[kk - 1]
        for j in range(1, kk):
            dx = dx + _shift_left(du, j) * wc[kk - 1 - j]
        dwc_rows = []
        for kidx in range(kk):
            xs = _shift_right(x, kk - 1 - kidx)
            dwc_rows.append(jnp.sum(xs * du, axis=(0, 1)))
        dwc = jnp.stack(dwc_rows, axis=0)  # [K, C]
        dbc = jnp.sum(du, axis=(0, 1))
    else:
        dx = dxc
        dwc = jnp.zeros_like(dwc_ref)
        dbc = jnp.zeros_like(dbc_ref)

    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)
        dlam_ref[:] = jnp.zeros_like(dlam_ref)

    dwc_ref[:] += dwc
    dbc_ref[:] += dbc
    dwg_ref[:] += dwg
    dbg_ref[:] += dbg
    dlam_ref[:] += d_lam


def _interpret():
    return jax.default_backend() != "tpu"


def _full_spec(shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


@functools.partial(jax.jit, static_argnames=("use_conv", "mm_bf16"))
def _fused_fwd(x, wc, bc, wg, bg, lam, use_conv, mm_bf16=False):
    b, t, c = x.shape
    bt = _block_rows(t, _FWD_BUDGET)
    xp = _pad_to(x, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    h = pl.pallas_call(
        functools.partial(_fwd_kernel, use_conv=use_conv, mm_bf16=mm_bf16),
        out_shape=jax.ShapeDtypeStruct((bp, t, c), x.dtype),
        grid=(bp // bt,),
        in_specs=[
            block,
            _full_spec(wc.shape),
            _full_spec(bc.shape),
            _full_spec(wg.shape),
            _full_spec(bg.shape),
            _full_spec(lam.shape),
        ],
        out_specs=block,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, wc, bc, wg, bg, lam)
    return h[:b]


@functools.partial(jax.jit, static_argnames=("use_conv", "mm_bf16"))
def _fused_bwd(x, dh, wc, bc, wg, bg, lam, use_conv, mm_bf16=False):
    b, t, c = x.shape
    bt = _block_rows(t, _BWD_BUDGET)
    xp = _pad_to(x, 0, bt, 0.0)
    dhp = _pad_to(dh, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, use_conv=use_conv, mm_bf16=mm_bf16),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, c), x.dtype),
            jax.ShapeDtypeStruct(wc.shape, jnp.float32),
            jax.ShapeDtypeStruct(bc.shape, jnp.float32),
            jax.ShapeDtypeStruct(wg.shape, jnp.float32),
            jax.ShapeDtypeStruct(bg.shape, jnp.float32),
            jax.ShapeDtypeStruct(lam.shape, jnp.float32),
        ),
        grid=(bp // bt,),
        in_specs=[
            block, block,
            _full_spec(wc.shape),
            _full_spec(bc.shape),
            _full_spec(wg.shape),
            _full_spec(bg.shape),
            _full_spec(lam.shape),
        ],
        out_specs=(
            block,
            _full_spec(wc.shape),
            _full_spec(bc.shape),
            _full_spec(wg.shape),
            _full_spec(bg.shape),
            _full_spec(lam.shape),
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, dhp, wc, bc, wg, bg, lam)
    dx, dwc, dbc, dwg, dbg, dlam = outs
    return dx[:b], dwc, dbc, dwg, dbg, dlam


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_bdlru(x, wc, bc, wg, bg, lam, use_conv=True, mm_bf16=False):
    """h = scan(alpha(xc), beta(xc) * xc), xc = silu(conv(x)) or x.

    x: [B, T, C] (C <= 128); wc: [K, C]; bc: [C]; wg: [C, 2C];
    bg: [2C]; lam: [C]; use_conv: static flag (False for the
    bd_lru_only / disable_conv1d ablations, reference RecBLR.py:28-35);
    mm_bf16: static — run in-kernel matmuls with bf16 operands / fp32
    accumulation (production policy under bf16 compute); the scan and
    gate math stay fp32 either way.
    """
    return _fused_fwd(x, wc, bc, wg, bg, lam, use_conv, mm_bf16)


def _vjp_fwd(x, wc, bc, wg, bg, lam, use_conv, mm_bf16):
    h = _fused_fwd(x, wc, bc, wg, bg, lam, use_conv, mm_bf16)
    return h, (x, wc, bc, wg, bg, lam)


def _vjp_bwd(use_conv, mm_bf16, res, dh):
    x, wc, bc, wg, bg, lam = res
    dx, dwc, dbc, dwg, dbg, dlam = _fused_bwd(
        x, dh, wc, bc, wg, bg, lam, use_conv, mm_bf16
    )
    return (
        dx,
        dwc.astype(wc.dtype),
        dbc.astype(bc.dtype),
        dwg.astype(wg.dtype),
        dbg.astype(bg.dtype),
        dlam.astype(lam.dtype),
    )


fused_bdlru.defvjp(_vjp_fwd, _vjp_bwd)


def supports(c: int) -> bool:
    return c <= LANE
