"""Sequence-chunked whole-layer fused kernel for the RecBLR
RecurrentLayer — the long-context (XLong-scale) variant.

The whole-T kernels in ``ops/fused_layer.py`` hold full [bt, T, C]
fp32 tensors in VMEM and stop fitting beyond T=512 (CLAUDE.md VMEM
notes).  This variant tiles the sequence into chunks and carries the
recurrence across them, so VMEM holds only [bt, Tc, C] at a time and
any T compiles:

* grid = (batch_blocks, n_chunks), chunks innermost — TPU grids run
  sequentially, so VMEM scratch persists across the chunk axis;
* forward carries ``h_last`` (the BD-LRU state at each chunk boundary)
  and the conv input tail (last K-1 xb rows) in scratch, and ALSO
  writes both per chunk (``bnd``/``tail`` outputs) for the backward;
* the within-chunk scan is the same Hillis-Steele body; the carry is
  applied as ``h = h_local + gate_cumprod * carry`` (first-order
  linearity — the same trick ``ops/pallas_scan.py``'s chunked grid and
  the reference's backward construction rely on, reference
  ``parallel_scan.py:97-114``);
* the backward walks chunks in REVERSE data order (index maps flip the
  chunk axis), carrying the reverse-scan state
  ``alpha_first * d_state_first`` and the conv cotangent head
  (first K-1 du rows) backward, and recomputes each chunk's forward
  from the saved boundary state + conv tail;
* in-kernel PRNG dropout is seeded per (batch-block, DATA-chunk), so
  the reversed backward replays bit-identical masks.

Math, parameter layout, and dropout semantics are identical to
``fused_recurrent_layer`` (reference ``RecBLR.py:124-227`` block); the
two agree to fp32 reassociation tolerance and share the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datamining_recblr_tpu.ops import fastmath
from datamining_recblr_tpu.ops.fused_bdlru import _gate_math, _shift_left, _silu
from datamining_recblr_tpu.ops.fused_layer import (
    _VMEM_LIMIT,
    _dropout_mask,
    _interpret,
    _ln_bwd,
    _ln_fwd,
    _make_mm,
    _mmT,
    _pad_to,
    _param_names,
    _params_from_refs,
)
from datamining_recblr_tpu.ops.pallas_scan import _scan_body


def _full_spec2(shape):
    """Whole-array VMEM spec for the 2-D (batch-block, chunk) grid."""
    return pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def pick_chunk(t: int, target: int = 128) -> int:
    """Largest divisor of ``t`` in [8, target] that is itself a
    multiple of 8 (sequence chunks must tile T exactly, hold at least
    a conv window, AND be sublane-aligned: the chunk is the block's
    second-to-last dim, which Mosaic requires divisible by 8 — e.g.
    T=1000 must pick 40, not 125); returns 0 when no such divisor
    exists (e.g. prime T) — callers gate the chunked path off and fall
    back.  Target 128 keeps 8-row batch blocks — measured fastest on
    v5e at T=1024 (9.68 ms fwd+bwd vs 9.91 at chunk 256 / 10.24 at
    512)."""
    best = 0
    for d in range(8, min(t, target) + 1, 8):
        if t % d == 0:
            best = d
    return best


def _chunk_block_rows(tc: int) -> int:
    """Per-chunk batch rows: same rows*T VMEM budget as the whole-T
    backward (1600 at T=200 -> 8 rows)."""
    bt = 8
    while bt > 1 and bt * tc > 1600:
        bt //= 2
    return bt


def _conv_fwd_tail(xb, tail, wc, bc):
    """Causal depthwise conv over one chunk with the previous chunk's
    last K-1 rows as the left context: u_t = bc + sum_k wc[k] *
    ext[t + k] where ext = concat(tail, xb)."""
    k = wc.shape[0]
    ext = jnp.concatenate([tail, xb], axis=1)  # [bt, K-1+Tc, C]
    tc = xb.shape[1]
    u = jnp.broadcast_to(bc, xb.shape)
    for j in range(k):
        u = u + wc[j] * ext[:, j : j + tc, :]
    return u


def _shift_right_tail(v, first):
    """shift_right by 1 along axis 1 with ``first`` [bt, 1, C] filling
    position 0 (the previous chunk's last value)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    rolled = pltpu.roll(v, 1, axis=1)
    return jnp.where(idx == 0, first, rolled)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, x_ref, *refs, use_conv, use_ffn, keep_prob,
                mm_bf16, prologue, k_conv):
    n_params = (15 if use_ffn else 9) + (2 if prologue else 0)
    param_refs = refs[:n_params]
    out_ref, carry_ref = refs[n_params : n_params + 2]
    hc_ref, tl_ref = refs[n_params + 2 :]
    i, j = pl.program_id(0), pl.program_id(1)
    nc = pl.num_programs(1)
    _mm = _make_mm(mm_bf16)
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + i * nc + j)
    p = _params_from_refs(param_refs, use_ffn, prologue)
    x = x_ref[:].astype(jnp.float32)
    if prologue:
        if keep_prob < 1.0:
            x = x * _dropout_mask(x.shape, keep_prob)
        x, _, _ = _ln_fwd(x, p["pl_s"], p["pl_b"])
    bt, tc, d = x.shape

    x2 = x.reshape(bt * tc, d)
    xz = _mm(x2, p["w_in"]).reshape(bt, tc, -1)
    c = xz.shape[-1] // 2
    xb, z = xz[..., :c], xz[..., c:]

    @pl.when(j == 0)
    def _init():
        hc_ref[:] = jnp.zeros_like(hc_ref)
        tl_ref[:] = jnp.zeros_like(tl_ref)

    tail_in = tl_ref[:].astype(jnp.float32)[:, : k_conv - 1, :]  # [bt, K-1, C]
    if use_conv:
        u = _conv_fwd_tail(xb, tail_in, p["wc"], p["bc"])
        xc = _silu(u)
    else:
        xc = xb
    alpha, beta, sr, si, s = _gate_math(xc, p["wg"], p["bg"], p["lam"], mm_bf16)
    hloc, fcum = _scan_body(beta * xc, alpha, return_prod=True)
    carry = hc_ref[:].astype(jnp.float32)  # [bt, C]
    h = hloc + fcum * carry[:, None, :]
    # save the INCOMING boundary state + conv tail for the backward,
    # packed into one 8-sublane tile (row 0 = h carry, rows 1..K-1 =
    # conv tail; Mosaic requires 8/128-aligned trailing block dims)
    pad = jnp.zeros((bt, 8 - k_conv, carry.shape[-1]), jnp.float32)
    carry_ref[:] = jnp.concatenate([carry[:, None, :], tail_in, pad], axis=1)
    # static slices only: Mosaic has no dynamic_slice, and scalar
    # indexing (h[:, -1]) lowers through it
    hc_ref[:] = jax.lax.slice_in_dim(h, tc - 1, tc, axis=1).reshape(bt, -1)
    tl_ref[:, : k_conv - 1, :] = xb[:, tc - (k_conv - 1) :, :]

    sz = fastmath.sigmoid(z)
    yin = ((z * sz) * h).reshape(bt * tc, c)
    y = _mm(yin, p["w_out"]).reshape(bt, tc, d)
    if keep_prob < 1.0:
        y = y * _dropout_mask(y.shape, keep_prob)
    r1, _, _ = _ln_fwd(y + x, p["ln1_s"], p["ln1_b"])
    if not use_ffn:
        out_ref[:] = r1.astype(out_ref.dtype)
        return
    f1 = (_mm(r1.reshape(bt * tc, d), p["w1"]) + p["b1"]).reshape(bt, tc, -1)
    a1 = f1 * fastmath.sigmoid(f1)
    if keep_prob < 1.0:
        a1 = a1 * _dropout_mask(a1.shape, keep_prob)
    f2 = (_mm(a1.reshape(bt * tc, -1), p["w2"]) + p["b2"]).reshape(bt, tc, d)
    if keep_prob < 1.0:
        f2 = f2 * _dropout_mask(f2.shape, keep_prob)
    out, _, _ = _ln_fwd(f2 + r1, p["ln2_s"], p["ln2_b"])
    out_ref[:] = out.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward (chunks walked in reverse data order)
# ---------------------------------------------------------------------------


def _bwd_kernel(seed_ref, x_ref, dout_ref, carry_ref, *refs,
                use_conv, use_ffn, keep_prob, mm_bf16, prologue, k_conv):
    n_params = (15 if use_ffn else 9) + (2 if prologue else 0)
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    grad_refs = refs[n_params + 1 : n_params + 1 + n_params]
    dc_ref, duh_ref = refs[n_params + 1 + n_params :]
    i, j = pl.program_id(0), pl.program_id(1)
    nc = pl.num_programs(1)
    jd = nc - 1 - j  # data chunk index (index maps flip the chunk axis)
    first = jnp.logical_and(i == 0, j == 0)
    _mm = _make_mm(mm_bf16)
    kk = k_conv
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + i * nc + jd)
    p = _params_from_refs(param_refs, use_ffn, prologue)
    x = x_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)

    # --- recompute this chunk's forward (identical PRNG order) ---------
    if prologue:
        if keep_prob < 1.0:
            m0 = _dropout_mask(x.shape, keep_prob)
            xd = x * m0
        else:
            m0 = None
            xd = x
        x, vhat0, inv0 = _ln_fwd(xd, p["pl_s"], p["pl_b"])
    bt, tc, d = x.shape
    x2 = x.reshape(bt * tc, d)
    xz = _mm(x2, p["w_in"]).reshape(bt, tc, -1)
    c = xz.shape[-1] // 2
    xb, z = xz[..., :c], xz[..., c:]
    cs = carry_ref[:].astype(jnp.float32)  # [bt, 8, C] packed
    tail_in = cs[:, 1:k_conv, :]                 # [bt, K-1, C]
    if use_conv:
        u = _conv_fwd_tail(xb, tail_in, p["wc"], p["bc"])
        sg_u = fastmath.sigmoid(u)
        xc = u * sg_u
    else:
        xc = xb
    alpha, beta, sr, si, s = _gate_math(xc, p["wg"], p["bg"], p["lam"], mm_bf16)
    hloc, fcum = _scan_body(beta * xc, alpha, return_prod=True)
    carry = jax.lax.slice_in_dim(cs, 0, 1, axis=1).reshape(bt, -1)  # [bt, C]
    h = hloc + fcum * carry[:, None, :]
    sz = fastmath.sigmoid(z)
    gate = z * sz
    yin = (gate * h).reshape(bt * tc, c)
    y = _mm(yin, p["w_out"]).reshape(bt, tc, d)
    if keep_prob < 1.0:
        m1 = _dropout_mask(y.shape, keep_prob)
        yd = y * m1
    else:
        m1 = None
        yd = y
    r1, vhat1, inv1 = _ln_fwd(yd + x, p["ln1_s"], p["ln1_b"])
    if use_ffn:
        f1 = (_mm(r1.reshape(bt * tc, d), p["w1"]) + p["b1"]).reshape(bt, tc, -1)
        sf1 = fastmath.sigmoid(f1)
        a1 = f1 * sf1
        if keep_prob < 1.0:
            m2 = _dropout_mask(a1.shape, keep_prob)
            a1d = a1 * m2
        else:
            m2 = None
            a1d = a1
        f2 = (_mm(a1d.reshape(bt * tc, -1), p["w2"]) + p["b2"]).reshape(bt, tc, d)
        if keep_prob < 1.0:
            m3 = _dropout_mask(f2.shape, keep_prob)
            f2d = f2 * m3
        else:
            m3 = None
            f2d = f2
        _, vhat2, inv2 = _ln_fwd(f2d + r1, p["ln2_s"], p["ln2_b"])

    # --- backward (positionwise part: same math as fused_layer) --------
    grads = {}
    if use_ffn:
        dv2, grads["ln2_s"], grads["ln2_b"] = _ln_bwd(dout, vhat2, inv2, p["ln2_s"])
        df2 = dv2 * m3 if m3 is not None else dv2
        dr1 = dv2
        df2_2 = df2.reshape(bt * tc, d)
        grads["w2"] = _mmT(a1d.reshape(bt * tc, -1), df2_2)
        grads["b2"] = jnp.sum(df2_2, axis=0)
        da1 = _mm(df2_2, p["w2"].T).reshape(bt, tc, -1)
        if m2 is not None:
            da1 = da1 * m2
        df1 = da1 * sf1 * (1.0 + f1 * (1.0 - sf1))
        df1_2 = df1.reshape(bt * tc, -1)
        grads["w1"] = _mmT(r1.reshape(bt * tc, d), df1_2)
        grads["b1"] = jnp.sum(df1_2, axis=0)
        dr1 = dr1 + _mm(df1_2, p["w1"].T).reshape(bt, tc, d)
    else:
        dr1 = dout

    dv1, grads["ln1_s"], grads["ln1_b"] = _ln_bwd(dr1, vhat1, inv1, p["ln1_s"])
    dx = dv1
    dy = dv1 * m1 if m1 is not None else dv1
    dy2 = dy.reshape(bt * tc, d)
    grads["w_out"] = _mmT(yin, dy2)
    dyin = _mm(dy2, p["w_out"].T).reshape(bt, tc, c)
    dgate = dyin * h
    dh = dyin * gate
    dz = dgate * sz * (1.0 + z * (1.0 - sz))

    # --- cross-chunk reverse scan --------------------------------------
    @pl.when(j == 0)
    def _init():
        dc_ref[:] = jnp.zeros_like(dc_ref)
        duh_ref[:] = jnp.zeros_like(duh_ref)

    a_shift = _shift_left(alpha, 1, fill=1.0)
    dloc, rprod = _scan_body(dh, a_shift, reverse=True, return_prod=True)
    dc = dc_ref[:].astype(jnp.float32)  # alpha_first(next) * d_state_first(next)
    d_states = dloc + rprod * dc[:, None, :]
    a0 = jax.lax.slice_in_dim(alpha, 0, 1, axis=1).reshape(bt, -1)
    ds0 = jax.lax.slice_in_dim(d_states, 0, 1, axis=1).reshape(bt, -1)
    dc_ref[:] = a0 * ds0

    h_prev = _shift_right_tail(h, carry[:, None, :])
    d_a_scan = h_prev * d_states
    d_beta = d_states * xc
    dxc = d_states * beta
    d_i = d_beta * s * si * (1.0 - si)
    d_a = d_a_scan - d_beta * si * alpha / s
    spl = jax.nn.softplus(p["lam"])
    d_r = -d_a * alpha * spl * sr * (1.0 - sr)
    grads["lam"] = jnp.sum(-d_a * alpha * sr * fastmath.sigmoid(p["lam"]), axis=(0, 1))
    dg = jnp.concatenate([d_r, d_i], axis=-1).reshape(bt * tc, 2 * c)
    xc2 = xc.reshape(bt * tc, c)
    dxc = dxc + _mm(dg, p["wg"].T).reshape(bt, tc, c)
    grads["wg"] = _mmT(xc2, dg)
    grads["bg"] = jnp.sum(dg, axis=0)

    if use_conv:
        du = dxc * sg_u * (1.0 + u * (1.0 - sg_u))
        du_head = duh_ref[:].astype(jnp.float32)[:, : kk - 1, :]  # next chunk's first K-1 du
        du_ext = jnp.concatenate([du, du_head], axis=1)  # [bt, Tc+K-1, C]
        dxb = jnp.zeros_like(du)
        for jj in range(kk):
            dxb = dxb + du_ext[:, jj : jj + tc, :] * p["wc"][kk - 1 - jj]
        xb_ext = jnp.concatenate([tail_in, xb], axis=1)  # [bt, K-1+Tc, C]
        dwc_rows = []
        for kidx in range(kk):
            xs = xb_ext[:, kidx : kidx + tc, :]
            dwc_rows.append(jnp.sum(xs * du, axis=(0, 1)))
        grads["wc"] = jnp.stack(dwc_rows, axis=0)
        grads["bc"] = jnp.sum(du, axis=(0, 1))
        duh_ref[:, : kk - 1, :] = du[:, : kk - 1, :]
    else:
        dxb = dxc
        grads["wc"] = jnp.zeros_like(p["wc"])
        grads["bc"] = jnp.zeros_like(p["bc"])

    dxz = jnp.concatenate([dxb, dz], axis=-1).reshape(bt * tc, 2 * c)
    grads["w_in"] = _mmT(x2, dxz)
    dx = dx + _mm(dxz, p["w_in"].T).reshape(bt, tc, d)

    if prologue:
        dv0, grads["pl_s"], grads["pl_b"] = _ln_bwd(dx, vhat0, inv0, p["pl_s"])
        dx = dv0 * m0 if m0 is not None else dv0
    dx_ref[:] = dx.astype(dx_ref.dtype)

    names = _param_names(use_ffn, prologue)

    @pl.when(first)
    def _zero():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    for name, ref in zip(names, grad_refs):
        ref[:] += grads[name]


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("use_conv", "use_ffn", "dropout_p", "mm_bf16",
                     "prologue", "chunk", "block_rows"),
)
def _chunked_fwd(x, seed, params, use_conv, use_ffn, dropout_p,
                 mm_bf16=False, prologue=False, chunk=0, block_rows=0):
    b, t, d = x.shape
    tc = chunk or pick_chunk(t)
    kk = params["wc"].shape[0]
    if not (kk <= 8 and 8 <= tc <= t and t % tc == 0 and tc >= kk):
        raise ValueError(
            f"chunked layer kernel needs a chunk in [8, T] dividing T "
            f"and d_conv <= 8 (got T={t}, chunk={tc}, d_conv={kk}); "
            "gate via pick_chunk() and fall back"
        )
    bt = block_rows or _chunk_block_rows(tc)
    nc = t // tc
    names = _param_names(use_ffn, prologue)
    plist = [params[n] for n in names]
    c = params["w_in"].shape[1] // 2
    xp = _pad_to(x, 0, bt, 0.0)
    bp = xp.shape[0]
    xblock = pl.BlockSpec((bt, tc, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    cblock = pl.BlockSpec(
        (bt, 8, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out, carry = pl.pallas_call(
        functools.partial(
            _fwd_kernel, use_conv=use_conv, use_ffn=use_ffn,
            keep_prob=1.0 - dropout_p, mm_bf16=mm_bf16, prologue=prologue,
            k_conv=kk,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            jax.ShapeDtypeStruct((bp, nc * 8, c), jnp.float32),
        ),
        grid=(bp // bt, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            xblock,
            *[_full_spec2(p.shape) for p in plist],
        ],
        out_specs=(xblock, cblock),
        scratch_shapes=[
            pltpu.VMEM((bt, c), jnp.float32),
            pltpu.VMEM((bt, 8, c), jnp.float32),
        ],
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(seed, xp, *plist)
    return out[:b], carry[:b]


@functools.partial(
    jax.jit,
    static_argnames=("use_conv", "use_ffn", "dropout_p", "mm_bf16",
                     "prologue", "chunk", "block_rows"),
)
def _chunked_bwd(x, dout, carry, seed, params, use_conv, use_ffn,
                 dropout_p, mm_bf16=False, prologue=False, chunk=0,
                 block_rows=0):
    b, t, d = x.shape
    tc = chunk or pick_chunk(t)
    bt = block_rows or _chunk_block_rows(tc)
    nc = t // tc
    names = _param_names(use_ffn, prologue)
    plist = [params[n] for n in names]
    c = params["w_in"].shape[1] // 2
    kk = params["wc"].shape[0]
    xp = _pad_to(x, 0, bt, 0.0)
    dp = _pad_to(dout, 0, bt, 0.0)
    carryp = _pad_to(carry, 0, bt, 0.0)
    bp = xp.shape[0]
    # chunk axis flipped: execution step j touches data chunk nc-1-j
    xblock = pl.BlockSpec(
        (bt, tc, d), lambda i, j: (i, nc - 1 - j, 0), memory_space=pltpu.VMEM
    )
    cblock = pl.BlockSpec(
        (bt, 8, c), lambda i, j: (i, nc - 1 - j, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, use_conv=use_conv, use_ffn=use_ffn,
            keep_prob=1.0 - dropout_p, mm_bf16=mm_bf16, prologue=prologue,
            k_conv=kk,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist],
        ),
        grid=(bp // bt, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            xblock,
            xblock,
            cblock,
            *[_full_spec2(p.shape) for p in plist],
        ],
        out_specs=(
            xblock,
            *[_full_spec2(p.shape) for p in plist],
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, c), jnp.float32),
            pltpu.VMEM((bt, 8, c), jnp.float32),
        ],
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(seed, xp, dp, carryp, *plist)
    dx = outs[0][:b]
    dparams = {n: g for n, g in zip(names, outs[1:])}
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_recurrent_layer_chunked(x, seed, params, use_conv, use_ffn,
                                  dropout_p, mm_bf16=False, prologue=False,
                                  chunk=0):
    """Complete RecurrentLayer as one sequence-chunked Pallas kernel —
    same contract as ``fused_recurrent_layer`` (x [B, T, D], int32[1]
    seed, fp32 param dict) but T is tiled into ``chunk``-length pieces
    with the recurrence carried across them, so long-context shapes
    (T=1024+) fit VMEM.  ``chunk=0`` picks the largest divisor of T in
    [8, 128] (see pick_chunk)."""
    out, _ = _chunked_fwd(
        x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
        prologue=prologue, chunk=chunk,
    )
    return out


def _vjp_fwd(x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
             prologue, chunk):
    out, carry = _chunked_fwd(
        x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
        prologue=prologue, chunk=chunk,
    )
    return out, (x, carry, seed, params)


def _vjp_bwd(use_conv, use_ffn, dropout_p, mm_bf16, prologue, chunk,
             res, dout):
    x, carry, seed, params = res
    dx, dparams = _chunked_bwd(
        x, dout, carry, seed, params, use_conv, use_ffn, dropout_p,
        mm_bf16, prologue=prologue, chunk=chunk,
    )
    return dx, None, dparams


fused_recurrent_layer_chunked.defvjp(_vjp_fwd, _vjp_bwd)
