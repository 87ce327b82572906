"""Whole-layer fused Pallas kernels for the RecBLR RecurrentLayer.

One kernel per direction covers the complete residual block of the
reference model (``RecBLR.py:124-145`` + ``148-207`` + ``210-227``):

    xz   = x @ W_in ;  xb, z = split(xz)
    xc   = silu(causal_conv(xb))            [optional]
    h    = BD-LRU scan of xc                (gates matmul + decay math)
    y    = (silu(z) * h) @ W_out
    r1   = LN1(dropout(y) + x)
    f    = dropout(silu(r1 @ W1 + b1)) @ W2 + b2   [optional FFN]
    out  = LN2(dropout(f) + r1)

Forward saves only x; the backward kernel recomputes all activations in
VMEM and emits dx plus every weight gradient with in-kernel MXU matmuls
accumulated across the batch grid.  HBM traffic per layer collapses to
one read of x and one write of out (plus dout/dx in the backward) — the
profiled alternative was ~30 separate [B,T,C] XLA fusions.

Dropout runs *inside* the kernel on the TPU PRNG: the per-step seed and
the block's ``program_id`` seed `pltpu.prng_seed`, and the backward
regenerates bit-identical masks by replaying the same generation order.
With ``dropout_p == 0`` (eval) the PRNG is compiled out entirely.

Constraints: hidden D <= 128 and expanded C = expand*D <= 128 (flagship:
64/128).  Larger models fall back to the unfused composition in
``models/recblr.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datamining_recblr_tpu.ops import fastmath
from datamining_recblr_tpu.ops.fused_bdlru import (
    _conv_fwd,
    _gate_math,
    _shift_left,
    _shift_right,
    _silu,
)
from datamining_recblr_tpu.ops.pallas_scan import _pad_to, _scan_body

LN_EPS = 1e-12


def _block_rows(t: int, budget: int, cap: int = 8) -> int:
    bt = cap
    while bt > 1 and bt * t > budget:
        bt //= 2
    return bt


_FWD_BUDGET = 1600
# With the raised vmem_limit_bytes (v5e has 128 MiB; Mosaic's default
# scoped cap is what used to force 4-row backward blocks), 8-row
# backward blocks compile and run ~5% faster at T=200.
_BWD_BUDGET = 1600
_BWD_CAP = 8


def _dropout_mask(shape, keep_prob):
    """Scaled keep-mask from the in-kernel PRNG (call order matters —
    forward and backward must generate masks in the same sequence)."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int(keep_prob * 4294967296.0), 4294967295))
    keep = pltpu.bitcast(bits, jnp.uint32) < threshold
    return jnp.where(keep, 1.0 / keep_prob, 0.0)


def _draw_masks(bt, t, d, dff, keep_prob, use_ffn, prologue):
    """Draw ALL the layer's dropout masks upfront, in the fixed order
    m0 (prologue), m1 (post-W_out), m2 (FFN inner), m3 (FFN out).

    The PRNG stream depends only on the seed and the draw sequence, so
    drawing upfront yields bit-identical masks to drawing at the point
    of use — and lets the dual-chain backward replay two independent
    half-blocks without interleaving their PRNG streams."""
    masks = {}
    if keep_prob >= 1.0:
        return masks
    if prologue:
        masks["m0"] = _dropout_mask((bt, t, d), keep_prob)
    masks["m1"] = _dropout_mask((bt, t, d), keep_prob)
    if use_ffn:
        masks["m2"] = _dropout_mask((bt, t, dff), keep_prob)
        masks["m3"] = _dropout_mask((bt, t, d), keep_prob)
    return masks


def _ln_fwd(v, scale, bias):
    mu = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    vhat = (v - mu) * inv
    return vhat * scale + bias, vhat, inv


def _ln_bwd(dy, vhat, inv, scale):
    """Returns (dv, dscale_partial, dbias_partial)."""
    n = vhat.shape[-1]
    dvhat = dy * scale
    m1 = jnp.mean(dvhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dvhat * vhat, axis=-1, keepdims=True)
    dv = inv * (dvhat - m1 - vhat * m2)
    dscale = jnp.sum(dy * vhat, axis=(0, 1))
    dbias = jnp.sum(dy, axis=(0, 1))
    del n
    return dv, dscale, dbias


def _make_mm(mm_bf16):
    """In-kernel matmul: fp32 accumulate always; with ``mm_bf16`` the
    operands are cast to bf16 first (the production matmul policy —
    scan/gates/LN math stays fp32 regardless)."""
    if mm_bf16:
        def _mm(a, b):
            return jnp.dot(
                a.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    else:
        def _mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return _mm


def _mmT(a, b):
    """a[N, K], b[N, M] -> a^T @ b [K, M], contracting dim 0 directly so
    Mosaic feeds the MXU without materializing the [K, N] transpose."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _layer_fwd_core(x, p, masks, *, use_conv, use_ffn, mm_bf16=False,
                    want_stash=False):
    """Shared forward math on an f32 [BT, T, D] block.  ``masks`` holds
    the pre-drawn scaled dropout masks (empty dict = no dropout).
    ``want_stash`` additionally computes the silu' coefficient the
    stashing backward consumes (2 extra mul-adds)."""
    _mm = _make_mm(mm_bf16)
    bt, t, d = x.shape
    x2 = x.reshape(bt * t, d)
    xz = _mm(x2, p["w_in"]).reshape(bt, t, -1)
    c = xz.shape[-1] // 2
    xb, z = xz[..., :c], xz[..., c:]
    dsilu_u = None
    if use_conv:
        u = _conv_fwd(xb, p["wc"], p["bc"])
        sg_u = fastmath.sigmoid(u)
        xc = u * sg_u
        if want_stash and "dsilu_u" in _STASH_SET:
            dsilu_u = sg_u * (1.0 + u * (1.0 - sg_u))
    else:
        u = xb
        xc = xb
    alpha, beta, sr, si, s = _gate_math(xc, p["wg"], p["bg"], p["lam"], mm_bf16)
    h = _scan_body(beta * xc, alpha)
    sz = fastmath.sigmoid(z)
    gate = z * sz  # silu(z)
    yin = (gate * h).reshape(bt * t, c)
    y = _mm(yin, p["w_out"]).reshape(bt, t, d)

    if "m1" in masks:
        y = y * masks["m1"]
    r1_in = y + x
    r1, vhat1, inv1 = _ln_fwd(r1_in, p["ln1_s"], p["ln1_b"])

    if not use_ffn:
        return dict(
            xb=xb, z=z, u=u, xc=xc, alpha=alpha, beta=beta, sr=sr, si=si,
            s=s, h=h, sz=sz, gate=gate, vhat1=vhat1, inv1=inv1, out=r1,
            dsilu_u=dsilu_u,
        )

    r1f = r1.reshape(bt * t, d)
    f1 = _mm(r1f, p["w1"]) + p["b1"]
    f1 = f1.reshape(bt, t, -1)
    sf1 = fastmath.sigmoid(f1)
    a1 = f1 * sf1  # silu
    if "m2" in masks:
        a1d = a1 * masks["m2"]
    else:
        a1d = a1
    f2 = _mm(a1d.reshape(bt * t, -1), p["w2"]) + p["b2"]
    f2 = f2.reshape(bt, t, d)
    if "m3" in masks:
        f2d = f2 * masks["m3"]
    else:
        f2d = f2
    out, vhat2, inv2 = _ln_fwd(f2d + r1, p["ln2_s"], p["ln2_b"])
    return dict(
        xb=xb, z=z, u=u, xc=xc, alpha=alpha, beta=beta, sr=sr, si=si, s=s,
        h=h, sz=sz, gate=gate, vhat1=vhat1, inv1=inv1, r1=r1, f1=f1,
        sf1=sf1, a1=a1, a1d=a1d, vhat2=vhat2, inv2=inv2, out=out,
        dsilu_u=dsilu_u,
    )


def _param_names(use_ffn, prologue=False):
    names = ["w_in", "wc", "bc", "wg", "bg", "lam", "w_out", "ln1_s", "ln1_b"]
    if use_ffn:
        names += ["w1", "b1", "w2", "b2", "ln2_s", "ln2_b"]
    if prologue:
        names += ["pl_s", "pl_b"]
    return names


# Which forward intermediates the stashing forward saves to HBM for the
# backward.  Measured on v5e (B=2048, T=200): the FULL set (alpha, beta,
# sr, si, s, h, xc, dsilu_u, sf1 = ~8 MB per 8-row block) costs MORE in
# exposed forward write-DMA (+1.55 ms) than the backward recompute it
# removes (-0.46 ms) — HBM writes do not hide like reads do
# (benchmarks/dma probe: <= 8 big READ inputs are free).  The winning
# set is just ``h``: one 800 KB write skips the whole forward scan in
# the backward (the single longest serial chain, ~1.6 us/block).
_STASH_SET = frozenset({"h"})


def _stash_names(use_conv, use_ffn):
    """Forward intermediates the stashing backward consumes instead of
    recomputing.  All [bt, T, C] f32 except sf1 [bt, T, 4D]."""
    names = ["alpha", "beta", "sr", "si", "s", "h", "xc"]
    if use_conv:
        names.append("dsilu_u")
    if use_ffn:
        names.append("sf1")
    return [n for n in names if n in _STASH_SET]


def _params_from_refs(refs, use_ffn, prologue=False):
    return {
        n: r[:].astype(jnp.float32)
        for n, r in zip(_param_names(use_ffn, prologue), refs)
    }


def _fwd_kernel(seed_ref, x_ref, *refs, use_conv, use_ffn, keep_prob, mm_bf16,
                prologue=False, stash=False):
    n_params = (15 if use_ffn else 9) + (2 if prologue else 0)
    param_refs = refs[:n_params]
    out_ref = refs[n_params]
    stash_refs = refs[n_params + 1 :]
    x = x_ref[:].astype(jnp.float32)
    p = _params_from_refs(param_refs, use_ffn, prologue)
    bt, t, d = x.shape
    dff = p["w1"].shape[1] if use_ffn else 0
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    masks = _draw_masks(bt, t, d, dff, keep_prob, use_ffn, prologue)
    if prologue:
        # embedding prologue fused in: dropout THEN LayerNorm
        # (reference RecBLR.py:76-78); this mask is the FIRST PRNG draw
        if "m0" in masks:
            x = x * masks["m0"]
        x, _, _ = _ln_fwd(x, p["pl_s"], p["pl_b"])
    res = _layer_fwd_core(
        x, p, masks, use_conv=use_conv, use_ffn=use_ffn, mm_bf16=mm_bf16,
        want_stash=stash,
    )
    out_ref[:] = res["out"].astype(out_ref.dtype)
    if stash:
        for name, ref in zip(_stash_names(use_conv, use_ffn), stash_refs):
            ref[:] = res[name]


def _bwd_core(x, dout, p, masks, *, use_conv, use_ffn, mm_bf16, prologue,
              stash=None):
    """Pure backward math on one f32 [bt, T, D] block: recomputes the
    forward from x and the pre-drawn ``masks``, returns (dx, grads).
    With ``stash`` (dict of forward intermediates saved to HBM by the
    stashing forward), the expensive recompute chains — gate
    transcendentals, conv+silu, the forward scan, the FFN sigmoid — are
    skipped; benchmarks/bwd_anatomy.py showed the kernel is bound by
    exactly these elementwise passes (all matmuls removed: -4%).
    Pure so the multi-chain kernel can run independent copies whose
    instructions the Mosaic scheduler may overlap across the MXU/VPU
    (benchmarks/unit_overlap.py: 0.92 overlap fraction on v5e)."""
    _mm = _make_mm(mm_bf16)
    m0 = masks.get("m0")
    m1 = masks.get("m1")
    m2 = masks.get("m2")
    m3 = masks.get("m3")
    if prologue:
        xd = x * m0 if m0 is not None else x
        x, vhat0, inv0 = _ln_fwd(xd, p["pl_s"], p["pl_b"])
    bt, t, d = x.shape

    # --- recompute forward with the replayed dropout masks -------------
    x2 = x.reshape(bt * t, d)
    xz = _mm(x2, p["w_in"]).reshape(bt, t, -1)
    c = xz.shape[-1] // 2
    xb, z = xz[..., :c], xz[..., c:]
    stash = stash or {}
    if use_conv:
        if "xc" in stash and "dsilu_u" in stash:
            xc = stash["xc"]
        else:
            u = _conv_fwd(xb, p["wc"], p["bc"])
            sg_u = fastmath.sigmoid(u)
            xc = stash.get("xc", u * sg_u)
    else:
        xc = xb
    if "alpha" in stash:
        alpha, beta, sr, si, s = (
            stash["alpha"], stash["beta"], stash["sr"], stash["si"],
            stash["s"],
        )
    else:
        alpha, beta, sr, si, s = _gate_math(
            xc, p["wg"], p["bg"], p["lam"], mm_bf16
        )
    h = stash["h"] if "h" in stash else _scan_body(beta * xc, alpha)
    sz = fastmath.sigmoid(z)
    gate = z * sz
    yin = (gate * h).reshape(bt * t, c)
    y = _mm(yin, p["w_out"]).reshape(bt, t, d)
    yd = y * m1 if m1 is not None else y
    r1, vhat1, inv1 = _ln_fwd(yd + x, p["ln1_s"], p["ln1_b"])

    if use_ffn:
        r1f = r1.reshape(bt * t, d)
        f1 = (_mm(r1f, p["w1"]) + p["b1"]).reshape(bt, t, -1)
        sf1 = stash["sf1"] if "sf1" in stash else fastmath.sigmoid(f1)
        a1 = f1 * sf1
        a1d = a1 * m2 if m2 is not None else a1
        f2 = (_mm(a1d.reshape(bt * t, -1), p["w2"]) + p["b2"]).reshape(bt, t, d)
        f2d = f2 * m3 if m3 is not None else f2
        _, vhat2, inv2 = _ln_fwd(f2d + r1, p["ln2_s"], p["ln2_b"])

    # --- backward ------------------------------------------------------
    grads = {}
    if use_ffn:
        dv2, grads["ln2_s"], grads["ln2_b"] = _ln_bwd(
            dout, vhat2, inv2, p["ln2_s"]
        )
        df2 = dv2 * m3 if m3 is not None else dv2
        dr1 = dv2  # residual branch
        df2_2 = df2.reshape(bt * t, d)
        grads["w2"] = _mmT(a1d.reshape(bt * t, -1), df2_2)
        grads["b2"] = jnp.sum(df2_2, axis=0)
        da1d = _mm(df2_2, p["w2"].T).reshape(bt, t, -1)
        da1 = da1d * m2 if m2 is not None else da1d
        # silu'
        df1 = da1 * sf1 * (1.0 + f1 * (1.0 - sf1))
        df1_2 = df1.reshape(bt * t, -1)
        grads["w1"] = _mmT(r1.reshape(bt * t, d), df1_2)
        grads["b1"] = jnp.sum(df1_2, axis=0)
        dr1 = dr1 + _mm(df1_2, p["w1"].T).reshape(bt, t, d)
    else:
        dr1 = dout

    dv1, grads["ln1_s"], grads["ln1_b"] = _ln_bwd(dr1, vhat1, inv1, p["ln1_s"])
    dx = dv1  # residual into x
    dy = dv1 * m1 if m1 is not None else dv1

    dy2 = dy.reshape(bt * t, d)
    grads["w_out"] = _mmT(yin, dy2)
    dyin = _mm(dy2, p["w_out"].T).reshape(bt, t, c)
    dgate = dyin * h
    dh = dyin * gate
    dz = dgate * sz * (1.0 + z * (1.0 - sz))

    # BD-LRU backward (math of fused_bdlru._bwd_kernel)
    a_shift = _shift_left(alpha, 1, fill=1.0)
    d_states = _scan_body(dh, a_shift, reverse=True)
    h_prev = _shift_right(h, 1)
    d_a_scan = h_prev * d_states
    d_beta = d_states * xc
    dxc = d_states * beta
    d_i = d_beta * s * si * (1.0 - si)
    d_a = d_a_scan - d_beta * si * alpha / s
    spl = jax.nn.softplus(p["lam"])
    d_r = -d_a * alpha * spl * sr * (1.0 - sr)
    grads["lam"] = jnp.sum(-d_a * alpha * sr * fastmath.sigmoid(p["lam"]), axis=(0, 1))
    dg = jnp.concatenate([d_r, d_i], axis=-1).reshape(bt * t, 2 * c)
    xc2 = xc.reshape(bt * t, c)
    dxc = dxc + _mm(dg, p["wg"].T).reshape(bt, t, c)
    grads["wg"] = _mmT(xc2, dg)
    grads["bg"] = jnp.sum(dg, axis=0)

    if use_conv:
        kk = p["wc"].shape[0]
        if "dsilu_u" in stash:
            du = dxc * stash["dsilu_u"]
        else:
            du = dxc * sg_u * (1.0 + u * (1.0 - sg_u))
        dxb = du * p["wc"][kk - 1]
        for j in range(1, kk):
            dxb = dxb + _shift_left(du, j) * p["wc"][kk - 1 - j]
        dwc_rows = []
        for kidx in range(kk):
            xs = _shift_right(xb, kk - 1 - kidx)
            dwc_rows.append(jnp.sum(xs * du, axis=(0, 1)))
        grads["wc"] = jnp.stack(dwc_rows, axis=0)
        grads["bc"] = jnp.sum(du, axis=(0, 1))
    else:
        dxb = dxc
        grads["wc"] = jnp.zeros_like(p["wc"])
        grads["bc"] = jnp.zeros_like(p["bc"])

    dxz = jnp.concatenate([dxb, dz], axis=-1).reshape(bt * t, 2 * c)
    grads["w_in"] = _mmT(x2, dxz)
    dx = dx + _mm(dxz, p["w_in"].T).reshape(bt, t, d)

    if prologue:
        dv0, grads["pl_s"], grads["pl_b"] = _ln_bwd(dx, vhat0, inv0, p["pl_s"])
        dx = dv0 * m0 if m0 is not None else dv0
    return dx, grads


def _bwd_kernel(
    seed_ref, x_ref, dout_ref, *refs, use_conv, use_ffn, keep_prob, mm_bf16,
    prologue=False, stash=False
):
    n_stash = len(_stash_names(use_conv, use_ffn)) if stash else 0
    stash_refs = refs[:n_stash]
    refs = refs[n_stash:]
    n_params = (15 if use_ffn else 9) + (2 if prologue else 0)
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    grad_refs = refs[n_params + 1 :]
    first = pl.program_id(0) == 0

    x = x_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    p = _params_from_refs(param_refs, use_ffn, prologue)
    bt, t, d = x.shape
    dff = p["w1"].shape[1] if use_ffn else 0
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    masks = _draw_masks(bt, t, d, dff, keep_prob, use_ffn, prologue)
    stash_vals = (
        {n: r[:] for n, r in zip(_stash_names(use_conv, use_ffn), stash_refs)}
        if stash
        else None
    )
    dx, grads = _bwd_core(
        x, dout, p, masks, use_conv=use_conv, use_ffn=use_ffn,
        mm_bf16=mm_bf16, prologue=prologue, stash=stash_vals,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)

    names = _param_names(use_ffn, prologue)

    @pl.when(first)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    for name, ref in zip(names, grad_refs):
        ref[:] += grads[name]


def _bwd_kernel_multi(
    seed_ref, x_ref, dout_ref, *refs, use_conv, use_ffn, keep_prob, mm_bf16,
    prologue=False, chains=2
):
    """Multi-chain backward: one program covers ``chains`` forward
    blocks (chains*bt rows) and runs that many fully independent copies
    of ``_bwd_core``.  Independence lets the Mosaic scheduler overlap
    one chain's VPU work with another's MXU matmuls
    (benchmarks/unit_overlap.py: 0.92 overlap fraction on independent
    chains).  Each chain seeds the PRNG with the seed of the forward
    8-row block it replays (chains*pid + i) and draws its masks
    upfront, so masks stay bit-identical to the single-chain
    forward's."""
    n_params = (15 if use_ffn else 9) + (2 if prologue else 0)
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    grad_refs = refs[n_params + 1 :]
    first = pl.program_id(0) == 0

    x = x_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    p = _params_from_refs(param_refs, use_ffn, prologue)
    btn, t, d = x.shape
    bt = btn // chains
    dff = p["w1"].shape[1] if use_ffn else 0
    parts = []
    for hix in range(chains):
        if keep_prob < 1.0:
            pltpu.prng_seed(seed_ref[0] + chains * pl.program_id(0) + hix)
        masks = _draw_masks(bt, t, d, dff, keep_prob, use_ffn, prologue)
        parts.append(
            (x[hix * bt : (hix + 1) * bt], dout[hix * bt : (hix + 1) * bt],
             masks)
        )
    results = [
        _bwd_core(
            xi, di, p, mi, use_conv=use_conv, use_ffn=use_ffn,
            mm_bf16=mm_bf16, prologue=prologue,
        )
        for xi, di, mi in parts
    ]
    dx_ref[:] = jnp.concatenate(
        [r[0] for r in results], axis=0
    ).astype(dx_ref.dtype)

    names = _param_names(use_ffn, prologue)

    @pl.when(first)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    for name, ref in zip(names, grad_refs):
        acc = results[0][1][name]
        for r in results[1:]:
            acc = acc + r[1][name]
        ref[:] += acc


def _interpret(keep_prob=1.0):
    if jax.default_backend() == "tpu":
        return False
    if keep_prob < 1.0:
        # the TPU-semantics interpreter handles pltpu.prng_* on CPU (the
        # plain HLO interpreter does not) but is much slower; note it
        # stubs random bits to zeros, so dropout randomness is only real
        # on hardware
        return pltpu.InterpretParams()
    return True


def _full_spec(shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


_PARAM_NAMES = [
    "w_in", "wc", "bc", "wg", "bg", "lam", "w_out", "ln1_s", "ln1_b",
    "w1", "b1", "w2", "b2", "ln2_s", "ln2_b",
]


# v5e VMEM is 128 MiB; Mosaic's default scoped limit is far lower and
# was what forced 4-row backward blocks.  Ask for most of the chip.
_VMEM_LIMIT = 100 * 1024 * 1024


def _stash_widths(params, use_conv, use_ffn):
    c = params["w_in"].shape[1] // 2
    dff = params["w1"].shape[1] if use_ffn else 0
    return [dff if n == "sf1" else c for n in _stash_names(use_conv, use_ffn)]


@functools.partial(
    jax.jit,
    static_argnames=("use_conv", "use_ffn", "dropout_p", "mm_bf16", "block_rows",
                     "prologue", "stash"),
)
def _layer_fwd(x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16=False,
               block_rows=0, prologue=False, stash=False):
    b, t, d = x.shape
    bt = block_rows or _block_rows(t, _FWD_BUDGET)
    xp = _pad_to(x, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    names = _param_names(use_ffn, prologue)
    plist = [params[n] for n in names]
    if stash:
        widths = _stash_widths(params, use_conv, use_ffn)
        stash_shapes = [
            jax.ShapeDtypeStruct((bp, t, w), jnp.float32) for w in widths
        ]
        stash_specs = [
            pl.BlockSpec((bt, t, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for w in widths
        ]
        out_shape = (jax.ShapeDtypeStruct((bp, t, d), x.dtype), *stash_shapes)
        out_specs = (block, *stash_specs)
    else:
        out_shape = jax.ShapeDtypeStruct((bp, t, d), x.dtype)
        out_specs = block
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            use_conv=use_conv, use_ffn=use_ffn, keep_prob=1.0 - dropout_p,
            mm_bf16=mm_bf16, prologue=prologue, stash=stash,
        ),
        out_shape=out_shape,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=out_specs,
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, *plist)
    if stash:
        return out[0][:b], tuple(o[:b] for o in out[1:])
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("use_conv", "use_ffn", "dropout_p", "mm_bf16", "block_rows",
                     "prologue", "dual", "chains"),
)
def _layer_bwd(x, dout, seed, params, use_conv, use_ffn, dropout_p, mm_bf16=False,
               block_rows=0, prologue=False, dual=False, chains=0,
               stash_vals=None):
    b, t, d = x.shape
    bt = block_rows or _block_rows(t, _BWD_BUDGET, _BWD_CAP)
    nch = chains or (2 if dual else 1)
    if stash_vals is not None:
        nch = 1  # stash layout is per-forward-block; single chain
    rows = nch * bt
    xp = _pad_to(x, 0, rows, 0.0)
    dp = _pad_to(dout, 0, rows, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((rows, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    names = _param_names(use_ffn, prologue)
    plist = [params[n] for n in names]
    stash_in = []
    stash_specs = []
    if stash_vals is not None:
        for sv in stash_vals:
            w = sv.shape[-1]
            # pad value 1.0: padded rows carry dout == 0 so their grads
            # vanish, but a zero-padded stash "s" would hit the
            # d_beta*si*alpha/s division as 0 * inf = NaN
            stash_in.append(_pad_to(sv, 0, rows, 1.0))
            stash_specs.append(
                pl.BlockSpec((rows, t, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel_multi, chains=nch,
            use_conv=use_conv, use_ffn=use_ffn, keep_prob=1.0 - dropout_p,
            mm_bf16=mm_bf16, prologue=prologue,
        ) if nch > 1 else functools.partial(
            _bwd_kernel,
            use_conv=use_conv, use_ffn=use_ffn, keep_prob=1.0 - dropout_p,
            mm_bf16=mm_bf16, prologue=prologue, stash=stash_vals is not None,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist],
        ),
        grid=(bp // rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            block,
            *stash_specs,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=(
            block,
            *[_full_spec(p.shape) for p in plist],
        ),
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, dp, *stash_in, *plist)
    dx = outs[0][:b]
    dparams = {n: g for n, g in zip(names, outs[1:])}
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_recurrent_layer(x, seed, params, use_conv, use_ffn, dropout_p,
                          mm_bf16=False, prologue=False):
    """Complete RecurrentLayer as one Pallas kernel.

    x: [B, T, D] block input; seed: int32[1] per-step dropout seed;
    params: dict with w_in [D,2C], wc [K,C], bc [C], wg [C,2C], bg [2C],
    lam [C], w_out [C,D], ln1_s/ln1_b [D], and (if use_ffn) w1 [D,4D],
    b1 [4D], w2 [4D,D], b2 [D], ln2_s/ln2_b [D].  All params fp32.
    Static flags: use_conv, use_ffn, dropout_p (0.0 disables PRNG),
    mm_bf16 (bf16 matmul operands / fp32 accumulate; scan+LN stay fp32),
    prologue (fold the model's embedding dropout+LN prologue, reference
    RecBLR.py:76-78, into this kernel — params then also carry
    pl_s/pl_b [D] and x is the raw embedding block).
    """
    return _layer_fwd(x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
                      prologue=prologue)


# Per-kernel-call cap on HBM held between forward and backward by a
# stash.  Flagship shapes: RecBLR h-stash [2048, 200, 128] f32 =
# 210 MB; SASRec/BERT4Rec pr+ctx = ~760 MB at 2 heads.  A config with
# more heads/layers or a bigger batch near T=256 could otherwise pile
# stashes past HBM (each layer's stash lives from its fwd to its bwd,
# so ~n_layers calls coexist) — above the cap the recompute backward
# is used instead.
_STASH_BUDGET_BYTES = 1024**3


def _stash_policy(t: int, stash_bytes: int | None = None) -> bool:
    """Stash forward intermediates for the backward iff the sequence is
    short enough that the stash HBM footprint stays modest (~10 MB per
    8-row block at T=200; scales linearly in T) AND the caller's
    estimated stash footprint fits the per-call byte budget.  Beyond
    T=256 the recompute backward is kept — the chunked kernel owns
    T>=512 anyway."""
    if t > 256:
        return False
    return stash_bytes is None or stash_bytes <= _STASH_BUDGET_BYTES


def _vjp_fwd(x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16, prologue):
    b, t = x.shape[0], x.shape[1]
    c = params["w_out"].shape[0]
    if _stash_policy(t, len(_STASH_SET) * b * t * c * 4):
        out, stash = _layer_fwd(
            x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
            prologue=prologue, stash=True,
        )
        return out, (x, seed, params, stash)
    out = _layer_fwd(x, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
                     prologue=prologue)
    return out, (x, seed, params, None)


def _vjp_bwd(use_conv, use_ffn, dropout_p, mm_bf16, prologue, res, dout):
    x, seed, params, stash = res
    dx, dparams = _layer_bwd(
        x, dout, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
        prologue=prologue, stash_vals=stash,
    )
    return dx, None, dparams


fused_recurrent_layer.defvjp(_vjp_fwd, _vjp_bwd)


def supports(d: int, c: int) -> bool:
    return d <= 128 and c <= 128


# ---------------------------------------------------------------------------
# Last-position variant: the TOP layer's output is consumed only at each
# row's last position (the model ends with gather_last -> CE/BPR scoring,
# reference RecBLR.py:83,86-122), so everything after the scan
# (W_out, LN1, FFN, LN2, their dropouts) is dead code at the other T-1
# positions.  The scan itself still runs over full T (h_last depends on
# the whole prefix), and the backward's reverse scan spreads the single
# last-position cotangent back across all T for the gate/conv/W_in
# grads.  At B=2048, T=200 this removes ~3 ms/step vs running the full
# kernel on the top layer and gathering afterwards.
# ---------------------------------------------------------------------------


def _last_block_rows(t: int) -> int:
    """Block height for BOTH last-variant directions.  The in-kernel
    dropout seed is seed + program_id, so the backward replays
    bit-identical masks only if fwd and bwd share the block-to-row
    mapping — a single source of truth keeps them from drifting.
    16 rows measured fastest for the bwd at T=200 (32 regresses; a
    32-row fwd would be ~0.2 ms faster but breaks replay).  Floor of 8:
    Mosaic needs 8-sublane-aligned blocks for the [bt, 1] lens input
    (long-context T=1024 would otherwise pick 2-row blocks)."""
    return max(8, _block_rows(t, 16 * 200, cap=16))


def _last_mask(lens, bt, t):
    """f32 [bt, t, 1] one-hot of each row's last valid position."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, t), 1)
    return (pos == lens - 1).astype(jnp.float32)[:, :, None]


def _select_last(m, v):
    """m: [bt,T,1] one-hot; v: [bt,T,C] -> [bt,1,C]."""
    return jnp.sum(m * v, axis=1, keepdims=True)


def _layer_last_fwd_core(x, lens, p, *, use_conv, use_ffn, keep_prob,
                         seeded, mm_bf16=False, want_h=False):
    """Forward returning only the last-position output [bt, 1, D].

    The z branch is consumed only at each row's last position, so only
    the xb half of the in_proj matmul runs over full T; z is projected
    from the selected last-position rows alone (halves the largest
    matmul in this kernel)."""
    _mm = _make_mm(mm_bf16)
    bt, t, d = x.shape
    x2 = x.reshape(bt * t, d)
    c = p["w_in"].shape[1] // 2
    xb = _mm(x2, p["w_in"][:, :c]).reshape(bt, t, c)
    if use_conv:
        u = _conv_fwd(xb, p["wc"], p["bc"])
        xc = _silu(u)
    else:
        xc = xb
    alpha, beta, sr, si, s = _gate_math(xc, p["wg"], p["bg"], p["lam"], mm_bf16)
    h = _scan_body(beta * xc, alpha)

    m = _last_mask(lens, bt, t)
    xl = _select_last(m, x)          # [bt,1,D]
    zl = _mm(xl.reshape(bt, d), p["w_in"][:, c:]).reshape(bt, 1, c)
    hl = _select_last(m, h)          # [bt,1,C]
    szl = fastmath.sigmoid(zl)
    yinl = (zl * szl) * hl
    yl = _mm(yinl.reshape(bt, c), p["w_out"]).reshape(bt, 1, d)
    if seeded and keep_prob < 1.0:
        yl = yl * _dropout_mask(yl.shape, keep_prob)
    r1, vhat1, inv1 = _ln_fwd(yl + xl, p["ln1_s"], p["ln1_b"])
    if not use_ffn:
        return (r1, h) if want_h else r1
    f1 = (_mm(r1.reshape(bt, d), p["w1"]) + p["b1"]).reshape(bt, 1, -1)
    sf1 = fastmath.sigmoid(f1)
    a1 = f1 * sf1
    if seeded and keep_prob < 1.0:
        a1 = a1 * _dropout_mask(a1.shape, keep_prob)
    f2 = (_mm(a1.reshape(bt, -1), p["w2"]) + p["b2"]).reshape(bt, 1, d)
    if seeded and keep_prob < 1.0:
        f2 = f2 * _dropout_mask(f2.shape, keep_prob)
    out, _, _ = _ln_fwd(f2 + r1, p["ln2_s"], p["ln2_b"])
    return (out, h) if want_h else out


def _last_fwd_kernel(seed_ref, x_ref, lens_ref, *refs, use_conv, use_ffn,
                     keep_prob, mm_bf16, stash=False):
    n_params = 15 if use_ffn else 9
    param_refs = refs[:n_params]
    out_ref = refs[n_params]
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    p = _params_from_refs(param_refs, use_ffn)
    out, h = _layer_last_fwd_core(
        x, lens_ref[:], p, use_conv=use_conv, use_ffn=use_ffn,
        keep_prob=keep_prob, seeded=True, mm_bf16=mm_bf16, want_h=True,
    )
    out_ref[:] = out[:, 0, :].astype(out_ref.dtype)
    if stash:
        refs[n_params + 1][:] = h


def _last_bwd_kernel(
    seed_ref, x_ref, lens_ref, dout_ref, *refs, use_conv, use_ffn,
    keep_prob, mm_bf16, stash=False
):
    h_ref = refs[0] if stash else None
    refs = refs[1:] if stash else refs
    n_params = 15 if use_ffn else 9
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    grad_refs = refs[n_params + 1 :]
    first = pl.program_id(0) == 0
    _mm = _make_mm(mm_bf16)

    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)[:, None, :]  # [bt,1,D]
    p = _params_from_refs(param_refs, use_ffn)
    bt, t, d = x.shape

    # --- recompute forward (identical PRNG call order; z projected at
    # the last position only, mirroring _layer_last_fwd_core) -----------
    x2 = x.reshape(bt * t, d)
    c = p["w_in"].shape[1] // 2
    xb = _mm(x2, p["w_in"][:, :c]).reshape(bt, t, c)
    if use_conv:
        u = _conv_fwd(xb, p["wc"], p["bc"])
        sg_u = fastmath.sigmoid(u)
        xc = u * sg_u
    else:
        xc = xb
    alpha, beta, sr, si, s = _gate_math(xc, p["wg"], p["bg"], p["lam"], mm_bf16)
    # the forward scan is the longest serial chain of this backward;
    # the stashing forward saves h to HBM so it is skipped here
    h = h_ref[:] if stash else _scan_body(beta * xc, alpha)

    m = _last_mask(lens_ref[:], bt, t)
    xl = _select_last(m, x)
    zl = _mm(xl.reshape(bt, d), p["w_in"][:, c:]).reshape(bt, 1, c)
    hl = _select_last(m, h)
    szl = fastmath.sigmoid(zl)
    gatel = zl * szl
    yinl = gatel * hl
    yl = _mm(yinl.reshape(bt, c), p["w_out"]).reshape(bt, 1, d)
    if keep_prob < 1.0:
        m1 = _dropout_mask(yl.shape, keep_prob)
        yld = yl * m1
    else:
        m1 = None
        yld = yl
    r1, vhat1, inv1 = _ln_fwd(yld + xl, p["ln1_s"], p["ln1_b"])
    if use_ffn:
        f1 = (_mm(r1.reshape(bt, d), p["w1"]) + p["b1"]).reshape(bt, 1, -1)
        sf1 = fastmath.sigmoid(f1)
        a1 = f1 * sf1
        if keep_prob < 1.0:
            m2 = _dropout_mask(a1.shape, keep_prob)
            a1d = a1 * m2
        else:
            m2 = None
            a1d = a1
        f2 = (_mm(a1d.reshape(bt, -1), p["w2"]) + p["b2"]).reshape(bt, 1, d)
        if keep_prob < 1.0:
            m3 = _dropout_mask(f2.shape, keep_prob)
            f2d = f2 * m3
        else:
            m3 = None
            f2d = f2
        _, vhat2, inv2 = _ln_fwd(f2d + r1, p["ln2_s"], p["ln2_b"])

    # --- backward (all last-position tensors are [bt,1,*]) --------------
    grads = {}
    if use_ffn:
        dv2, grads["ln2_s"], grads["ln2_b"] = _ln_bwd(
            dout, vhat2, inv2, p["ln2_s"]
        )
        df2 = dv2 * m3 if m3 is not None else dv2
        dr1 = dv2
        df2_2 = df2.reshape(bt, d)
        grads["w2"] = _mmT(a1d.reshape(bt, -1), df2_2)
        grads["b2"] = jnp.sum(df2_2, axis=0)
        da1 = _mm(df2_2, p["w2"].T).reshape(bt, 1, -1)
        if m2 is not None:
            da1 = da1 * m2
        df1 = da1 * sf1 * (1.0 + f1 * (1.0 - sf1))
        df1_2 = df1.reshape(bt, -1)
        grads["w1"] = _mmT(r1.reshape(bt, d), df1_2)
        grads["b1"] = jnp.sum(df1_2, axis=0)
        dr1 = dr1 + _mm(df1_2, p["w1"].T).reshape(bt, 1, d)
    else:
        dr1 = dout

    dv1, grads["ln1_s"], grads["ln1_b"] = _ln_bwd(dr1, vhat1, inv1, p["ln1_s"])
    dxl = dv1  # residual into x at the last position
    dyl = dv1 * m1 if m1 is not None else dv1
    dyl2 = dyl.reshape(bt, d)
    grads["w_out"] = _mmT(yinl.reshape(bt, c), dyl2)
    dyinl = _mm(dyl2, p["w_out"].T).reshape(bt, 1, c)
    dgatel = dyinl * hl
    dhl = dyinl * gatel
    dzl = dgatel * szl * (1.0 + zl * (1.0 - szl))

    # scatter the single-position cotangent back over T
    dh = m * dhl  # [bt,T,C]
    a_shift = _shift_left(alpha, 1, fill=1.0)
    d_states = _scan_body(dh, a_shift, reverse=True)
    h_prev = _shift_right(h, 1)
    d_a_scan = h_prev * d_states
    d_beta = d_states * xc
    dxc = d_states * beta
    d_i = d_beta * s * si * (1.0 - si)
    d_a = d_a_scan - d_beta * si * alpha / s
    spl = jax.nn.softplus(p["lam"])
    d_r = -d_a * alpha * spl * sr * (1.0 - sr)
    grads["lam"] = jnp.sum(
        -d_a * alpha * sr * fastmath.sigmoid(p["lam"]), axis=(0, 1)
    )
    dg = jnp.concatenate([d_r, d_i], axis=-1).reshape(bt * t, 2 * c)
    xc2 = xc.reshape(bt * t, c)
    dxc = dxc + _mm(dg, p["wg"].T).reshape(bt, t, c)
    grads["wg"] = _mmT(xc2, dg)
    grads["bg"] = jnp.sum(dg, axis=0)

    if use_conv:
        kk = p["wc"].shape[0]
        du = dxc * sg_u * (1.0 + u * (1.0 - sg_u))
        dxb = du * p["wc"][kk - 1]
        for j in range(1, kk):
            dxb = dxb + _shift_left(du, j) * p["wc"][kk - 1 - j]
        dwc_rows = []
        for kidx in range(kk):
            xs = _shift_right(xb, kk - 1 - kidx)
            dwc_rows.append(jnp.sum(xs * du, axis=(0, 1)))
        grads["wc"] = jnp.stack(dwc_rows, axis=0)
        grads["bc"] = jnp.sum(du, axis=(0, 1))
    else:
        dxb = dxc
        grads["wc"] = jnp.zeros_like(p["wc"])
        grads["bc"] = jnp.zeros_like(p["bc"])

    # dz lives only at the last position: contract the z-half of w_in
    # against the [bt, C] last-position cotangent instead of a
    # [bt*T, C] zero-padded tensor (halves the w_in grad + dx matmuls)
    dxb2 = dxb.reshape(bt * t, c)
    dzl2 = dzl.reshape(bt, c)
    grads["w_in"] = jnp.concatenate(
        [_mmT(x2, dxb2), _mmT(xl.reshape(bt, d), dzl2)], axis=-1
    )
    dxl_z = _mm(dzl2, p["w_in"][:, c:].T).reshape(bt, 1, d)
    dx = (
        _mm(dxb2, p["w_in"][:, :c].T).reshape(bt, t, d)
        + m * (dxl + dxl_z)
    )

    dx_ref[:] = dx.astype(dx_ref.dtype)

    names = ["w_in", "wc", "bc", "wg", "bg", "lam", "w_out", "ln1_s", "ln1_b"]
    if use_ffn:
        names += ["w1", "b1", "w2", "b2", "ln2_s", "ln2_b"]

    @pl.when(first)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    for name, ref in zip(names, grad_refs):
        ref[:] += grads[name]


@functools.partial(
    jax.jit,
    static_argnames=("use_conv", "use_ffn", "dropout_p", "mm_bf16", "block_rows",
                     "stash"),
)
def _layer_last_fwd(x, lens, seed, params, use_conv, use_ffn, dropout_p,
                    mm_bf16=False, block_rows=0, stash=False):
    b, t, d = x.shape
    bt = block_rows or _last_block_rows(t)
    xp = _pad_to(x, 0, bt, 0.0)
    lp = _pad_to(lens.astype(jnp.int32).reshape(-1, 1), 0, bt, 0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lblock = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    names = _PARAM_NAMES if use_ffn else _PARAM_NAMES[:9]
    plist = [params[n] for n in names]
    c = params["w_in"].shape[1] // 2
    oblock = pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hblock = pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bp, d), x.dtype)
    out_specs = oblock
    if stash:
        out_shape = (out_shape, jax.ShapeDtypeStruct((bp, t, c), jnp.float32))
        out_specs = (oblock, hblock)
    out = pl.pallas_call(
        functools.partial(
            _last_fwd_kernel,
            use_conv=use_conv, use_ffn=use_ffn, keep_prob=1.0 - dropout_p,
            mm_bf16=mm_bf16, stash=stash,
        ),
        out_shape=out_shape,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            lblock,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=out_specs,
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, *plist)
    if stash:
        return out[0][:b], (out[1][:b],)
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("use_conv", "use_ffn", "dropout_p", "mm_bf16", "block_rows"),
)
def _layer_last_bwd(x, lens, dout, seed, params, use_conv, use_ffn, dropout_p,
                    mm_bf16=False, block_rows=0, stash_vals=None):
    b, t, d = x.shape
    bt = block_rows or _last_block_rows(t)
    xp = _pad_to(x, 0, bt, 0.0)
    lp = _pad_to(lens.astype(jnp.int32).reshape(-1, 1), 0, bt, 0)
    dp = _pad_to(dout, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lblock = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dblock = pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    names = _PARAM_NAMES if use_ffn else _PARAM_NAMES[:9]
    plist = [params[n] for n in names]
    stash_in = []
    stash_specs = []
    if stash_vals is not None:
        c = params["w_in"].shape[1] // 2
        # pad value 1.0, SAME convention as _layer_bwd: padded rows
        # carry dout == 0 so their grads vanish either way, but if
        # _STASH_SET ever grows to include "s" a zero pad would hit
        # the d_beta*si*alpha/s division as 0 * inf = NaN — keep both
        # wrappers on the safe value
        stash_in.append(_pad_to(stash_vals[0], 0, bt, 1.0))
        stash_specs.append(
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        functools.partial(
            _last_bwd_kernel,
            use_conv=use_conv, use_ffn=use_ffn, keep_prob=1.0 - dropout_p,
            mm_bf16=mm_bf16, stash=stash_vals is not None,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist],
        ),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            lblock,
            dblock,
            *stash_specs,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=(
            block,
            *[_full_spec(p.shape) for p in plist],
        ),
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, dp, *stash_in, *plist)
    dx = outs[0][:b]
    dparams = {n: g for n, g in zip(names, outs[1:])}
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_recurrent_layer_last(x, lens, seed, params, use_conv, use_ffn,
                               dropout_p, mm_bf16=False):
    """Top-layer RecurrentLayer fused kernel returning only each row's
    last-position output [B, D] (x: [B, T, D]; lens: int[B] 1-based
    valid lengths).  The BD-LRU scan runs over full T; W_out/LN/FFN and
    their dropouts run at the last position only — they are dead code
    elsewhere because the model's head consumes gather_last(out) alone
    (reference RecBLR.py:83,86-122).  Grads w.r.t. lens are not defined
    (integer input)."""
    return _layer_last_fwd(x, lens, seed, params, use_conv, use_ffn,
                           dropout_p, mm_bf16)


def _last_vjp_fwd(x, lens, seed, params, use_conv, use_ffn, dropout_p, mm_bf16):
    b, t = x.shape[0], x.shape[1]
    c = params["w_out"].shape[0]
    if _stash_policy(t, len(_STASH_SET) * b * t * c * 4):
        out, stash = _layer_last_fwd(
            x, lens, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
            stash=True,
        )
        return out, (x, lens, seed, params, stash)
    out = _layer_last_fwd(x, lens, seed, params, use_conv, use_ffn,
                          dropout_p, mm_bf16)
    return out, (x, lens, seed, params, None)


def _last_vjp_bwd(use_conv, use_ffn, dropout_p, mm_bf16, res, dout):
    x, lens, seed, params, stash = res
    dx, dparams = _layer_last_bwd(
        x, lens, dout, seed, params, use_conv, use_ffn, dropout_p, mm_bf16,
        stash_vals=stash,
    )
    return dx, None, None, dparams


fused_recurrent_layer_last.defvjp(_last_vjp_fwd, _last_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused dropout -> LayerNorm (the embedding prologue, reference
# RecBLR.py:76-78: emb_dropout then LayerNorm before the first layer).
# XLA's composition materializes the rng bits, the keep mask, and f32
# stats in HBM (~2.5 ms/step at B=2048, T=200 on v5e); this kernel does
# the whole thing in VMEM with the in-kernel PRNG, and the backward
# replays the mask instead of storing it.
# ---------------------------------------------------------------------------


def _dropout_ln_fwd_kernel(seed_ref, x_ref, s_ref, b_ref, o_ref, *, keep_prob):
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    if keep_prob < 1.0:
        x = x * _dropout_mask(x.shape, keep_prob)
    out, _, _ = _ln_fwd(x, s_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32))
    o_ref[:] = out.astype(o_ref.dtype)


def _dropout_ln_bwd_kernel(
    seed_ref, x_ref, dout_ref, s_ref, dx_ref, ds_ref, db_ref, *, keep_prob
):
    first = pl.program_id(0) == 0
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    scale = s_ref[:].astype(jnp.float32)
    if keep_prob < 1.0:
        m = _dropout_mask(x.shape, keep_prob)
        xd = x * m
    else:
        m = None
        xd = x
    _, vhat, inv = _ln_fwd(xd, scale, jnp.zeros_like(scale))
    dv, dscale, dbias = _ln_bwd(dout, vhat, inv, scale)
    dx_ref[:] = (dv * m if m is not None else dv).astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    ds_ref[:] += dscale
    db_ref[:] += dbias


@functools.partial(jax.jit, static_argnames=("dropout_p",))
def _dropout_ln_fwd(x, seed, scale, bias, dropout_p):
    b, t, d = x.shape
    bt = _block_rows(t, _FWD_BUDGET)
    xp = _pad_to(x, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dropout_ln_fwd_kernel, keep_prob=1.0 - dropout_p),
        out_shape=jax.ShapeDtypeStruct((bp, t, d), x.dtype),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            _full_spec(scale.shape),
            _full_spec(bias.shape),
        ],
        out_specs=block,
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, scale, bias)
    return out[:b]


@functools.partial(jax.jit, static_argnames=("dropout_p",))
def _dropout_ln_bwd(x, dout, seed, scale, dropout_p):
    b, t, d = x.shape
    bt = _block_rows(t, _FWD_BUDGET)
    xp = _pad_to(x, 0, bt, 0.0)
    dp = _pad_to(dout, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_dropout_ln_bwd_kernel, keep_prob=1.0 - dropout_p),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            jax.ShapeDtypeStruct(scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(scale.shape, jnp.float32),
        ),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            block,
            _full_spec(scale.shape),
        ],
        out_specs=(block, _full_spec(scale.shape), _full_spec(scale.shape)),
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, dp, scale)
    return outs[0][:b], outs[1], outs[2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_dropout_ln(x, seed, scale, bias, dropout_p):
    """LN(dropout(x)) as one Pallas kernel (in-kernel PRNG; the backward
    replays the identical mask).  x: [B, T, D]; seed: int32[1];
    scale/bias: [D] fp32; dropout_p static (0.0 compiles the PRNG out).
    """
    return _dropout_ln_fwd(x, seed, scale, bias, dropout_p)


def _dln_vjp_fwd(x, seed, scale, bias, dropout_p):
    return _dropout_ln_fwd(x, seed, scale, bias, dropout_p), (x, seed, scale)


def _dln_vjp_bwd(dropout_p, res, dout):
    x, seed, scale = res
    dx, dscale, dbias = _dropout_ln_bwd(x, dout, seed, scale, dropout_p)
    return dx, None, dscale, dbias


fused_dropout_ln.defvjp(_dln_vjp_fwd, _dln_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused LayerNorm -> dropout (the attention baselines' embedding
# prologue order — reference sasrec.py:104-105 / bert4rec.py's
# LayerNorm-then-dropout): the reverse composition of fused_dropout_ln.
# ---------------------------------------------------------------------------


def _ln_dropout_fwd_kernel(seed_ref, x_ref, pos_ref, s_ref, b_ref, o_ref, *,
                           keep_prob):
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32) + pos_ref[:].astype(jnp.float32)[None]
    out, _, _ = _ln_fwd(x, s_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32))
    if keep_prob < 1.0:
        out = out * _dropout_mask(out.shape, keep_prob)
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_dropout_bwd_kernel(
    seed_ref, x_ref, pos_ref, dout_ref, s_ref, b_ref, dx_ref, ds_ref, db_ref,
    dp_ref, *, keep_prob
):
    first = pl.program_id(0) == 0
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32) + pos_ref[:].astype(jnp.float32)[None]
    dout = dout_ref[:].astype(jnp.float32)
    scale = s_ref[:].astype(jnp.float32)
    bias = b_ref[:].astype(jnp.float32)
    _, vhat, inv = _ln_fwd(x, scale, bias)
    if keep_prob < 1.0:
        dout = dout * _dropout_mask(x.shape, keep_prob)
    dv, dscale, dbias = _ln_bwd(dout, vhat, inv, scale)
    dx_ref[:] = dv.astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dp_ref[:] = jnp.zeros_like(dp_ref)

    ds_ref[:] += dscale
    db_ref[:] += dbias
    dp_ref[:] += jnp.sum(dv, axis=0)


@functools.partial(jax.jit, static_argnames=("dropout_p",))
def _ln_dropout_fwd(x, pos, seed, scale, bias, dropout_p):
    b, t, d = x.shape
    bt = _block_rows(t, _FWD_BUDGET)
    xp = _pad_to(x, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_dropout_fwd_kernel, keep_prob=1.0 - dropout_p),
        out_shape=jax.ShapeDtypeStruct((bp, t, d), x.dtype),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            _full_spec(pos.shape),
            _full_spec(scale.shape),
            _full_spec(bias.shape),
        ],
        out_specs=block,
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, pos, scale, bias)
    return out[:b]


@functools.partial(jax.jit, static_argnames=("dropout_p",))
def _ln_dropout_bwd(x, pos, dout, seed, scale, bias, dropout_p):
    b, t, d = x.shape
    bt = _block_rows(t, _FWD_BUDGET)
    xp = _pad_to(x, 0, bt, 0.0)
    dp = _pad_to(dout, 0, bt, 0.0)
    bp = xp.shape[0]
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_ln_dropout_bwd_kernel, keep_prob=1.0 - dropout_p),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            jax.ShapeDtypeStruct(scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(pos.shape, jnp.float32),
        ),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            _full_spec(pos.shape),
            block,
            _full_spec(scale.shape),
            _full_spec(scale.shape),
        ],
        out_specs=(
            block, _full_spec(scale.shape), _full_spec(scale.shape),
            _full_spec(pos.shape),
        ),
        interpret=_interpret(1.0 - dropout_p),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, pos, dp, scale, bias)
    return outs[0][:b], outs[1], outs[2], outs[3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ln_dropout(x, pos, seed, scale, bias, dropout_p):
    """dropout(LN(x + pos)) as one Pallas kernel (in-kernel PRNG; the
    backward replays the identical mask).  The attention baselines'
    prologue (reference sasrec.py:102-105): the positional-embedding
    add rides the same VMEM pass instead of a separate [B, T, D] HBM
    round-trip; ``pos`` is [T, D] (its grad is the batch-sum,
    accumulated across the grid)."""
    return _ln_dropout_fwd(x, pos, seed, scale, bias, dropout_p)


def _lnd_vjp_fwd(x, pos, seed, scale, bias, dropout_p):
    return _ln_dropout_fwd(x, pos, seed, scale, bias, dropout_p), (
        x, pos, seed, scale, bias,
    )


def _lnd_vjp_bwd(dropout_p, res, dout):
    x, pos, seed, scale, bias = res
    dx, dscale, dbias, dpos = _ln_dropout_bwd(
        x, pos, dout, seed, scale, bias, dropout_p
    )
    return dx, dpos, None, dscale, dbias


fused_ln_dropout.defvjp(_lnd_vjp_fwd, _lnd_vjp_bwd)
