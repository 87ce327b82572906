"""Whole-layer fused Pallas kernel for one post-LN transformer block.

One kernel per direction covers the complete encoder layer that both
attention baselines delegate to (RecBole ``TransformerLayer`` — used by
the reference via ``sasrec.py:59-68`` / ``bert4rec.py:70-79``):

    q,k,v = x W_q + b_q, ...                (per-head weight slices)
    s_h   = q_h k_h^T / sqrt(dh) + mask     (key-padding [+ causal])
    p_h   = softmax(s_h);  p_h <- dropout   (in-kernel TPU PRNG)
    ctx   = sum_h (p_h v_h) W_o[h] + b_o;   ctx <- dropout
    r1    = LN1(ctx + x)
    f     = dropout(act(r1 W_1 + b_1) W_2 + b_2)
    out   = LN2(f + r1)

The previous composition (separate fused-attention kernel + XLA
epilogues) spent more time on [B,H,T,dh] layout copies/transposes than
inside the kernel (profiled ~12 ms/step of pure `copy`/`convert` at
B=2048, T=200 on v5e).  Here heads are formed by slicing the *weights*
(tiny [D,D] arrays) instead of transposing activations, so HBM traffic
per layer collapses to one read of x and one write of out (plus
dout/dx in the backward).  Forward saves only x; the backward
recomputes all activations in VMEM (regenerating bit-identical dropout
masks by replaying the same PRNG draw order) and emits dx plus every
weight gradient with in-kernel MXU matmuls accumulated across the
batch grid.

Constraints: hidden D <= 128, inner FFN size <= 2048, act in
{gelu, relu, silu, tanh, sigmoid}; larger shapes fall back to the
unfused composition in ``models/layers.py``.  GELU is the tanh
approximation (matching ``jax.nn.gelu`` used on the XLA path; the
reference's erf GELU differs by <1e-3 — documented deviation).
"""

from __future__ import annotations

import functools
import math

from datamining_recblr_tpu.ops import fastmath

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datamining_recblr_tpu.ops.fused_layer import (
    _dropout_mask,
    _last_mask,
    _full_spec,
    _interpret,
    _ln_bwd,
    _ln_fwd,
    _make_mm,
    _mmT,
    _VMEM_LIMIT,
)
from datamining_recblr_tpu.ops.pallas_scan import _pad_to

MASK_VALUE = -10000.0  # RecBole additive mask value (sasrec.py:107)

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _act_pair(name):
    """Returns (f(x), df(x)) elementwise activation + derivative, both
    taking the pre-activation.  GELU is the tanh approximation
    (jax.nn.gelu default); sigmoid-family activations use the
    fastmath tanh form (~1 ulp from jax.nn.sigmoid, measurably cheaper
    on the VPU)."""
    if name == "relu":
        return (
            lambda x: jnp.maximum(x, 0.0),
            lambda x: (x > 0.0).astype(x.dtype),
        )
    if name in ("silu", "swish"):
        def f(x):
            return x * fastmath.sigmoid(x)

        def df(x):
            s = fastmath.sigmoid(x)
            return s * (1.0 + x * (1.0 - s))

        return f, df
    if name == "tanh":
        return jnp.tanh, lambda x: 1.0 - jnp.square(jnp.tanh(x))
    if name == "sigmoid":
        def df(x):
            s = fastmath.sigmoid(x)
            return s * (1.0 - s)

        return fastmath.sigmoid, df
    if name == "gelu":
        def f(x):
            g = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
            return 0.5 * x * (1.0 + jnp.tanh(g))

        def df(x):
            g = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
            th = jnp.tanh(g)
            dg = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
            return 0.5 * (1.0 + th) + 0.5 * x * (1.0 - th * th) * dg

        return f, df
    raise ValueError(f"unsupported activation for fused block: {name}")


SUPPORTED_ACTS = ("gelu", "relu", "silu", "swish", "tanh", "sigmoid")


def supports(d: int, n_heads: int, inner: int, t: int, act: str) -> bool:
    return (
        d <= 128
        and d % n_heads == 0
        and inner <= 2048
        and t <= 1024
        and act in SUPPORTED_ACTS
    )


_PARAM_NAMES = [
    "w_q", "b_q", "w_k", "b_k", "w_v", "b_v", "w_o", "b_o",
    "ln1_s", "ln1_b", "w1", "b1", "w2", "b2", "ln2_s", "ln2_b",
]

# The [rows, T, T] score/probability arrays dominate kernel VMEM, so
# block height scales as rows*T^2 (unlike fused_layer's rows*T): 16
# rows at T=200 measured fastest (bwd 6.08 -> 5.89 ms/step on v5e);
# 32 rows OOMs the 100 MiB scoped limit.
_SCORE_BUDGET = 16 * 200 * 200


def _attn_block_rows(t: int) -> int:
    return max(1, min(16, _SCORE_BUDGET // (t * t)))


def _params_from_refs(refs):
    return {n: r[:].astype(jnp.float32) for n, r in zip(_PARAM_NAMES, refs)}


def _pad_mask_rows(lens, t):
    """[B, 1, T] additive key-padding mask rows (0 keep / -10000 drop),
    precomputed host-of-kernel so the kernel's lens input has a
    Mosaic-tileable [bt, 1, T] block for any block height."""
    col = jnp.arange(t, dtype=jnp.int32)[None, :]
    return jnp.where(col < lens[:, None], 0.0, MASK_VALUE).astype(
        jnp.float32
    )[:, None, :]


def _additive_mask(padrow, t, causal):
    """[BT, T, T] additive mask from [BT, 1, T] padding rows + optional
    in-kernel causal iota (0 keep / -10000 drop, parity with the
    reference sasrec.py:107 / bert4rec.py:132: minimum keeps the value
    at exactly -10000 where both masks drop)."""
    bt = padrow.shape[0]
    amask = jnp.broadcast_to(padrow, (bt, t, t))
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (bt, t, t), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (bt, t, t), 2)
        amask = jnp.minimum(
            amask, jnp.where(col <= row, 0.0, MASK_VALUE)
        )
    return amask


def _bmm(a, b, dims, mm_bf16=False):
    """Batched matmul over leading dim with fp32 accumulation; with
    ``mm_bf16`` the operands are cast to bf16 first (same production
    matmul policy as fused_layer — softmax/LN math stays fp32)."""
    if mm_bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _block_fwd_core(x, padrow, p, *, causal, n_heads, kp_h, kp_a, act,
                    mm_bf16, seeded, stash=None):
    """Shared forward math on an f32 [BT, T, D] block.  Returns the
    intermediates the backward needs (recomputed there).  PRNG draw
    order (must match the backward recompute exactly): per-head attn
    masks, then the post-attention hidden mask, then the post-FFN
    hidden mask.

    ``stash`` (backward only): dict with per-head attention
    probabilities ``pr{h}`` and the concatenated head contexts ``ctx``
    saved to HBM by the stashing forward — skips the scores bmm, the
    softmax chain, the additive-mask construction, and the prob@v bmm
    (benchmarks/block_anatomy.py: doubling the attention bmms alone
    costs +18%; the block kernel, unlike the RecBLR one, has
    substantial MXU exposure because dh=32 runs the MXU at <=25%
    utilization)."""
    _mm = _make_mm(mm_bf16)
    act_f, _ = _act_pair(act)
    bt, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    x2 = x.reshape(bt * t, d)
    amask = None
    if stash is None:
        amask = _additive_mask(padrow, t, causal)

    ao2 = None
    heads = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = (_mm(x2, p["w_q"][:, sl]) + p["b_q"][sl]).reshape(bt, t, dh)
        kh = (_mm(x2, p["w_k"][:, sl]) + p["b_k"][sl]).reshape(bt, t, dh)
        vh = (_mm(x2, p["w_v"][:, sl]) + p["b_v"][sl]).reshape(bt, t, dh)
        if stash is not None:
            pr = stash[f"pr{h}"]
        else:
            s = _bmm(qh, kh, ((2,), (2,)), mm_bf16) * scale + amask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = fastmath.exp(s)
            pr = e / jnp.sum(e, axis=-1, keepdims=True)
        if seeded and kp_a < 1.0:
            m_a = _dropout_mask(pr.shape, kp_a)
            pd = pr * m_a
        else:
            m_a = None
            pd = pr
        if stash is not None:
            ctx_h = stash["ctx"][..., sl]
        else:
            ctx_h = _bmm(pd, vh, ((2,), (1,)), mm_bf16)  # [bt, t, dh]
        contrib = _mm(ctx_h.reshape(bt * t, dh), p["w_o"][sl, :])
        ao2 = contrib if ao2 is None else ao2 + contrib
        heads.append(
            dict(qh=qh, kh=kh, vh=vh, pr=pr, pd=pd, m_a=m_a, ctx_h=ctx_h)
        )

    ao = (ao2 + p["b_o"]).reshape(bt, t, d)
    if seeded and kp_h < 1.0:
        m1 = _dropout_mask(ao.shape, kp_h)
        ao = ao * m1
    else:
        m1 = None
    r1, vhat1, inv1 = _ln_fwd(ao + x, p["ln1_s"], p["ln1_b"])

    r1f = r1.reshape(bt * t, d)
    pre1 = (_mm(r1f, p["w1"]) + p["b1"]).reshape(bt, t, -1)
    a1 = act_f(pre1)
    f2 = (_mm(a1.reshape(bt * t, -1), p["w2"]) + p["b2"]).reshape(bt, t, d)
    if seeded and kp_h < 1.0:
        m2 = _dropout_mask(f2.shape, kp_h)
        f2 = f2 * m2
    else:
        m2 = None
    out, vhat2, inv2 = _ln_fwd(f2 + r1, p["ln2_s"], p["ln2_b"])
    return dict(
        heads=heads, amask=amask, m1=m1, m2=m2, r1=r1, vhat1=vhat1,
        inv1=inv1, pre1=pre1, a1=a1, vhat2=vhat2, inv2=inv2, out=out,
    )


def _fwd_kernel(seed_ref, x_ref, len_ref, *refs, causal, n_heads, kp_h,
                kp_a, act, mm_bf16, stash=False):
    n_params = len(_PARAM_NAMES)
    param_refs = refs[:n_params]
    out_ref = refs[n_params]
    stash_refs = refs[n_params + 1 :]
    if kp_h < 1.0 or kp_a < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    padrow = len_ref[:].astype(jnp.float32)
    p = _params_from_refs(param_refs)
    res = _block_fwd_core(
        x, padrow, p, causal=causal, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a,
        act=act, mm_bf16=mm_bf16, seeded=True,
    )
    out_ref[:] = res["out"].astype(out_ref.dtype)
    if stash:
        for h in range(n_heads):
            stash_refs[h][:] = res["heads"][h]["pr"]
        stash_refs[n_heads][:] = jnp.concatenate(
            [hd["ctx_h"] for hd in res["heads"]], axis=-1
        )


def _bwd_kernel(seed_ref, x_ref, len_ref, dout_ref, *refs, causal, n_heads,
                kp_h, kp_a, act, mm_bf16, stash=False):
    n_stash = (n_heads + 1) if stash else 0
    stash_refs = refs[:n_stash]
    refs = refs[n_stash:]
    n_params = len(_PARAM_NAMES)
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    grad_refs = refs[n_params + 1:]
    first = pl.program_id(0) == 0
    _mm = _make_mm(mm_bf16)
    _, act_df = _act_pair(act)

    if kp_h < 1.0 or kp_a < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    padrow = len_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    p = _params_from_refs(param_refs)
    bt, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    x2 = x.reshape(bt * t, d)

    # recompute forward (same PRNG draw order as _fwd_kernel); with a
    # stash the scores/softmax/ctx recompute is skipped
    stash_vals = None
    if stash:
        stash_vals = {
            f"pr{h}": stash_refs[h][:] for h in range(n_heads)
        }
        stash_vals["ctx"] = stash_refs[n_heads][:]
    res = _block_fwd_core(
        x, padrow, p, causal=causal, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a,
        act=act, mm_bf16=mm_bf16, seeded=True, stash=stash_vals,
    )

    grads = {}
    dv2, grads["ln2_s"], grads["ln2_b"] = _ln_bwd(
        dout, res["vhat2"], res["inv2"], p["ln2_s"]
    )
    df2 = dv2 * res["m2"] if res["m2"] is not None else dv2
    dr1 = dv2  # residual branch
    df2_2 = df2.reshape(bt * t, d)
    a1_2 = res["a1"].reshape(bt * t, -1)
    grads["w2"] = _mmT(a1_2, df2_2)
    grads["b2"] = jnp.sum(df2_2, axis=0)
    da1 = _mm(df2_2, p["w2"].T).reshape(bt, t, -1)
    dpre1 = da1 * act_df(res["pre1"])
    dpre1_2 = dpre1.reshape(bt * t, -1)
    r1f = res["r1"].reshape(bt * t, d)
    grads["w1"] = _mmT(r1f, dpre1_2)
    grads["b1"] = jnp.sum(dpre1_2, axis=0)
    dr1 = dr1 + _mm(dpre1_2, p["w1"].T).reshape(bt, t, d)

    dv1, grads["ln1_s"], grads["ln1_b"] = _ln_bwd(
        dr1, res["vhat1"], res["inv1"], p["ln1_s"]
    )
    dx = dv1  # residual into x
    dao = dv1 * res["m1"] if res["m1"] is not None else dv1
    dao2 = dao.reshape(bt * t, d)
    grads["b_o"] = jnp.sum(dao2, axis=0)

    wo_rows, wq_cols, wk_cols, wv_cols = [], [], [], []
    bq_parts, bk_parts, bv_parts = [], [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        hd = res["heads"][h]
        ctx2 = hd["ctx_h"].reshape(bt * t, dh)
        wo_rows.append(_mmT(ctx2, dao2))
        dctx = _mm(dao2, p["w_o"][sl, :].T).reshape(bt, t, dh)
        # attention backward (math of ops/attention.py _bwd_kernel)
        pd, pr = hd["pd"], hd["pr"]
        dvh = _bmm(pd, dctx, ((1,), (1,)), mm_bf16)   # [bt, t_k, dh]
        dpd = _bmm(dctx, hd["vh"], ((2,), (2,)), mm_bf16)  # [bt, t_q, t_k]
        dp = dpd * hd["m_a"] if hd["m_a"] is not None else dpd
        ds = pr * (dp - jnp.sum(dp * pr, axis=-1, keepdims=True))
        dqh = _bmm(ds, hd["kh"], ((2,), (1,)), mm_bf16) * scale
        dkh = _bmm(ds, hd["qh"], ((1,), (1,)), mm_bf16) * scale
        dq2 = dqh.reshape(bt * t, dh)
        dk2 = dkh.reshape(bt * t, dh)
        dv2h = dvh.reshape(bt * t, dh)
        wq_cols.append(_mmT(x2, dq2))
        wk_cols.append(_mmT(x2, dk2))
        wv_cols.append(_mmT(x2, dv2h))
        bq_parts.append(jnp.sum(dq2, axis=0))
        bk_parts.append(jnp.sum(dk2, axis=0))
        bv_parts.append(jnp.sum(dv2h, axis=0))
        dx = dx + (
            _mm(dq2, p["w_q"][:, sl].T)
            + _mm(dk2, p["w_k"][:, sl].T)
            + _mm(dv2h, p["w_v"][:, sl].T)
        ).reshape(bt, t, d)

    grads["w_o"] = jnp.concatenate(wo_rows, axis=0)
    grads["w_q"] = jnp.concatenate(wq_cols, axis=1)
    grads["w_k"] = jnp.concatenate(wk_cols, axis=1)
    grads["w_v"] = jnp.concatenate(wv_cols, axis=1)
    grads["b_q"] = jnp.concatenate(bq_parts, axis=0)
    grads["b_k"] = jnp.concatenate(bk_parts, axis=0)
    grads["b_v"] = jnp.concatenate(bv_parts, axis=0)

    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    for name, ref in zip(_PARAM_NAMES, grad_refs):
        ref[:] += grads[name]


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "n_heads", "hidden_dropout_p", "attn_dropout_p", "act",
        "mm_bf16", "block_rows", "stash",
    ),
)
def _block_fwd(x, lens, seed, params, causal, n_heads, hidden_dropout_p,
               attn_dropout_p, act, mm_bf16=False, block_rows=0, stash=False):
    b, t, d = x.shape
    bt = block_rows or _attn_block_rows(t)
    xp = _pad_to(x, 0, bt, 0.0)
    lp = _pad_to(_pad_mask_rows(lens, t), 0, bt, 0.0)
    bp = xp.shape[0]
    kp_h, kp_a = 1.0 - hidden_dropout_p, 1.0 - attn_dropout_p
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((bt, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    plist = [params[n] for n in _PARAM_NAMES]
    out_shape = jax.ShapeDtypeStruct((bp, t, d), x.dtype)
    out_specs = block
    if stash:
        pr_spec = pl.BlockSpec(
            (bt, t, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = (
            out_shape,
            *[jax.ShapeDtypeStruct((bp, t, t), jnp.float32)
              for _ in range(n_heads)],
            jax.ShapeDtypeStruct((bp, t, d), jnp.float32),
        )
        out_specs = (block, *[pr_spec] * n_heads, block)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, causal=causal, n_heads=n_heads, kp_h=kp_h,
            kp_a=kp_a, act=act, mm_bf16=mm_bf16, stash=stash,
        ),
        out_shape=out_shape,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, len_spec,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=out_specs,
        interpret=_interpret(min(kp_h, kp_a)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, *plist)
    if stash:
        return out[0][:b], tuple(o[:b] for o in out[1:])
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "n_heads", "hidden_dropout_p", "attn_dropout_p", "act",
        "mm_bf16", "block_rows",
    ),
)
def _block_bwd(x, lens, dout, seed, params, causal, n_heads,
               hidden_dropout_p, attn_dropout_p, act, mm_bf16=False,
               block_rows=0, stash_vals=None):
    b, t, d = x.shape
    bt = block_rows or _attn_block_rows(t)
    xp = _pad_to(x, 0, bt, 0.0)
    dp_ = _pad_to(dout, 0, bt, 0.0)
    lp = _pad_to(_pad_mask_rows(lens, t), 0, bt, 0.0)
    bp = xp.shape[0]
    kp_h, kp_a = 1.0 - hidden_dropout_p, 1.0 - attn_dropout_p
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((bt, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    plist = [params[n] for n in _PARAM_NAMES]
    stash_in = []
    stash_specs = []
    if stash_vals is not None:
        for sv in stash_vals:
            w = sv.shape[-1]
            # pad 1.0: padded rows carry dout == 0, and a uniform pr
            # avoids 0-division shapes in the softmax backward
            stash_in.append(_pad_to(sv, 0, bt, 1.0))
            stash_specs.append(
                pl.BlockSpec((bt, t, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, causal=causal, n_heads=n_heads, kp_h=kp_h,
            kp_a=kp_a, act=act, mm_bf16=mm_bf16,
            stash=stash_vals is not None,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist],
        ),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, len_spec, block,
            *stash_specs,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=(block, *[_full_spec(p.shape) for p in plist]),
        interpret=_interpret(min(kp_h, kp_a)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, dp_, *stash_in, *plist)
    dx = outs[0][:b]
    dparams = {n: g for n, g in zip(_PARAM_NAMES, outs[1:])}
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_transformer_layer(x, lens, seed, params, causal, n_heads,
                            hidden_dropout_p, attn_dropout_p, act,
                            mm_bf16=False):
    """Complete post-LN transformer encoder layer as one Pallas kernel.

    x: [B, T, D] block input; lens: int32 [B] valid key lengths; seed:
    int32[1] per-step dropout seed; params: dict with w_q/w_k/w_v/w_o
    [D,D], b_q/b_k/b_v/b_o [D], ln1_s/ln1_b [D], w1 [D,I], b1 [I],
    w2 [I,D], b2 [D], ln2_s/ln2_b [D] — all fp32.  Static flags:
    causal, n_heads, hidden_dropout_p, attn_dropout_p (both 0.0 compile
    the PRNG out), act name, mm_bf16 (bf16 matmul operands / fp32
    accumulate; softmax + LN stay fp32).
    """
    return _block_fwd(
        x, lens, seed, params, causal, n_heads, hidden_dropout_p,
        attn_dropout_p, act, mm_bf16,
    )


def _vjp_fwd(x, lens, seed, params, causal, n_heads, hidden_dropout_p,
             attn_dropout_p, act, mm_bf16):
    from datamining_recblr_tpu.ops.fused_layer import _stash_policy

    b, t, d = x.shape
    # pr [B, heads, T, T] + ctx [B, T, D], both f32
    if _stash_policy(t, b * t * (n_heads * t + d) * 4):
        out, stash = _block_fwd(
            x, lens, seed, params, causal, n_heads, hidden_dropout_p,
            attn_dropout_p, act, mm_bf16, stash=True,
        )
        return out, (x, lens, seed, params, stash)
    out = _block_fwd(
        x, lens, seed, params, causal, n_heads, hidden_dropout_p,
        attn_dropout_p, act, mm_bf16,
    )
    return out, (x, lens, seed, params, None)


def _vjp_bwd(causal, n_heads, hidden_dropout_p, attn_dropout_p, act,
             mm_bf16, res, dout):
    x, lens, seed, params, stash = res
    dx, dparams = _block_bwd(
        x, lens, dout, seed, params, causal, n_heads, hidden_dropout_p,
        attn_dropout_p, act, mm_bf16, stash_vals=stash,
    )
    return dx, None, None, dparams


fused_transformer_layer.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Last-position variant for the TOP causal layer: SASRec's head consumes
# only gather_last(out) (reference sasrec.py:109-114), so the top
# layer's query is a single row — scores are [1, T] instead of [T, T]
# and the FFN/LNs run on [B, 1, D].  For the last row of a causal mask,
# "col <= len-1" coincides with the key-padding mask "col < len", so the
# padding rows alone are the correct additive mask.  K/V projections
# still run over full T (the last query attends to the whole prefix);
# the backward scatters the residual + query cotangent back to the last
# position and keeps full-T K/V gradients.
# ---------------------------------------------------------------------------


def _block_last_rows(t: int) -> int:
    # without the [rows, T, T] score tensor the working set scales like
    # rows*T (K/V per head + their grads); budget rows*T <= 32*200
    return max(1, min(32, (32 * 200) // t))


def _block_last_fwd_core(x, padrow, m, p, *, n_heads, kp_h, kp_a, act,
                         mm_bf16, seeded):
    """Forward returning only the last-position output [bt, 1, D].
    PRNG draw order: per-head [1,T] attn masks, then the [1,D]
    post-attention mask, then the [1,D] post-FFN mask."""
    _mm = _make_mm(mm_bf16)
    act_f, _ = _act_pair(act)
    bt, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    x2 = x.reshape(bt * t, d)
    xl = jnp.sum(m * x, axis=1, keepdims=True)  # [bt,1,D]
    xl2 = xl.reshape(bt, d)

    ao2 = None
    heads = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        ql = (_mm(xl2, p["w_q"][:, sl]) + p["b_q"][sl]).reshape(bt, 1, dh)
        kh = (_mm(x2, p["w_k"][:, sl]) + p["b_k"][sl]).reshape(bt, t, dh)
        vh = (_mm(x2, p["w_v"][:, sl]) + p["b_v"][sl]).reshape(bt, t, dh)
        s = _bmm(ql, kh, ((2,), (2,)), mm_bf16) * scale + padrow
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = fastmath.exp(s)
        pr = e / jnp.sum(e, axis=-1, keepdims=True)  # [bt,1,T]
        if seeded and kp_a < 1.0:
            m_a = _dropout_mask(pr.shape, kp_a)
            pd = pr * m_a
        else:
            m_a = None
            pd = pr
        ctx_h = _bmm(pd, vh, ((2,), (1,)), mm_bf16)  # [bt,1,dh]
        contrib = _mm(ctx_h.reshape(bt, dh), p["w_o"][sl, :])
        ao2 = contrib if ao2 is None else ao2 + contrib
        heads.append(dict(ql=ql, kh=kh, vh=vh, pr=pr, pd=pd, m_a=m_a, ctx_h=ctx_h))

    ao = (ao2 + p["b_o"]).reshape(bt, 1, d)
    if seeded and kp_h < 1.0:
        m1 = _dropout_mask(ao.shape, kp_h)
        ao = ao * m1
    else:
        m1 = None
    r1, vhat1, inv1 = _ln_fwd(ao + xl, p["ln1_s"], p["ln1_b"])

    pre1 = (_mm(r1.reshape(bt, d), p["w1"]) + p["b1"]).reshape(bt, 1, -1)
    a1 = act_f(pre1)
    f2 = (_mm(a1.reshape(bt, -1), p["w2"]) + p["b2"]).reshape(bt, 1, d)
    if seeded and kp_h < 1.0:
        m2 = _dropout_mask(f2.shape, kp_h)
        f2 = f2 * m2
    else:
        m2 = None
    out, vhat2, inv2 = _ln_fwd(f2 + r1, p["ln2_s"], p["ln2_b"])
    return dict(
        heads=heads, xl=xl, m1=m1, m2=m2, r1=r1, vhat1=vhat1, inv1=inv1,
        pre1=pre1, a1=a1, vhat2=vhat2, inv2=inv2, out=out,
    )


def _last_fwd_kernel(seed_ref, x_ref, len_ref, lens_ref, *refs, n_heads,
                     kp_h, kp_a, act, mm_bf16):
    out_ref = refs[-1]
    param_refs = refs[:-1]
    if kp_h < 1.0 or kp_a < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    padrow = len_ref[:].astype(jnp.float32)
    bt, t, d = x.shape
    m = _last_mask(lens_ref[:], bt, t)
    p = _params_from_refs(param_refs)
    res = _block_last_fwd_core(
        x, padrow, m, p, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a, act=act,
        mm_bf16=mm_bf16, seeded=True,
    )
    out_ref[:] = res["out"][:, 0, :].astype(out_ref.dtype)


def _last_bwd_kernel(seed_ref, x_ref, len_ref, lens_ref, dout_ref, *refs,
                     n_heads, kp_h, kp_a, act, mm_bf16):
    n_params = len(_PARAM_NAMES)
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    grad_refs = refs[n_params + 1:]
    first = pl.program_id(0) == 0
    _mm = _make_mm(mm_bf16)
    _, act_df = _act_pair(act)

    if kp_h < 1.0 or kp_a < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    padrow = len_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)[:, None, :]  # [bt,1,D]
    p = _params_from_refs(param_refs)
    bt, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    x2 = x.reshape(bt * t, d)
    m = _last_mask(lens_ref[:], bt, t)

    res = _block_last_fwd_core(
        x, padrow, m, p, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a, act=act,
        mm_bf16=mm_bf16, seeded=True,
    )
    xl2 = res["xl"].reshape(bt, d)

    grads = {}
    dv2, grads["ln2_s"], grads["ln2_b"] = _ln_bwd(
        dout, res["vhat2"], res["inv2"], p["ln2_s"]
    )
    df2 = dv2 * res["m2"] if res["m2"] is not None else dv2
    dr1 = dv2
    df2_2 = df2.reshape(bt, d)
    a1_2 = res["a1"].reshape(bt, -1)
    grads["w2"] = _mmT(a1_2, df2_2)
    grads["b2"] = jnp.sum(df2_2, axis=0)
    da1 = _mm(df2_2, p["w2"].T).reshape(bt, 1, -1)
    dpre1 = da1 * act_df(res["pre1"])
    dpre1_2 = dpre1.reshape(bt, -1)
    grads["w1"] = _mmT(res["r1"].reshape(bt, d), dpre1_2)
    grads["b1"] = jnp.sum(dpre1_2, axis=0)
    dr1 = dr1 + _mm(dpre1_2, p["w1"].T).reshape(bt, 1, d)

    dv1, grads["ln1_s"], grads["ln1_b"] = _ln_bwd(
        dr1, res["vhat1"], res["inv1"], p["ln1_s"]
    )
    dxl = dv1  # residual into x at the last position
    dao = dv1 * res["m1"] if res["m1"] is not None else dv1
    dao2 = dao.reshape(bt, d)
    grads["b_o"] = jnp.sum(dao2, axis=0)

    dx_full = jnp.zeros((bt, t, d), jnp.float32)
    wo_rows, wq_cols, wk_cols, wv_cols = [], [], [], []
    bq_parts, bk_parts, bv_parts = [], [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        hd = res["heads"][h]
        ctx2 = hd["ctx_h"].reshape(bt, dh)
        wo_rows.append(_mmT(ctx2, dao2))
        dctx = _mm(dao2, p["w_o"][sl, :].T).reshape(bt, 1, dh)
        pd, pr = hd["pd"], hd["pr"]
        dvh = _bmm(pd, dctx, ((1,), (1,)), mm_bf16)       # [bt, T, dh]
        dpd = _bmm(dctx, hd["vh"], ((2,), (2,)), mm_bf16)  # [bt, 1, T]
        dp = dpd * hd["m_a"] if hd["m_a"] is not None else dpd
        ds = pr * (dp - jnp.sum(dp * pr, axis=-1, keepdims=True))
        dql = _bmm(ds, hd["kh"], ((2,), (1,)), mm_bf16) * scale  # [bt,1,dh]
        dkh = _bmm(ds, hd["ql"], ((1,), (1,)), mm_bf16) * scale  # [bt,T,dh]
        dq2 = dql.reshape(bt, dh)
        dk2 = dkh.reshape(bt * t, dh)
        dv2h = dvh.reshape(bt * t, dh)
        wq_cols.append(_mmT(xl2, dq2))
        wk_cols.append(_mmT(x2, dk2))
        wv_cols.append(_mmT(x2, dv2h))
        bq_parts.append(jnp.sum(dq2, axis=0))
        bk_parts.append(jnp.sum(dk2, axis=0))
        bv_parts.append(jnp.sum(dv2h, axis=0))
        dxl = dxl + _mm(dq2, p["w_q"][:, sl].T).reshape(bt, 1, d)
        dx_full = dx_full + (
            _mm(dk2, p["w_k"][:, sl].T) + _mm(dv2h, p["w_v"][:, sl].T)
        ).reshape(bt, t, d)

    grads["w_o"] = jnp.concatenate(wo_rows, axis=0)
    grads["w_q"] = jnp.concatenate(wq_cols, axis=1)
    grads["w_k"] = jnp.concatenate(wk_cols, axis=1)
    grads["w_v"] = jnp.concatenate(wv_cols, axis=1)
    grads["b_q"] = jnp.concatenate(bq_parts, axis=0)
    grads["b_k"] = jnp.concatenate(bk_parts, axis=0)
    grads["b_v"] = jnp.concatenate(bv_parts, axis=0)

    dx_ref[:] = (dx_full + m * dxl).astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    for name, ref in zip(_PARAM_NAMES, grad_refs):
        ref[:] += grads[name]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_heads", "hidden_dropout_p", "attn_dropout_p", "act", "mm_bf16",
        "block_rows",
    ),
)
def _block_last_fwd(x, lens, seed, params, n_heads, hidden_dropout_p,
                    attn_dropout_p, act, mm_bf16=False, block_rows=0):
    b, t, d = x.shape
    bt = block_rows or _block_last_rows(t)
    xp = _pad_to(x, 0, bt, 0.0)
    lp = _pad_to(_pad_mask_rows(lens, t), 0, bt, 0.0)
    li = _pad_to(lens.astype(jnp.int32).reshape(-1, 1), 0, bt, 0)
    bp = xp.shape[0]
    kp_h, kp_a = 1.0 - hidden_dropout_p, 1.0 - attn_dropout_p
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((bt, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lens_spec = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    plist = [params[n] for n in _PARAM_NAMES]
    out = pl.pallas_call(
        functools.partial(
            _last_fwd_kernel, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a,
            act=act, mm_bf16=mm_bf16,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, d), x.dtype),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, len_spec, lens_spec,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(min(kp_h, kp_a)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, li, *plist)
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_heads", "hidden_dropout_p", "attn_dropout_p", "act", "mm_bf16",
        "block_rows",
    ),
)
def _block_last_bwd(x, lens, dout, seed, params, n_heads, hidden_dropout_p,
                    attn_dropout_p, act, mm_bf16=False, block_rows=0):
    b, t, d = x.shape
    bt = block_rows or _block_last_rows(t)
    xp = _pad_to(x, 0, bt, 0.0)
    dp_ = _pad_to(dout, 0, bt, 0.0)
    lp = _pad_to(_pad_mask_rows(lens, t), 0, bt, 0.0)
    li = _pad_to(lens.astype(jnp.int32).reshape(-1, 1), 0, bt, 0)
    bp = xp.shape[0]
    kp_h, kp_a = 1.0 - hidden_dropout_p, 1.0 - attn_dropout_p
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((bt, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lens_spec = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dblock = pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    plist = [params[n] for n in _PARAM_NAMES]
    outs = pl.pallas_call(
        functools.partial(
            _last_bwd_kernel, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a,
            act=act, mm_bf16=mm_bf16,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist],
        ),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, len_spec, lens_spec, dblock,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=(block, *[_full_spec(p.shape) for p in plist]),
        interpret=_interpret(min(kp_h, kp_a)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, li, dp_, *plist)
    dx = outs[0][:b]
    dparams = {n: g for n, g in zip(_PARAM_NAMES, outs[1:])}
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_transformer_layer_last(x, lens, seed, params, n_heads,
                                 hidden_dropout_p, attn_dropout_p, act,
                                 mm_bf16=False):
    """Top CAUSAL transformer layer fused kernel returning only each
    row's last-position output [B, D] (the model head consumes
    gather_last alone, reference sasrec.py:109-114).  The single
    last-row query makes scores [1, T]; for that row the causal mask
    equals the key-padding mask, so no causal iota is needed.  K/V and
    their grads still span full T.  Only valid as the FINAL layer of a
    causal stack."""
    return _block_last_fwd(
        x, lens, seed, params, n_heads, hidden_dropout_p, attn_dropout_p,
        act, mm_bf16,
    )


def _last_vjp_fwd(x, lens, seed, params, n_heads, hidden_dropout_p,
                  attn_dropout_p, act, mm_bf16):
    out = _block_last_fwd(
        x, lens, seed, params, n_heads, hidden_dropout_p, attn_dropout_p,
        act, mm_bf16,
    )
    return out, (x, lens, seed, params)


def _last_vjp_bwd(n_heads, hidden_dropout_p, attn_dropout_p, act, mm_bf16,
                  res, dout):
    x, lens, seed, params = res
    dx, dparams = _block_last_bwd(
        x, lens, dout, seed, params, n_heads, hidden_dropout_p,
        attn_dropout_p, act, mm_bf16,
    )
    return dx, None, None, dparams


fused_transformer_layer_last.defvjp(_last_vjp_fwd, _last_vjp_bwd)


# ---------------------------------------------------------------------------
# Selected-positions variant: BERT4Rec's cloze loss consumes the top
# layer's output only at the <= mask_len masked positions (reference
# bert4rec.py:141-213), so the top BIDIRECTIONAL layer needs queries at
# just those S positions — scores are [S, T] instead of [T, T] and the
# FFN/LNs run on [B, S, D].  Selection is a one-hot [S, T] matrix built
# in-kernel from the index block, applied with MXU matmuls (gather
# in, scatter-add out) — Mosaic has no in-kernel dynamic gather.
# Bidirectional masks are key-padding only, which is query-row
# independent, so any query subset sees the same additive row.
# ---------------------------------------------------------------------------


def _sel_onehot(idx, bt, s, t):
    """f32 [bt, s, t] one-hot rows selecting position idx[b, s]."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, s, t), 2)
    return (pos == idx[:, :, None]).astype(jnp.float32)


def _block_sel_fwd_core(x, padrow, sel, p, *, n_heads, kp_h, kp_a, act,
                        mm_bf16, seeded, stash=None):
    """Forward on the S selected positions -> [bt, S, D] out.  PRNG draw
    order: per-head [S,T] attn masks, then the [S,D] post-attention
    mask, then the [S,D] post-FFN mask.  ``stash``: same contract as
    _block_fwd_core (saved pr{h}/ctx skip the scores bmm, softmax, and
    prob@v bmm in the backward)."""
    _mm = _make_mm(mm_bf16)
    act_f, _ = _act_pair(act)
    bt, t, d = x.shape
    s_n = sel.shape[1]
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    x2 = x.reshape(bt * t, d)
    xq = _bmm(sel, x, ((2,), (1,)), mm_bf16)  # [bt,S,D] selected inputs
    xq2 = xq.reshape(bt * s_n, d)

    ao2 = None
    heads = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = (_mm(xq2, p["w_q"][:, sl]) + p["b_q"][sl]).reshape(bt, s_n, dh)
        kh = (_mm(x2, p["w_k"][:, sl]) + p["b_k"][sl]).reshape(bt, t, dh)
        vh = (_mm(x2, p["w_v"][:, sl]) + p["b_v"][sl]).reshape(bt, t, dh)
        if stash is not None:
            pr = stash[f"pr{h}"]
        else:
            sc = _bmm(qh, kh, ((2,), (2,)), mm_bf16) * scale + padrow
            sc = sc - jnp.max(sc, axis=-1, keepdims=True)
            e = fastmath.exp(sc)
            pr = e / jnp.sum(e, axis=-1, keepdims=True)  # [bt,S,T]
        if seeded and kp_a < 1.0:
            m_a = _dropout_mask(pr.shape, kp_a)
            pd = pr * m_a
        else:
            m_a = None
            pd = pr
        if stash is not None:
            ctx_h = stash["ctx"][..., sl]
        else:
            ctx_h = _bmm(pd, vh, ((2,), (1,)), mm_bf16)  # [bt,S,dh]
        contrib = _mm(ctx_h.reshape(bt * s_n, dh), p["w_o"][sl, :])
        ao2 = contrib if ao2 is None else ao2 + contrib
        heads.append(dict(qh=qh, kh=kh, vh=vh, pr=pr, pd=pd, m_a=m_a, ctx_h=ctx_h))

    ao = (ao2 + p["b_o"]).reshape(bt, s_n, d)
    if seeded and kp_h < 1.0:
        m1 = _dropout_mask(ao.shape, kp_h)
        ao = ao * m1
    else:
        m1 = None
    r1, vhat1, inv1 = _ln_fwd(ao + xq, p["ln1_s"], p["ln1_b"])

    pre1 = (_mm(r1.reshape(bt * s_n, d), p["w1"]) + p["b1"]).reshape(bt, s_n, -1)
    a1 = act_f(pre1)
    f2 = (_mm(a1.reshape(bt * s_n, -1), p["w2"]) + p["b2"]).reshape(bt, s_n, d)
    if seeded and kp_h < 1.0:
        m2 = _dropout_mask(f2.shape, kp_h)
        f2 = f2 * m2
    else:
        m2 = None
    out, vhat2, inv2 = _ln_fwd(f2 + r1, p["ln2_s"], p["ln2_b"])
    return dict(
        heads=heads, xq=xq, m1=m1, m2=m2, r1=r1, vhat1=vhat1, inv1=inv1,
        pre1=pre1, a1=a1, vhat2=vhat2, inv2=inv2, out=out,
    )


def _sel_fwd_kernel(seed_ref, x_ref, len_ref, idx_ref, *refs, n_heads,
                    kp_h, kp_a, act, mm_bf16, stash=False):
    n_params = len(_PARAM_NAMES)
    param_refs = refs[:n_params]
    out_ref = refs[n_params]
    stash_refs = refs[n_params + 1 :]
    if kp_h < 1.0 or kp_a < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    padrow = len_ref[:].astype(jnp.float32)
    idx = idx_ref[:]
    bt, t, d = x.shape
    sel = _sel_onehot(idx, bt, idx.shape[1], t)
    p = _params_from_refs(param_refs)
    res = _block_sel_fwd_core(
        x, padrow, sel, p, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a, act=act,
        mm_bf16=mm_bf16, seeded=True,
    )
    out_ref[:] = res["out"].astype(out_ref.dtype)
    if stash:
        for h in range(n_heads):
            stash_refs[h][:] = res["heads"][h]["pr"]
        stash_refs[n_heads][:] = jnp.concatenate(
            [hd["ctx_h"] for hd in res["heads"]], axis=-1
        )


def _sel_bwd_kernel(seed_ref, x_ref, len_ref, idx_ref, dout_ref, *refs,
                    n_heads, kp_h, kp_a, act, mm_bf16, stash=False):
    n_stash = (n_heads + 1) if stash else 0
    stash_refs = refs[:n_stash]
    refs = refs[n_stash:]
    n_params = len(_PARAM_NAMES)
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    grad_refs = refs[n_params + 1:]
    first = pl.program_id(0) == 0
    _mm = _make_mm(mm_bf16)
    _, act_df = _act_pair(act)

    if kp_h < 1.0 or kp_a < 1.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    padrow = len_ref[:].astype(jnp.float32)
    idx = idx_ref[:]
    dout = dout_ref[:].astype(jnp.float32)  # [bt,S,D]
    p = _params_from_refs(param_refs)
    bt, t, d = x.shape
    s_n = idx.shape[1]
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    x2 = x.reshape(bt * t, d)
    sel = _sel_onehot(idx, bt, s_n, t)

    stash_vals = None
    if stash:
        stash_vals = {f"pr{h}": stash_refs[h][:] for h in range(n_heads)}
        stash_vals["ctx"] = stash_refs[n_heads][:]
    res = _block_sel_fwd_core(
        x, padrow, sel, p, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a, act=act,
        mm_bf16=mm_bf16, seeded=True, stash=stash_vals,
    )
    xq2 = res["xq"].reshape(bt * s_n, d)

    grads = {}
    dv2, grads["ln2_s"], grads["ln2_b"] = _ln_bwd(
        dout, res["vhat2"], res["inv2"], p["ln2_s"]
    )
    df2 = dv2 * res["m2"] if res["m2"] is not None else dv2
    dr1 = dv2
    df2_2 = df2.reshape(bt * s_n, d)
    a1_2 = res["a1"].reshape(bt * s_n, -1)
    grads["w2"] = _mmT(a1_2, df2_2)
    grads["b2"] = jnp.sum(df2_2, axis=0)
    da1 = _mm(df2_2, p["w2"].T).reshape(bt, s_n, -1)
    dpre1 = da1 * act_df(res["pre1"])
    dpre1_2 = dpre1.reshape(bt * s_n, -1)
    grads["w1"] = _mmT(res["r1"].reshape(bt * s_n, d), dpre1_2)
    grads["b1"] = jnp.sum(dpre1_2, axis=0)
    dr1 = dr1 + _mm(dpre1_2, p["w1"].T).reshape(bt, s_n, d)

    dv1, grads["ln1_s"], grads["ln1_b"] = _ln_bwd(
        dr1, res["vhat1"], res["inv1"], p["ln1_s"]
    )
    dxq = dv1  # residual into the selected inputs
    dao = dv1 * res["m1"] if res["m1"] is not None else dv1
    dao2 = dao.reshape(bt * s_n, d)
    grads["b_o"] = jnp.sum(dao2, axis=0)

    dx_full = jnp.zeros((bt, t, d), jnp.float32)
    wo_rows, wq_cols, wk_cols, wv_cols = [], [], [], []
    bq_parts, bk_parts, bv_parts = [], [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        hd = res["heads"][h]
        ctx2 = hd["ctx_h"].reshape(bt * s_n, dh)
        wo_rows.append(_mmT(ctx2, dao2))
        dctx = _mm(dao2, p["w_o"][sl, :].T).reshape(bt, s_n, dh)
        pd, pr = hd["pd"], hd["pr"]
        dvh = _bmm(pd, dctx, ((1,), (1,)), mm_bf16)        # [bt,T,dh]
        dpd = _bmm(dctx, hd["vh"], ((2,), (2,)), mm_bf16)  # [bt,S,T]
        dp = dpd * hd["m_a"] if hd["m_a"] is not None else dpd
        ds = pr * (dp - jnp.sum(dp * pr, axis=-1, keepdims=True))
        dqh = _bmm(ds, hd["kh"], ((2,), (1,)), mm_bf16) * scale  # [bt,S,dh]
        dkh = _bmm(ds, hd["qh"], ((1,), (1,)), mm_bf16) * scale  # [bt,T,dh]
        dq2 = dqh.reshape(bt * s_n, dh)
        dk2 = dkh.reshape(bt * t, dh)
        dv2h = dvh.reshape(bt * t, dh)
        wq_cols.append(_mmT(xq2, dq2))
        wk_cols.append(_mmT(x2, dk2))
        wv_cols.append(_mmT(x2, dv2h))
        bq_parts.append(jnp.sum(dq2, axis=0))
        bk_parts.append(jnp.sum(dk2, axis=0))
        bv_parts.append(jnp.sum(dv2h, axis=0))
        dxq = dxq + _mm(dq2, p["w_q"][:, sl].T).reshape(bt, s_n, d)
        dx_full = dx_full + (
            _mm(dk2, p["w_k"][:, sl].T) + _mm(dv2h, p["w_v"][:, sl].T)
        ).reshape(bt, t, d)

    grads["w_o"] = jnp.concatenate(wo_rows, axis=0)
    grads["w_q"] = jnp.concatenate(wq_cols, axis=1)
    grads["w_k"] = jnp.concatenate(wk_cols, axis=1)
    grads["w_v"] = jnp.concatenate(wv_cols, axis=1)
    grads["b_q"] = jnp.concatenate(bq_parts, axis=0)
    grads["b_k"] = jnp.concatenate(bk_parts, axis=0)
    grads["b_v"] = jnp.concatenate(bv_parts, axis=0)

    # scatter-add the selected-position cotangents back over T
    dx_full = dx_full + _bmm(sel, dxq, ((1,), (1,)), False)
    dx_ref[:] = dx_full.astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    for name, ref in zip(_PARAM_NAMES, grad_refs):
        ref[:] += grads[name]


def _sel_block_rows(t: int, s: int) -> int:
    # scores are [rows, S, T]; budget rows*S*T <= 16*40*200.  Mosaic
    # requires the [rows, S]/[rows, T] idx/lens blocks to be 8-sublane
    # aligned, so rows snaps to {8, 16} — a sub-8 budget result (e.g.
    # mask_ratio 0.6 -> S=120 at T=200 gave 5) still runs at 8 rows;
    # the 100 MiB scoped VMEM limit absorbs the overshoot.
    budget = (16 * 40 * 200) // max(1, s * t)
    return 16 if budget >= 16 else 8


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_heads", "hidden_dropout_p", "attn_dropout_p", "act", "mm_bf16",
        "block_rows", "stash",
    ),
)
def _block_sel_fwd(x, lens, sel_idx, seed, params, n_heads,
                   hidden_dropout_p, attn_dropout_p, act, mm_bf16=False,
                   block_rows=0, stash=False):
    b, t, d = x.shape
    s_n = sel_idx.shape[1]
    bt = block_rows or _sel_block_rows(t, s_n)
    xp = _pad_to(x, 0, bt, 0.0)
    lp = _pad_to(_pad_mask_rows(lens, t), 0, bt, 0.0)
    ip = _pad_to(sel_idx.astype(jnp.int32), 0, bt, 0)
    bp = xp.shape[0]
    kp_h, kp_a = 1.0 - hidden_dropout_p, 1.0 - attn_dropout_p
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((bt, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((bt, s_n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oblock = pl.BlockSpec((bt, s_n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    plist = [params[n] for n in _PARAM_NAMES]
    out_shape = jax.ShapeDtypeStruct((bp, s_n, d), x.dtype)
    out_specs = oblock
    if stash:
        pr_spec = pl.BlockSpec(
            (bt, s_n, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = (
            out_shape,
            *[jax.ShapeDtypeStruct((bp, s_n, t), jnp.float32)
              for _ in range(n_heads)],
            jax.ShapeDtypeStruct((bp, s_n, d), jnp.float32),
        )
        out_specs = (oblock, *[pr_spec] * n_heads,
                     pl.BlockSpec((bt, s_n, d), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(
            _sel_fwd_kernel, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a,
            act=act, mm_bf16=mm_bf16, stash=stash,
        ),
        out_shape=out_shape,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, len_spec, idx_spec,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=out_specs,
        interpret=_interpret(min(kp_h, kp_a)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, ip, *plist)
    if stash:
        return out[0][:b], tuple(o[:b] for o in out[1:])
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_heads", "hidden_dropout_p", "attn_dropout_p", "act", "mm_bf16",
        "block_rows",
    ),
)
def _block_sel_bwd(x, lens, sel_idx, dout, seed, params, n_heads,
                   hidden_dropout_p, attn_dropout_p, act, mm_bf16=False,
                   block_rows=0, stash_vals=None):
    b, t, d = x.shape
    s_n = sel_idx.shape[1]
    bt = block_rows or _sel_block_rows(t, s_n)
    xp = _pad_to(x, 0, bt, 0.0)
    dp_ = _pad_to(dout, 0, bt, 0.0)
    lp = _pad_to(_pad_mask_rows(lens, t), 0, bt, 0.0)
    ip = _pad_to(sel_idx.astype(jnp.int32), 0, bt, 0)
    bp = xp.shape[0]
    kp_h, kp_a = 1.0 - hidden_dropout_p, 1.0 - attn_dropout_p
    block = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((bt, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((bt, s_n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oblock = pl.BlockSpec((bt, s_n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    plist = [params[n] for n in _PARAM_NAMES]
    stash_in = []
    stash_specs = []
    if stash_vals is not None:
        for sv in stash_vals:
            w = sv.shape[-1]
            stash_in.append(_pad_to(sv, 0, bt, 1.0))
            stash_specs.append(
                pl.BlockSpec((bt, s_n, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
    outs = pl.pallas_call(
        functools.partial(
            _sel_bwd_kernel, n_heads=n_heads, kp_h=kp_h, kp_a=kp_a,
            act=act, mm_bf16=mm_bf16, stash=stash_vals is not None,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, d), x.dtype),
            *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist],
        ),
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, len_spec, idx_spec, oblock,
            *stash_specs,
            *[_full_spec(p.shape) for p in plist],
        ],
        out_specs=(block, *[_full_spec(p.shape) for p in plist]),
        interpret=_interpret(min(kp_h, kp_a)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, xp, lp, ip, dp_, *stash_in, *plist)
    dx = outs[0][:b]
    dparams = {n: g for n, g in zip(_PARAM_NAMES, outs[1:])}
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_transformer_layer_sel(x, lens, sel_idx, seed, params, n_heads,
                                hidden_dropout_p, attn_dropout_p, act,
                                mm_bf16=False):
    """Top BIDIRECTIONAL transformer layer fused kernel computing output
    only at S selected positions -> [B, S, D] (x: [B,T,D]; lens: int[B];
    sel_idx: int[B, S] position indices, need not be valid everywhere —
    invalid entries just produce unused rows).  Queries exist only at
    the selected positions; K/V and their grads span full T.  The
    additive mask is key-padding only (query-row independent), so any
    query subset sees the correct mask — hence bidirectional (or the
    causal last row, where padding == causal).  Only valid as the FINAL
    layer of a stack (earlier layers feed every position)."""
    return _block_sel_fwd(
        x, lens, sel_idx, seed, params, n_heads, hidden_dropout_p,
        attn_dropout_p, act, mm_bf16,
    )


def _sel_vjp_fwd(x, lens, sel_idx, seed, params, n_heads, hidden_dropout_p,
                 attn_dropout_p, act, mm_bf16):
    from datamining_recblr_tpu.ops.fused_layer import _stash_policy

    b, t, d = x.shape
    s_q = sel_idx.shape[1] if sel_idx is not None else t
    # pr [B, heads, S, T] + ctx [B, S, D], both f32
    if _stash_policy(t, b * s_q * (n_heads * t + d) * 4):
        out, stash = _block_sel_fwd(
            x, lens, sel_idx, seed, params, n_heads, hidden_dropout_p,
            attn_dropout_p, act, mm_bf16, stash=True,
        )
        return out, (x, lens, sel_idx, seed, params, stash)
    out = _block_sel_fwd(
        x, lens, sel_idx, seed, params, n_heads, hidden_dropout_p,
        attn_dropout_p, act, mm_bf16,
    )
    return out, (x, lens, sel_idx, seed, params, None)


def _sel_vjp_bwd(n_heads, hidden_dropout_p, attn_dropout_p, act, mm_bf16,
                 res, dout):
    x, lens, sel_idx, seed, params, stash = res
    dx, dparams = _block_sel_bwd(
        x, lens, sel_idx, dout, seed, params, n_heads, hidden_dropout_p,
        attn_dropout_p, act, mm_bf16, stash_vals=stash,
    )
    return dx, None, None, None, dparams


fused_transformer_layer_sel.defvjp(_sel_vjp_fwd, _sel_vjp_bwd)
