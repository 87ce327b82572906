"""Anatomy of the fused transformer-block backward (SASRec/BERT4Rec):
what actually costs time?  Companion to benchmarks/bwd_anatomy.py
(which killed the serial MXU+VPU roofline story for the RecBLR layer
kernel: matmuls are ~free, elementwise VPU/VMEM passes are the wall).

The block kernel's elementwise passes are dominated by [rows, T, T]
attention-probability arrays (T^2 = 40,000 elems/row at T=200 vs
T*D = 12,800 for hidden tensors).  Sections stubbed by monkeypatching:

  softmax    : exp/max/sum/div chain -> linear stand-in (keeps the
               scores bmm and the prob bmm, removes the transcendental
               + reduction passes over [rows,T,T] x heads)
  matmuls    : every _mm/_mmT/_bmm -> broadcast stubs (removes ALL MXU
               work)
  dropout    : kp=1 (removes PRNG gen + mask mults incl. [T,T] ones)
  ffn        : act -> identity-ish

Usage: python benchmarks/block_anatomy.py

MEASURED (v5e, round 4): base 9.28 ms; softmax exp->linear 9.33 (~0);
matmul stubs 10.09 (stub overhead — inconclusive); all matmuls/bmms
DOUBLED 13.23 (+43%); attention bmms doubled only 10.92 (+18%).
Unlike the RecBLR kernel this one has real MXU exposure (dh=32 bmms at
<=25% utilization) — hence the pr/ctx stash removing the scores bmm +
softmax + prob@v recompute (block bwd 5.87 -> 4.95 ms in-step).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x0, iters=30, warmup=5):
    x = x0
    for i in range(warmup):
        x = fn(i, x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    x = x0
    t0 = time.perf_counter()
    for i in range(iters):
        x = fn(i, x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import datamining_recblr_tpu.ops.fused_block  # noqa: F401
    FB = sys.modules["datamining_recblr_tpu.ops.fused_block"]
    from datamining_recblr_tpu.ops import fastmath

    b, t, d, h = 2048, 200, 64, 2
    nv = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    dout = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(2, t + 1, size=b), jnp.int32)
    seeds = [jnp.full((1,), i, jnp.int32) for i in range(nv)]

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.02), jnp.float32)

    params = {
        "w_q": mk((d, d)), "b_q": mk((d,)), "w_k": mk((d, d)), "b_k": mk((d,)),
        "w_v": mk((d, d)), "b_v": mk((d,)), "w_o": mk((d, d)), "b_o": mk((d,)),
        "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "w1": mk((d, 4 * d)), "b1": mk((4 * d,)), "w2": mk((4 * d, d)),
        "b2": mk((d,)), "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
    }

    orig_exp = fastmath.exp
    orig_make_mm = FB._make_mm
    orig_mmT = FB._mmT
    orig_bmm = FB._bmm

    def exp_stub(v):
        return v * 0.01 + 1.0  # positive-ish, keeps div/sum shapes

    def mm_stub_factory(mm_bf16):
        def _mm(a, bb):
            sa = jnp.sum(a, axis=1, keepdims=True)
            sb = jnp.sum(bb, axis=0, keepdims=True) * 1e-3
            return sa * sb
        return _mm

    def mmT_stub(a, bb):
        k = a.shape[1]
        sa = jnp.sum(a, axis=0, keepdims=True).reshape(k, 1)
        sb = jnp.sum(bb, axis=0, keepdims=True) * 1e-6
        return sa * sb

    def bmm_stub(a, bb, dims, mm_bf16=False):
        (ca,), (cb,) = dims
        sa = jnp.sum(a, axis=ca, keepdims=True)
        sb = jnp.sum(bb, axis=cb, keepdims=True) * 1e-3
        out_a = jnp.moveaxis(sa, ca, -1)
        out_b = jnp.moveaxis(sb, cb, 1)
        return out_a * out_b

    def run(label, kp_h=0.5, kp_a=0.5):
        FB._block_bwd.clear_cache()

        def bwd(i, xv):
            return FB._block_bwd(
                xv, lens, dout, seeds[i % nv], params, True, h,
                1.0 - kp_h, 1.0 - kp_a, "gelu",
            )[0]

        ms = timeit(bwd, x)
        print(f"{label:34s} bwd={ms:6.2f} ms")
        return ms

    base = run("base (causal, drop 0.5/0.5)")
    run("no dropout", kp_h=1.0, kp_a=1.0)

    fastmath.exp = exp_stub
    FB.fastmath.exp = exp_stub
    run("softmax exp -> linear")
    fastmath.exp = orig_exp
    FB.fastmath.exp = orig_exp

    FB._make_mm = mm_stub_factory
    FB._mmT = mmT_stub
    FB._bmm = bmm_stub
    run("all matmuls/bmms -> stubs")
    FB._make_mm = orig_make_mm
    FB._mmT = orig_mmT
    FB._bmm = orig_bmm

    # marginal MXU probe: double every matmul/bmm with a perturbed
    # operand (not CSE-able).  If the marginal ~= the standalone matmul
    # time, the MXU is the critical path (the attention bmms contract
    # dh=32 / emit 32-wide outputs -> <=25% MXU utilization, unlike the
    # RecBLR kernel's 64..256-wide matmuls)
    def make_mm_2x(mm_bf16):
        base = orig_make_mm(mm_bf16)

        def _mm(a, bb):
            return 0.5 * (base(a, bb) + base(a, bb * 1.0000001))
        return _mm

    def mmT_2x(a, bb):
        return 0.5 * (orig_mmT(a, bb) + orig_mmT(a, bb * 1.0000001))

    def bmm_2x(a, bb, dims, mm_bf16=False):
        return 0.5 * (
            orig_bmm(a, bb, dims, mm_bf16)
            + orig_bmm(a, bb * 1.0000001, dims, mm_bf16)
        )

    FB._make_mm = make_mm_2x
    FB._mmT = mmT_2x
    FB._bmm = bmm_2x
    run("all matmuls/bmms DOUBLED")
    FB._make_mm = orig_make_mm
    FB._mmT = orig_mmT
    FB._bmm = orig_bmm

    FB._bmm = bmm_2x
    run("attention bmms DOUBLED only")
    FB._bmm = orig_bmm

    nb = b // FB._attn_block_rows(t)
    print(f"\nbase {base:.2f} ms = {base * 1e3 / nb:.2f} us per "
          f"{FB._attn_block_rows(t)}-row block")


if __name__ == "__main__":
    main()
