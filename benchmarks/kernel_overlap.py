"""Which unit is the critical path inside the real fused-layer kernels?

benchmarks/unit_overlap.py showed v5e overlaps MXU and VPU almost fully
(0.92 overlap fraction) even through data-dependent mm->vpu chains
(register-granularity pipelining).  So the round-3 serial-sum roofline
(9 us MXU + 10 us VPU = 18.3 us/block) cannot be right as stated: if
overlap were total the block would run ~max(9,10).  This bench measures
the *marginal* cost of extra work on each unit inside the production
kernels by monkeypatching:

  mm2x  : every in-kernel matmul computed twice with a perturbed copy
          of the rhs (defeats CSE) and averaged — pure extra MXU work
          with unchanged dataflow.
  vpu4x : every fastmath.sigmoid also runs 6 extra dependent mul-adds
          — pure extra VPU work at the gate-math sites.

If marginal(mm2x) ~= the modeled full matmul time, the MXU is the
critical path (VPU hidden) -> attack matmul FLOPs/precision.
If marginal(vpu) dominates, the VPU is the wall -> attack elementwise op
count.  If both marginals are far below their unit times, the kernel is
bound by something else (relayouts, scan rolls, VMEM bandwidth).

Usage: python benchmarks/kernel_overlap.py

MEASURED (v5e, round 4): base fwd 3.28 / bwd 6.42 ms; mm2x fwd +0.36 /
bwd +0.98 ms (+15%); vpu+6-muladds-per-sigmoid fwd +0.46 / bwd
+0.33 ms.  Both units absorb extra work far below its standalone cost:
the recurrent-layer kernel is bound by neither unit's issue stream but
by its elementwise VPU/VMEM pass count (see bwd_anatomy.py).
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
    from datamining_recblr_tpu.ops import fastmath
    import datamining_recblr_tpu.ops.fused_bdlru
    import datamining_recblr_tpu.ops.fused_layer
    FB = sys.modules["datamining_recblr_tpu.ops.fused_bdlru"]
    FL = sys.modules["datamining_recblr_tpu.ops.fused_layer"]

    b, t, d, c = 2048, 200, 64, 128
    nv = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    dout = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    seeds = [jnp.full((1,), i, jnp.int32) for i in range(nv)]

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.02), jnp.float32)

    params = {
        "w_in": mk((d, 2 * c)), "wc": mk((4, c)), "bc": mk((c,)),
        "wg": mk((c, 2 * c)), "bg": mk((2 * c,)), "lam": mk((c,)),
        "w_out": mk((c, d)), "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "w1": mk((d, 4 * d)), "b1": mk((4 * d,)), "w2": mk((4 * d, d)),
        "b2": mk((d,)), "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
    }

    orig_make_mm = FL._make_mm
    orig_mmT = FL._mmT
    orig_sigmoid = fastmath.sigmoid

    def make_mm_2x(mm_bf16):
        base = orig_make_mm(mm_bf16)

        def _mm(a, bb):
            # second matmul with a perturbed rhs: same MXU shape, not
            # CSE-able, result numerically ~identical
            return 0.5 * (base(a, bb) + base(a, bb * 1.0000001))
        return _mm

    def mmT_2x(a, bb):
        return 0.5 * (orig_mmT(a, bb) + orig_mmT(a, bb * 1.0000001))

    def sigmoid_vpu(v):
        out = orig_sigmoid(v)
        for _ in range(6):
            out = out * 1.0000001 + 1e-9
        return out

    def clear():
        FL._layer_fwd.clear_cache()
        FL._layer_bwd.clear_cache()

    def run(label):
        clear()

        def fwd(i, xv):
            return FL._layer_fwd(xv, seeds[i % nv], params, True, True, 0.2)

        def bwd(i, xv):
            return FL._layer_bwd(
                xv, dout, seeds[i % nv], params, True, True, 0.2
            )[0]

        tf = timeit(fwd, x)
        tb = timeit(bwd, x)
        print(f"{label:28s} fwd={tf:6.2f} ms  bwd={tb:6.2f} ms")
        return tf, tb

    f0, b0 = run("base")

    _fb = FB
    FL._make_mm = make_mm_2x
    orig_gate = _fb._gate_math

    def gate_2x(xc, wg, bg, lam, mm_bf16=False):
        # double the gates matmul as well (it's jnp.dot inline there)
        bt, tt, cc = xc.shape
        x2 = xc.reshape(bt * tt, cc)
        if mm_bf16:
            x2 = x2.astype(jnp.bfloat16)
            wg = wg.astype(jnp.bfloat16)
        g = 0.5 * (
            jnp.dot(x2, wg, preferred_element_type=jnp.float32)
            + jnp.dot(x2, wg * 1.0000001, preferred_element_type=jnp.float32)
        ) + bg
        g = g.reshape(bt, tt, 2 * cc)
        r, i = g[..., :cc], g[..., cc:]
        sr = fastmath.sigmoid(r)
        si = fastmath.sigmoid(i)
        alpha = fastmath.exp(-jax.nn.softplus(lam) * sr)
        s = jnp.sqrt(1.0 - alpha * alpha + _fb.EPS)
        beta = s * si
        return alpha, beta, sr, si, s

    _fb._gate_math = gate_2x
    FL._mmT = mmT_2x
    # fused_layer imported _gate_math by name — patch its module global
    _fl_mod = FL
    _fl_mod._gate_math = gate_2x
    f1, b1 = run("mm2x (all matmuls doubled)")
    FL._make_mm = orig_make_mm
    FL._mmT = orig_mmT
    _fb._gate_math = orig_gate
    _fl_mod._gate_math = orig_gate

    fastmath.sigmoid = sigmoid_vpu
    _fb.fastmath.sigmoid = sigmoid_vpu
    f2, b2 = run("vpu+ (6 muladds/sigmoid)")
    fastmath.sigmoid = orig_sigmoid

    print()
    print(f"marginal MXU 2x:  fwd +{f1 - f0:5.2f} ms  bwd +{b1 - b0:5.2f} ms")
    print(f"marginal VPU 6xS: fwd +{f2 - f0:5.2f} ms  bwd +{b2 - b0:5.2f} ms")
    nb = 2048 // 8
    print(f"per 8-row block: base bwd {b0 * 1e3 / nb:.2f} us, "
          f"mm2x +{(b1 - b0) * 1e3 / nb:.2f} us, vpu+ +{(b2 - b0) * 1e3 / nb:.2f} us")


if __name__ == "__main__":
    main()
