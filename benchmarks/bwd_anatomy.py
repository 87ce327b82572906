"""Anatomy of the fused-layer backward: what actually costs time?

Round-4 probes killed the round-3 serial-roofline story: unit_overlap
shows the MXU/VPU overlap at 0.92 on independent chains, kernel_overlap
shows BOTH units absorb extra work far below its standalone cost
(mm2x +15%, vpu-chains ~free), and the multi-chain kernel (independent
8-row halves) gains only ~1.7%.  So the block's 18-25 us is bound by a
shared resource, not by either unit's issue stream.  This bench peels
the real backward kernel by monkeypatching sections to cheap stand-ins
(same shapes, garbage numerics) and reports the marginal time of each:

  - scan       : _scan_body -> identity (removes 2x ~10 rounds of
                 roll+where+mul over [bt,T,128])
  - gate math  : _gate_math -> constant-ish (keeps the gates matmul out,
                 removes sigmoid/exp/sqrt chains)
  - matmuls    : every jnp.dot/_mmT -> lane-broadcast stub (removes ALL
                 MXU work + its VMEM operand traffic)
  - conv       : use_conv=False
  - ffn        : use_ffn=False
  - dropout    : dropout_p=0.0

Usage: python benchmarks/bwd_anatomy.py

MEASURED (v5e, round 4): base 6.35 ms; no dropout 5.93; no ffn 4.73;
no conv 5.99; scan->identity 5.51; ALL matmuls->stubs 6.09 (-4%: MXU
work is essentially free under the elementwise passes); no matmuls AND
no scan 5.62.  Conclusion: elementwise pass count is the wall; the
h-stash (skip the fwd scan in the bwd) was the winning lever.
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
    FL = sys.modules.get("datamining_recblr_tpu.ops.fused_layer")
    if FL is None:
        import datamining_recblr_tpu.ops.fused_layer  # noqa: F401
        FL = sys.modules["datamining_recblr_tpu.ops.fused_layer"]
    from datamining_recblr_tpu.ops import fastmath  # noqa: F401

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

    orig_scan = FL._scan_body
    orig_gate = FL._gate_math
    orig_make_mm = FL._make_mm
    orig_mmT = FL._mmT

    def scan_stub(xv, f, reverse=False, return_prod=False):
        if return_prod:
            return xv, f
        return xv

    def gate_stub(xc, wg, bg, lam, mm_bf16=False):
        # keep ONE matmul-shaped product out (gates) but no
        # transcendentals: alpha/beta become cheap linear functions
        bt_, t_, c_ = xc.shape
        g = jnp.dot(
            xc.reshape(bt_ * t_, c_), wg, preferred_element_type=jnp.float32
        ).reshape(bt_, t_, 2 * c_)
        r, i = g[..., :c_], g[..., c_:]
        alpha = r * 0.001 + 0.95
        beta = i * 0.001 + 0.1
        return alpha, beta, r, i, beta

    def mm_stub_factory(mm_bf16):
        def _mm(a, bb):
            sa = jnp.sum(a, axis=1, keepdims=True)          # [M, 1]
            sb = jnp.sum(bb, axis=0, keepdims=True) * 1e-3  # [1, N]
            return sa * sb
        return _mm

    def mmT_stub(a, bb):
        k = a.shape[1]
        sa = jnp.sum(a, axis=0, keepdims=True).reshape(k, 1)  # [K, 1]
        sb = jnp.sum(bb, axis=0, keepdims=True) * 1e-6        # [1, M]
        return sa * sb

    def run(label, use_conv=True, use_ffn=True, p=0.2):
        FL._layer_bwd.clear_cache()

        def bwd(i, xv):
            return FL._layer_bwd(
                xv, dout, seeds[i % nv], params, use_conv, use_ffn, p
            )[0]

        ms = timeit(bwd, x)
        print(f"{label:34s} bwd={ms:6.2f} ms")
        return ms

    base = run("base (conv+ffn+drop)")
    run("no dropout", p=0.0)
    run("no ffn", use_ffn=False)
    run("no conv", use_conv=False)

    FL._scan_body = scan_stub
    run("scan -> identity")
    FL._scan_body = orig_scan

    FL._gate_math = gate_stub
    run("gate math -> linear (mm kept)")
    FL._gate_math = orig_gate

    def gate_stub_nomm(xc, wg, bg, lam, mm_bf16=False):
        alpha = xc * 0.001 + 0.95
        beta = xc * 0.001 + 0.1
        return alpha, beta, xc, xc, beta

    FL._make_mm = mm_stub_factory
    FL._mmT = mmT_stub
    FL._gate_math = gate_stub_nomm  # its in-body dot would remain otherwise
    run("all big matmuls -> bcast stubs")
    FL._scan_body = scan_stub
    run("no matmuls AND no scan")
    FL._scan_body = orig_scan
    FL._make_mm = orig_make_mm
    FL._mmT = orig_mmT
    FL._gate_math = orig_gate

    print(f"\nbase {base:.2f} ms = {base * 1e3 / (b // 8):.2f} us per 8-row block")


if __name__ == "__main__":
    main()
