"""TPU-only diagnostic: stash-vs-recompute backward with REAL dropout.

The CPU interpreter stubs PRNG bits to zeros, so the pytest version of
this check (tests/test_fused_layer.py::
test_stash_backward_matches_recompute_with_dropout) exercises the
draw-order plumbing but not real random masks.  On hardware, the stash
backward (which skips the forward scan but must regenerate every
dropout mask in the SAME draw order as the recompute backward) has to
produce bitwise-equal gradients — any draw-order slip shows up as a
large mismatch because the masks decorrelate.

Covers the full-T layer kernel, the last-position kernel, and the
transformer block's pr/ctx stash (fused_block).

Usage: python benchmarks/stash_dropout_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from datamining_recblr_tpu.ops import fused_block as FB
from datamining_recblr_tpu.ops import fused_layer as FL


def report(name, pairs):
    worst = 0.0
    for a, b in pairs:
        worst = max(worst, float(jnp.max(jnp.abs(a - b))))
    print(f"{name:>12}: max abs diff {worst:.3e} "
          f"({'BITWISE EQUAL' if worst == 0 else 'check tolerance'})")


def layer_params(rng, d=64, c=128):
    return {
        "w_in": jnp.asarray(rng.standard_normal((d, 2 * c)) * 0.1, jnp.float32),
        "wc": jnp.asarray(rng.standard_normal((4, c)) * 0.1, jnp.float32),
        "bc": jnp.zeros((c,), jnp.float32),
        "wg": jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32),
        "bg": jnp.zeros((2 * c,), jnp.float32),
        "lam": jnp.asarray(rng.uniform(0.5, 0.9, (c,)), jnp.float32),
        "w_out": jnp.asarray(rng.standard_normal((c, d)) * 0.1, jnp.float32),
        "ln1_s": jnp.ones((d,), jnp.float32),
        "ln1_b": jnp.zeros((d,), jnp.float32),
        "w1": jnp.asarray(rng.standard_normal((d, 4 * d)) * 0.1, jnp.float32),
        "b1": jnp.zeros((4 * d,), jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((4 * d, d)) * 0.1, jnp.float32),
        "b2": jnp.zeros((d,), jnp.float32),
        "ln2_s": jnp.ones((d,), jnp.float32),
        "ln2_b": jnp.zeros((d,), jnp.float32),
    }


def check_layer(last=False):
    rng = np.random.default_rng(3)
    p = layer_params(rng)
    x = jnp.asarray(rng.standard_normal((16, 32, 64)), jnp.float32)
    dout_full = jnp.asarray(rng.standard_normal((16, 32, 64)), jnp.float32)
    dout_last = dout_full[:, 0]
    lens = jnp.asarray(rng.integers(8, 33, 16), jnp.int32)
    seed = jnp.asarray([11], jnp.int32)
    kw = dict(block_rows=8)
    if last:
        d1 = FL._layer_last_bwd(x, lens, dout_last, seed, p, True, True, 0.3, **kw)
        _, stash = FL._layer_last_fwd(
            x, lens, seed, p, True, True, 0.3, stash=True, **kw
        )
        d2 = FL._layer_last_bwd(
            x, lens, dout_last, seed, p, True, True, 0.3, stash_vals=stash, **kw
        )
    else:
        d1 = FL._layer_bwd(x, dout_full, seed, p, True, True, 0.3, **kw)
        _, stash = FL._layer_fwd(x, seed, p, True, True, 0.3, stash=True, **kw)
        d2 = FL._layer_bwd(
            x, dout_full, seed, p, True, True, 0.3, stash_vals=stash, **kw
        )
    pairs = [(d1[0], d2[0])] + [(d1[1][k], d2[1][k]) for k in d1[1]]
    report("layer/last" if last else "layer/full", pairs)


def block_params(rng, d=64, inner=256):
    p = {}
    for n in ("w_q", "w_k", "w_v", "w_o"):
        p[n] = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
    for n in ("b_q", "b_k", "b_v", "b_o", "ln1_b", "b2", "ln2_b"):
        p[n] = jnp.zeros((d,), jnp.float32)
    p["ln1_s"] = jnp.ones((d,), jnp.float32)
    p["ln2_s"] = jnp.ones((d,), jnp.float32)
    p["w1"] = jnp.asarray(rng.standard_normal((d, inner)) * 0.1, jnp.float32)
    p["b1"] = jnp.zeros((inner,), jnp.float32)
    p["w2"] = jnp.asarray(rng.standard_normal((inner, d)) * 0.1, jnp.float32)
    return p


def check_block():
    rng = np.random.default_rng(4)
    p = block_params(rng)
    x = jnp.asarray(rng.standard_normal((16, 32, 64)), jnp.float32)
    dout = jnp.asarray(rng.standard_normal((16, 32, 64)), jnp.float32)
    lens = jnp.asarray(rng.integers(8, 33, 16), jnp.int32)
    seed = jnp.asarray([13], jnp.int32)
    args = (x, lens, dout, seed, p, True, 2, 0.3, 0.2, "gelu", False)
    d1 = FB._block_bwd(*args)
    _, stash = FB._block_fwd(
        x, lens, seed, p, True, 2, 0.3, 0.2, "gelu", False, stash=True
    )
    d2 = FB._block_bwd(*args, stash_vals=stash)
    pairs = [(d1[0], d2[0])] + [(d1[1][k], d2[1][k]) for k in d1[1]]
    report("block", pairs)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "hardware check: run on the TPU"
    check_layer(last=False)
    check_layer(last=True)
    check_block()
