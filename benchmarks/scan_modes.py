#!/usr/bin/env python
"""Scan-implementation benchmark — the analogue of the paper's Table 5
(serial recurrence vs parallel scan vs the shipped embedding-padding
scheme, SURVEY §6A): times the BD-LRU recurrence under four
implementations at the flagship shape.

  serial   : lax.scan step-by-step (the paper's 'serial scan' baseline)
  xla      : lax.associative_scan (log-depth, XLA-fused)
  pallas   : the standalone Pallas scan kernel
  fused    : the whole-layer fused kernel (conv+gates+scan+FFN)

Prints one JSON line per mode with ms/call and speedup vs serial.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(b=2048, t=200, c=128):
    rng = np.random.default_rng(0)
    gates = jnp.asarray(rng.uniform(0.5, 0.999, (b, t, c)).astype(np.float32))
    tokens = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))

    def serial_impl(g, x):
        def step(h, gx):
            gt, xt = gx
            h = gt * h + xt
            return h, h

        _, hs = jax.lax.scan(step, jnp.zeros_like(x[:, 0]), (g.transpose(1, 0, 2), x.transpose(1, 0, 2)))
        return hs.transpose(1, 0, 2)

    from datamining_recblr_tpu.ops.pallas_scan import linear_scan_pallas
    from datamining_recblr_tpu.ops.scan import linear_scan_xla

    impls = {
        "serial": jax.jit(serial_impl),
        "xla": jax.jit(linear_scan_xla),
        "pallas": jax.jit(linear_scan_pallas),
    }

    results = {}
    for name, fn in impls.items():
        out = fn(gates, tokens)
        out.block_until_ready()
        n = 5 if name == "serial" else 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(gates, tokens)
        out.block_until_ready()
        results[name] = (time.perf_counter() - t0) / n * 1e3

    base = results["serial"]
    for name, ms in results.items():
        print(json.dumps({
            "mode": name, "ms_per_call": round(ms, 3),
            "speedup_vs_serial": round(base / ms, 1),
            "shape": [b, t, c],
        }))


if __name__ == "__main__":
    main()
