#!/usr/bin/env python
"""A/B the vocab-chunked streaming CE at the real XLong shape
(T=1024, B=512, V=329,722 — paper Table 5's flagship long-context
workload, reference trains it at 263 s/epoch on A100).

The XLA fallback materializes [512, 330k] f32 logits (~676 MB) in HBM
several times per step; the chunked kernel streams [2048, 64] table
chunks with an online logsumexp so logits never leave VMEM.

Usage: python benchmarks/ce_xlong.py [V] [T] [B]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench(chunked_ce, n_items=329_722, max_len=1024, batch=512):
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.synthetic import synthetic_splits
    from datamining_recblr_tpu.models.recblr import RecBLR
    from datamining_recblr_tpu.train.optim import build_optimizer

    cfg = Config(
        model="RecBLR",
        config_dict={
            "MAX_ITEM_LIST_LENGTH": max_len,
            "compute_dtype": "bfloat16",
            "use_pallas_scan": "auto",
        },
    )
    model = RecBLR(cfg, n_items=n_items, max_seq_len=max_len)
    if not chunked_ce:
        model._use_fused_ce = lambda *a, **k: False
    optimizer = build_optimizer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    base_rng = jax.random.key(1, impl=cfg["prng_impl"])
    train, _ = synthetic_splits(2000, n_items, max_len, batch * 2, seed=0)
    data = {
        "item_seq": jnp.asarray(train.item_seq[:batch]),
        "item_seq_len": jnp.asarray(train.item_seq_len[:batch]),
        "pos_item": jnp.asarray(train.pos_item[:batch]),
        "weight": jnp.ones((batch,), jnp.float32),
    }

    @jax.jit
    def step(params, opt_state, s):
        rng = jax.random.fold_in(base_rng, s)
        loss, grads = jax.value_and_grad(
            lambda p: model.calculate_loss(p, data, rng)
        )(params)
        u, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, q: p + q.astype(p.dtype), params, u)
        return params, opt_state, loss

    def run(k, s0):
        nonlocal params, opt_state
        loss = None
        for s in range(k):
            params, opt_state, loss = step(params, opt_state, s0 + s)
        return float(loss)

    run(3, 0)
    t0 = time.perf_counter()
    run(10, 3)
    t1 = time.perf_counter()
    loss = run(30, 13)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 20
    name = "chunked-ce " if chunked_ce else "xla-ce     "
    print(
        f"{name}: {dt*1e3:7.2f} ms/step  ({batch/dt:,.0f} ex/s)  "
        f"loss={loss:.4f}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 329_722
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    for chunked in (True, False):
        bench(chunked, v, t, b)
