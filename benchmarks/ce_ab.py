#!/usr/bin/env python
"""A/B the fused streaming-CE kernel (ops/fused_ce.py) against plain
XLA CE inside the full train step.  Usage:

  python benchmarks/ce_ab.py <model> [reps]

Measured 2026-08-20 (v5e, B=2048, T=200, V=3417): the fused kernel now
LOSES for RecBLR (154.5k vs 160.5k ex/s with XLA CE) after the
last-position kernels landed — XLA fuses the [B,V] CE with the
surrounding ops better than the standalone Pallas kernel.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench(model_name, disable_fused_ce):
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.synthetic import synthetic_splits
    from datamining_recblr_tpu.models import get_model
    from datamining_recblr_tpu.train.optim import build_optimizer

    cfg = Config(
        model=model_name,
        config_dict={
            "MAX_ITEM_LIST_LENGTH": 200,
            "compute_dtype": "bfloat16",
            "use_pallas_scan": "auto",
        },
    )
    model = get_model(model_name)(cfg, n_items=3417, max_seq_len=200)
    if disable_fused_ce:
        model._use_fused_ce = lambda *a: False
    optimizer = build_optimizer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    base_rng = jax.random.key(1, impl=cfg["prng_impl"])
    batch = 2048
    train, _ = synthetic_splits(6040, 3417, 200, batch * 4, seed=0)
    data = {
        k: jnp.asarray(getattr(train, k))
        for k in ("item_seq", "item_seq_len", "pos_item")
    }
    weight = jnp.ones((batch,), jnp.float32)

    def step(params, opt_state, idx, i):
        b = {
            "item_seq": data["item_seq"][idx],
            "item_seq_len": data["item_seq_len"][idx],
            "pos_item": data["pos_item"][idx],
            "weight": weight,
        }
        rng = jax.random.fold_in(base_rng, i)
        loss, grads = jax.value_and_grad(
            lambda p: model.calculate_loss(p, b, rng)
        )(params)
        u, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, x: p + x.astype(p.dtype), params, u)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))
    host = np.random.default_rng(0)
    n = len(train.pos_item)

    def run(k):
        nonlocal params, opt_state
        loss = None
        for s in range(k):
            idx = jnp.asarray(host.integers(0, n, batch), jnp.int32)
            params, opt_state, loss = jitted(params, opt_state, idx, s)
        return float(loss)

    run(5)
    t0 = time.perf_counter()
    run(15)
    ts = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(45)
    tl = time.perf_counter() - t0
    return batch * 30 / max(tl - ts, 1e-9)


if __name__ == "__main__":
    model_name = sys.argv[1] if len(sys.argv) > 1 else "RecBLR"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for _ in range(reps):
        for flag in (False, True):
            print(
                model_name, "fused_ce", "OFF" if flag else "ON ",
                round(bench(model_name, flag), 1), flush=True,
            )
