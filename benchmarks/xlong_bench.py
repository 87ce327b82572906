"""XLong-scale (T=1024, B=512) train-step timing: chunked fused path
vs the partially-fused fallback (paper Table 5's XLong workload; the
reference trains it at 263 s/epoch on A100).

Usage: python benchmarks/xlong_bench.py [T] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(model_cls, cfg, n_items, max_len, chunked):
    model = model_cls(cfg, n_items=n_items, max_seq_len=max_len)
    if not chunked:
        model._use_chunked_layer = lambda: False
    return model


def main(max_len=1024, batch=512):
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.synthetic import synthetic_splits
    from datamining_recblr_tpu.models.recblr import RecBLR
    from datamining_recblr_tpu.train.optim import build_optimizer

    n_items = 20000  # XLong-ish catalog
    cfg = Config(
        model="RecBLR",
        config_dict={
            "MAX_ITEM_LIST_LENGTH": max_len,
            "compute_dtype": "bfloat16",
            "use_pallas_scan": "auto",
        },
    )
    train, _ = synthetic_splits(2000, n_items, max_len, batch * 2, seed=0)
    data = {
        "item_seq": jnp.asarray(train.item_seq[:batch]),
        "item_seq_len": jnp.asarray(train.item_seq_len[:batch]),
        "pos_item": jnp.asarray(train.pos_item[:batch]),
        "weight": jnp.ones((batch,), jnp.float32),
    }
    optimizer = build_optimizer(cfg)

    for chunked in (False, True):
        model = build(RecBLR, cfg, n_items, max_len, chunked)
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        base_rng = jax.random.key(1, impl=cfg["prng_impl"])

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
        name = "chunked-fused" if chunked else "partial-path "
        print(
            f"{name}: {dt*1e3:7.2f} ms/step  "
            f"({batch/dt:,.0f} ex/s)  loss={loss:.4f}"
        )


if __name__ == "__main__":
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    main(t, b)
