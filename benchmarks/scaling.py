#!/usr/bin/env python
"""Multi-chip scaling benchmark harness.

Measures training examples/s at 1..N devices over a Mesh(data, model),
reporting scaling efficiency (BASELINE.json north star: >=80% at 2
hosts).  On a single-chip environment it exercises the sharded path on
virtual CPU devices (correctness/compile check, timings not meaningful);
on a real slice it reports honest per-configuration throughput.

Usage:
  python benchmarks/scaling.py [--batch 2048] [--steps 20] [--model-axis 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench_mesh(mesh_shape, batch, steps, n_items=3417, max_len=200):
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.synthetic import synthetic_splits
    from datamining_recblr_tpu.models import get_model
    from datamining_recblr_tpu.parallel import make_mesh, shard_batch
    from datamining_recblr_tpu.parallel.steps import (
        init_sharded_state,
        make_sharded_train_step,
    )
    from datamining_recblr_tpu.train.optim import build_optimizer

    n_dev = int(np.prod(list(mesh_shape.values())))
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n_dev])
    cfg = Config(
        model="RecBLR",
        config_dict={
            "MAX_ITEM_LIST_LENGTH": max_len,
            "compute_dtype": "bfloat16" if jax.default_backend() == "tpu" else "float32",
            "mesh_shape": mesh_shape,
        },
    )
    model = get_model("RecBLR")(cfg, n_items=n_items, max_seq_len=max_len)
    optimizer = build_optimizer(cfg)
    params, opt_state = init_sharded_state(model, optimizer, mesh, jax.random.PRNGKey(0))
    step = make_sharded_train_step(model, optimizer, jax.random.PRNGKey(1))

    train, _ = synthetic_splits(6040, n_items, max_len, batch, seed=0)
    sbatch = shard_batch(
        {
            "item_seq": jnp.asarray(train.item_seq),
            "item_seq_len": jnp.asarray(train.item_seq_len),
            "pos_item": jnp.asarray(train.pos_item),
            "weight": jnp.ones((batch,), jnp.float32),
        },
        mesh,
    )
    params, opt_state, loss = step(params, opt_state, sbatch, 0)
    loss.block_until_ready()
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, sbatch, i + 1)
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--model-axis", type=int, default=1)
    args = ap.parse_args()

    n = len(jax.devices())
    results = {}
    base = None
    d = 1
    while d <= n:
        data_axis = max(1, d // args.model_axis) if d >= args.model_axis else d
        model_axis = args.model_axis if d >= args.model_axis else 1
        shape = {"data": data_axis, "model": model_axis}
        eps = bench_mesh(shape, args.batch, args.steps)
        if base is None:
            base = eps
        eff = eps / (base * d)
        results[d] = {"mesh": shape, "examples_per_s": round(eps, 1),
                      "scaling_efficiency": round(eff, 3)}
        print(json.dumps({"devices": d, **results[d]}))
        d *= 2


if __name__ == "__main__":
    main()
