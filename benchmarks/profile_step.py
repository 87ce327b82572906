"""Profile one model's train step on the TPU and print the top device
ops by total duration (parses the xplane proto directly; the
tensorboard profile-plugin converter is broken in this image).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python benchmarks/profile_step.py [trace_dir] [model]
"""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_steps(trace_dir, model_name="RecBLR", n_items=3417, max_len=200,
              batch=2048, steps=6):
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.synthetic import synthetic_splits
    from datamining_recblr_tpu.models import get_model
    from datamining_recblr_tpu.train.optim import build_optimizer

    cfg = Config(
        model=model_name,
        config_dict={
            "MAX_ITEM_LIST_LENGTH": max_len,
            "compute_dtype": "bfloat16",
            "use_pallas_scan": "auto",
        },
    )
    model = get_model(model_name)(cfg, n_items=n_items, max_seq_len=max_len)
    optimizer = build_optimizer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    base_rng = jax.random.key(1, impl=cfg["prng_impl"])

    train, _ = synthetic_splits(6040, n_items, max_len, batch * 2, seed=0)
    seqs = jnp.asarray(train.item_seq[:batch])
    lens = jnp.asarray(train.item_seq_len[:batch])
    pos = jnp.asarray(train.pos_item[:batch])
    weight = jnp.ones((batch,), jnp.float32)

    import optax

    batch = {
        "item_seq": seqs, "item_seq_len": lens, "pos_item": pos,
        "weight": weight,
    }

    @jax.jit
    def step(params, opt_state, rng, i):
        def loss_fn(p):
            return model.calculate_loss(p, batch, jax.random.fold_in(rng, i))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    for i in range(3):  # warmup/compile
        params, opt_state, loss = step(params, opt_state, base_rng, i)
    jax.block_until_ready(loss)

    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            params, opt_state, loss = step(params, opt_state, base_rng, 100 + i)
        jax.block_until_ready(loss)
    print("loss", float(loss))


def summarize(trace_dir, steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, "no xplane dump found"
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())

    totals = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                pass
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[(plane.name, line.name, name)] += ev.duration_ps
        del stats_meta

    # collapse to op name across lines of the op-level line only
    per_line = collections.defaultdict(collections.Counter)
    for (plane, line, name), ps in totals.items():
        per_line[line][name] += ps
    # pick the line with the most entries that looks op-level
    best = max(per_line.items(), key=lambda kv: len(kv[1]))
    print(f"\n== line: {best[0]} ({len(best[1])} ops) ==")
    total_ms = sum(best[1].values()) / 1e9
    print(f"total device time: {total_ms:.2f} ms over {steps} steps "
          f"=> {total_ms / steps:.2f} ms/step")
    for name, ps in best[1].most_common(25):
        print(f"{ps / 1e9 / steps:8.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/recblr_prof"
    model_name = sys.argv[2] if len(sys.argv) > 2 else "RecBLR"
    steps = 6
    run_steps(trace_dir, model_name=model_name, steps=steps)
    summarize(trace_dir, steps)
