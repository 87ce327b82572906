"""Sequence parallelism as a model capability: a mesh with a ``seq``
axis shards the time dimension of RecBLR's recurrence across devices
(ops/seq_parallel_scan.py), composed with data parallelism.  The
sharded model must match the single-device model exactly (same params,
same math — the carry combine preserves the reference's cross-boundary
gate semantics, RecBLR.py:196-200)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.synthetic import synthetic_splits
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.parallel import make_mesh, shard_batch
from datamining_recblr_tpu.train.optim import build_optimizer

pytestmark = pytest.mark.slow  # heavy multi-device trajectory pins

N_ITEMS, MAX_LEN, B = 128, 32, 16


def _cfg(**over):
    return Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16,
            "num_layers": 2,
            "use_pallas_scan": "never",
            "MAX_ITEM_LIST_LENGTH": MAX_LEN,
            **over,
        },
    )


@pytest.fixture(scope="module")
def batch():
    train, _ = synthetic_splits(40, N_ITEMS, MAX_LEN, B, seed=11)
    return {
        "item_seq": train.item_seq,
        "item_seq_len": train.item_seq_len,
        "pos_item": train.pos_item,
        "weight": np.ones((B,), np.float32),
    }


def test_seq_parallel_forward_matches_single(batch):
    mesh = make_mesh({"data": 2, "seq": 4})
    cfg = _cfg()
    model = get_model("RecBLR")(cfg, N_ITEMS, MAX_LEN)
    params = model.init_params(jax.random.PRNGKey(0))

    ref = jax.jit(
        lambda p, s, l: model.forward(p, s, l, deterministic=True)
    )(params, jnp.asarray(batch["item_seq"]), jnp.asarray(batch["item_seq_len"]))

    model.mesh = mesh
    assert model._seq_shards() == 4
    sb = shard_batch(batch, mesh)
    assert sb["item_seq"].sharding.spec == jax.sharding.PartitionSpec("data", "seq")
    got = jax.jit(
        lambda p, s, l: model.forward(p, s, l, deterministic=True)
    )(params, sb["item_seq"], sb["item_seq_len"])

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_seq_parallel_train_step_matches_single(batch):
    mesh = make_mesh({"data": 2, "seq": 4})
    losses = {}
    for name, mesh_in in (("single", None), ("seq", mesh)):
        cfg = _cfg()
        model = get_model("RecBLR")(cfg, N_ITEMS, MAX_LEN)
        model.mesh = mesh_in
        optimizer = build_optimizer(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        rng = jax.random.PRNGKey(7)
        b = shard_batch(batch, mesh) if mesh_in else jax.tree.map(
            jnp.asarray, batch
        )

        @jax.jit
        def step(params, opt_state, b):
            loss, grads = jax.value_and_grad(
                lambda p: model.calculate_loss(p, b, rng)
            )(params)
            u, opt_state = optimizer.update(grads, opt_state, params)
            return jax.tree.map(lambda p, x: p + x, params, u), opt_state, loss

        traj = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, b)
            traj.append(float(loss))
        losses[name] = traj
    np.testing.assert_allclose(losses["seq"], losses["single"], rtol=2e-5)


def test_seq_axis_must_divide_t():
    from datamining_recblr_tpu.ops.seq_parallel_scan import seq_parallel_scan

    mesh = make_mesh({"data": 2, "seq": 4})
    g = jnp.ones((2, 6, 8))  # T=6 does not divide 4
    with pytest.raises(ValueError, match="divide"):
        seq_parallel_scan(g, g, mesh, "seq")


def test_trainer_with_seq_mesh_config(tmp_path):
    """The 'seq' axis is a first-class config capability: mesh_shape
    {data, seq} in the YAML/config dict trains through the Trainer."""
    from datamining_recblr_tpu.data.dataset import build_from_dataframe
    from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
    from datamining_recblr_tpu.train import Trainer

    df = generate_synthetic_interactions(
        n_users=60, n_items=40, min_len=8, max_len=20, markov_weight=0.9, seed=5
    )
    data = build_from_dataframe(df, max_seq_len=16)
    cfg = _cfg(
        mesh_shape={"data": 2, "seq": 4},
        epochs=2,
        train_batch_size=64,
        eval_batch_size=64,
        dataset="synthetic",
        checkpoint_dir=str(tmp_path / "saved"),
        MAX_ITEM_LIST_LENGTH=16,
    )
    model = get_model("RecBLR")(cfg, data.n_items, data.max_seq_len)
    tr = Trainer(cfg, model)
    assert model._seq_shards() == 4
    best, _ = tr.fit(data, checkpoint_path=str(tmp_path / "ck"))
    recs = tr.metrics.epoch_records()
    assert len(recs) == 2
    assert recs[-1]["train_loss"] < recs[0]["train_loss"] * 1.05
