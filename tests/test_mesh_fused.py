"""Fused Pallas layer under a device mesh: the shard_map wrapper must
produce the same results as the unfused GSPMD path on the virtual
8-device mesh (interpret-mode kernels on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.synthetic import synthetic_splits
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.parallel import make_mesh, shard_batch
from datamining_recblr_tpu.parallel.steps import init_sharded_state
from datamining_recblr_tpu.train.optim import build_optimizer

N_ITEMS = 128
MAX_LEN = 8


def _model(impl, mesh=None):
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 64,
            "num_layers": 1,
            "use_pallas_scan": impl,
            "dropout_prob": 0.0,  # PRNG interpret mode is too slow on CPU
            "MAX_ITEM_LIST_LENGTH": MAX_LEN,
            "mesh_shape": {"data": 4, "model": 2} if mesh is not None else None,
        },
    )
    m = get_model("RecBLR")(cfg, n_items=N_ITEMS, max_seq_len=MAX_LEN)
    m.mesh = mesh
    return cfg, m


@pytest.mark.slow
def test_fused_layer_under_mesh_matches_unfused():
    mesh = make_mesh({"data": 4, "model": 2})
    cfg_f, m_fused = _model("always", mesh)
    cfg_r, m_ref = _model("never")
    optimizer = build_optimizer(cfg_f)

    rng = jax.random.PRNGKey(0)
    params, _ = init_sharded_state(m_fused, optimizer, mesh, rng)
    params_ref = m_ref.init_params(rng)

    train, _ = synthetic_splits(30, N_ITEMS, MAX_LEN, 16, seed=2)
    batch = shard_batch(
        {
            "item_seq": jnp.asarray(train.item_seq),
            "item_seq_len": jnp.asarray(train.item_seq_len),
        },
        mesh,
    )

    out_f = jax.jit(
        lambda p, s, l: m_fused.forward(p, s, l, deterministic=True)
    )(params, batch["item_seq"], batch["item_seq_len"])
    out_r = m_ref.forward(
        params_ref,
        jnp.asarray(train.item_seq),
        jnp.asarray(train.item_seq_len),
    )
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), rtol=5e-4, atol=5e-5
    )


def test_fused_layer_mesh_training_step():
    mesh = make_mesh({"data": 4, "model": 2})
    cfg, model = _model("always", mesh)
    optimizer = build_optimizer(cfg)
    params, opt_state = init_sharded_state(
        model, optimizer, mesh, jax.random.PRNGKey(0)
    )
    from datamining_recblr_tpu.parallel.steps import make_sharded_train_step

    step = make_sharded_train_step(model, optimizer, jax.random.key(7, impl="rbg"))
    train, _ = synthetic_splits(30, N_ITEMS, MAX_LEN, 16, seed=3)
    batch = shard_batch(
        {
            "item_seq": jnp.asarray(train.item_seq),
            "item_seq_len": jnp.asarray(train.item_seq_len),
            "pos_item": jnp.asarray(train.pos_item),
            "weight": jnp.ones((16,), jnp.float32),
        },
        mesh,
    )
    params, opt_state, loss = step(params, opt_state, batch, 0)
    assert np.isfinite(float(loss))
    params, opt_state, loss2 = step(params, opt_state, batch, 1)
    assert np.isfinite(float(loss2)) and float(loss2) < float(loss) + 1.0
