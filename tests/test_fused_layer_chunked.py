"""Sequence-chunked fused layer vs the whole-T kernel and autodiff
oracle (CPU interpret).  The chunked variant must reproduce the
whole-T kernel's forward and gradients across chunk boundaries —
recurrence carry, conv tail, and the reversed backward walk."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.models.recblr import RecBLR
from datamining_recblr_tpu.ops.fused_layer import fused_recurrent_layer
from datamining_recblr_tpu.ops.fused_layer_chunked import (
    fused_recurrent_layer_chunked,
    pick_chunk,
)

B, T, D = 4, 24, 8


def _params(use_ffn, rng=0):
    model = RecBLR(
        Config(
            model="RecBLR",
            config_dict={
                "hidden_size": D,
                "num_layers": 1,
                "expand": 2,
                "d_conv": 4,
                "disable_ffn": not use_ffn,
                "MAX_ITEM_LIST_LENGTH": T,
            },
        ),
        n_items=50,
        max_seq_len=T,
    )
    p = model.init_params(jax.random.PRNGKey(rng))
    return model._flat_layer_params(p["layers"][0], use_ffn)


def test_pick_chunk():
    assert pick_chunk(1024) == 128  # default target 128: 8-row blocks
    assert pick_chunk(1024, target=256) == 256
    # chunks must be sublane-aligned (Mosaic: second-to-last block dim
    # divisible by 8): 200 -> 40 not 100, 1000 -> 40 not 125 (the
    # latter crashed the TPU lowering when T=1000 ran unpadded)
    assert pick_chunk(200) == 40
    assert pick_chunk(1000) == 40
    assert pick_chunk(24, target=8) == 8
    assert pick_chunk(997) == 0  # prime T: no chunked path


@pytest.mark.parametrize("use_conv", [True, False])
@pytest.mark.parametrize("use_ffn", [True, False])
@pytest.mark.parametrize("prologue", [False, True])
@pytest.mark.slow
def test_chunked_matches_whole_t(use_conv, use_ffn, prologue):
    flat = _params(use_ffn)
    if prologue:
        flat = dict(
            flat,
            pl_s=jnp.ones((D,), jnp.float32),
            pl_b=jnp.zeros((D,), jnp.float32),
        )
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, D), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    dout = jax.random.normal(jax.random.PRNGKey(4), (B, T, D), jnp.float32)

    def run_whole(x, flat):
        out = fused_recurrent_layer(
            x, seed, flat, use_conv, use_ffn, 0.0, False, prologue
        )
        return jnp.sum(out * dout)

    def run_chunked(x, flat):
        out = fused_recurrent_layer_chunked(
            x, seed, flat, use_conv, use_ffn, 0.0, False, prologue, 8
        )
        return jnp.sum(out * dout)

    ow, gw = jax.value_and_grad(run_whole, argnums=(0, 1))(x, flat)
    oc, gc = jax.value_and_grad(run_chunked, argnums=(0, 1))(x, flat)
    np.testing.assert_allclose(float(oc), float(ow), rtol=2e-5)
    for (k, a), (_, b) in zip(
        sorted(gc[1].items()), sorted(gw[1].items())
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(gc[0]), np.asarray(gw[0]), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_chunked_single_chunk_degenerate():
    """chunk == T collapses to the whole-T math exactly."""
    flat = _params(True)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, D), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    a = fused_recurrent_layer_chunked(x, seed, flat, True, True, 0.0, False, False, T)
    b = fused_recurrent_layer(x, seed, flat, True, True, 0.0, False, False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_chunked_model_under_mesh_matches_unmeshed():
    """T>512 chunked path under a data mesh (shard_map wrappers) must
    reproduce the unmeshed chunked model forward."""
    import numpy as _np

    from datamining_recblr_tpu.parallel import make_mesh, shard_batch
    from datamining_recblr_tpu.parallel.sharding import shard_params

    T_LONG, n_items, b = 528, 64, 16
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16,
            "num_layers": 2,
            "use_pallas_scan": "always",
            "dropout_prob": 0.0,
            "MAX_ITEM_LIST_LENGTH": T_LONG,
            "mesh_shape": {"data": 4, "model": 2},
        },
    )
    mesh = make_mesh({"data": 4, "model": 2})
    model_m = RecBLR(cfg, n_items=n_items, max_seq_len=T_LONG)
    model_m.mesh = mesh
    model_u = RecBLR(cfg, n_items=n_items, max_seq_len=T_LONG)
    assert model_m._use_chunked_layer() and model_u._use_chunked_layer()

    params = model_u.init_params(jax.random.PRNGKey(0))
    rng = _np.random.default_rng(0)
    seqs = _np.zeros((b, T_LONG), _np.int32)
    lens = rng.integers(2, T_LONG + 1, size=b).astype(_np.int32)
    for i, ln in enumerate(lens):
        seqs[i, :ln] = rng.integers(1, n_items, size=ln)
    batch = {"item_seq": jnp.asarray(seqs), "item_seq_len": jnp.asarray(lens)}
    sharded = shard_batch(batch, mesh)

    out_m = jax.jit(
        lambda p, s, l: model_m.forward(p, s, l, deterministic=True)
    )(shard_params(params, mesh), sharded["item_seq"], sharded["item_seq_len"])
    out_u = model_u.forward(
        params, batch["item_seq"], batch["item_seq_len"], deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(out_m), np.asarray(out_u), rtol=5e-4, atol=5e-5
    )


@pytest.mark.slow
def test_xlong_vocab_mesh_composition_grads():
    """The composition multi-chip exists for (VERDICT r3 #6): chunked
    fused layer at T=1024 x large vocab (V past the scatter-add
    embedding-grad crossover, ops/embedding.py _SCATTER_MIN_V) x mesh
    with a row-sharded table + vocab-parallel CE.  Asserts the meshed
    train-step loss AND grads match the unmeshed ones at XLong-like
    shapes (B scaled down, structure preserved)."""
    import numpy as _np

    from datamining_recblr_tpu.ops.embedding import _SCATTER_MIN_V
    from datamining_recblr_tpu.parallel import make_mesh, shard_batch
    from datamining_recblr_tpu.parallel.sharding import (
        param_pspecs,
        shard_params,
    )

    T_LONG = 1024
    n_items = _SCATTER_MIN_V + 216  # 9216: divides the model axis
    b = 8
    over = {
        "hidden_size": 16,
        "num_layers": 2,
        "use_pallas_scan": "always",
        "dropout_prob": 0.0,
        "MAX_ITEM_LIST_LENGTH": T_LONG,
    }
    cfg_u = Config(model="RecBLR", config_dict=dict(over))
    cfg_m = Config(
        model="RecBLR",
        config_dict=dict(
            over,
            mesh_shape={"data": 4, "model": 2},
            # ~147k table elements is below the auto crossover; force
            # the row-sharded layout this composition exists to test
            vocab_row_shard="always",
        ),
    )
    mesh = make_mesh({"data": 4, "model": 2})
    model_u = RecBLR(cfg_u, n_items=n_items, max_seq_len=T_LONG)
    model_m = RecBLR(cfg_m, n_items=n_items, max_seq_len=T_LONG)
    model_m.mesh = mesh
    assert model_u._use_chunked_layer() and model_m._use_chunked_layer()

    params = model_u.init_params(jax.random.PRNGKey(3))
    specs = param_pspecs(params, mesh, mode="always")
    assert specs["item_embedding"] == jax.sharding.PartitionSpec("model", None)

    rng = _np.random.default_rng(3)
    seqs = _np.zeros((b, T_LONG), _np.int32)
    lens = rng.integers(T_LONG // 2, T_LONG + 1, size=b).astype(_np.int32)
    for i, ln in enumerate(lens):
        seqs[i, :ln] = rng.integers(1, n_items, size=ln)
    pos = rng.integers(1, n_items, size=b).astype(_np.int32)
    batch = {
        "item_seq": jnp.asarray(seqs),
        "item_seq_len": jnp.asarray(lens),
        "pos_item": jnp.asarray(pos),
        "weight": jnp.ones((b,), jnp.float32),
    }
    step_rng = jax.random.PRNGKey(7)

    def loss_u(p):
        return model_u.calculate_loss(p, batch, step_rng)

    def loss_m(p):
        return model_m.calculate_loss(p, shard_batch(batch, mesh), step_rng)

    lu, gu = jax.value_and_grad(loss_u)(params)
    lm, gm = jax.jit(jax.value_and_grad(loss_m))(
        shard_params(params, mesh, mode="always")
    )
    np.testing.assert_allclose(float(lm), float(lu), rtol=2e-4)
    flat_u = jax.tree_util.tree_leaves_with_path(gu)
    flat_m = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(gm)
    }
    for kp, vu in flat_u:
        vm = flat_m[jax.tree_util.keystr(kp)]
        np.testing.assert_allclose(
            np.asarray(vm), np.asarray(vu), rtol=5e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(kp),
        )
