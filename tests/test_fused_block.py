"""Fused whole-transformer-layer kernel vs the XLA composition.

Checks forward and gradient parity of ops/fused_block.py (interpret
mode on CPU) against the per-op path in models/layers.py with dropout
disabled, across causal/bidirectional masks and activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.models import layers as L
from datamining_recblr_tpu.ops import fused_block as FB


def _nested_to_flat(p):
    return {
        "w_q": p["q"]["w"], "b_q": p["q"]["b"],
        "w_k": p["k"]["w"], "b_k": p["k"]["b"],
        "w_v": p["v"]["w"], "b_v": p["v"]["b"],
        "w_o": p["attn_out"]["w"], "b_o": p["attn_out"]["b"],
        "ln1_s": p["attn_ln"]["scale"], "ln1_b": p["attn_ln"]["bias"],
        "w1": p["ffn_1"]["w"], "b1": p["ffn_1"]["b"],
        "w2": p["ffn_2"]["w"], "b2": p["ffn_2"]["b"],
        "ln2_s": p["ffn_ln"]["scale"], "ln2_b": p["ffn_ln"]["bias"],
    }


def _setup(seed=0, b=4, t=12, d=16, n_heads=2, inner=32):
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    layers = L.transformer_encoder_init(k1, 1, n_heads, d, inner)
    x = 0.5 * jax.random.normal(k2, (b, t, d), jnp.float32)
    lens = jax.random.randint(k3, (b,), 1, t + 1).astype(jnp.int32)
    item_seq = jnp.where(
        jnp.arange(t)[None, :] < lens[:, None],
        jnp.ones((b, t), jnp.int32),
        0,
    )
    return layers, x, lens, item_seq


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("act", ["gelu", "relu", "silu"])
def test_fused_block_forward_matches_xla(causal, act):
    layers, x, lens, item_seq = _setup()
    mask = L.attention_mask(item_seq, bidirectional=not causal)
    ref = L.transformer_encoder_apply(
        layers, x, mask, n_heads=2, hidden_dropout=0.0, attn_dropout=0.0,
        hidden_act=act, deterministic=True, rng=None,
    )
    fp = _nested_to_flat(layers[0])
    seed = jnp.zeros((1,), jnp.int32)
    out = FB.fused_transformer_layer(x, lens, seed, fp, causal, 2, 0.0, 0.0, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.slow
def test_fused_block_grads_match_xla(causal):
    layers, x, lens, item_seq = _setup(seed=1)
    mask = L.attention_mask(item_seq, bidirectional=not causal)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_ref(x, nested):
        out = L.transformer_encoder_apply(
            [nested], x, mask, n_heads=2, hidden_dropout=0.0,
            attn_dropout=0.0, hidden_act="gelu", deterministic=True, rng=None,
        )
        return jnp.sum(out * out)

    def loss_fused(x, nested):
        out = FB.fused_transformer_layer(
            x, lens, seed, _nested_to_flat(nested), causal, 2, 0.0, 0.0, "gelu"
        )
        return jnp.sum(out * out)

    gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x, layers[0])
    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, layers[0])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(gp_ref)
    flat, _ = jax.tree_util.tree_flatten_with_path(gp)
    for (path_r, g_r), (path, g) in zip(flat_ref, flat):
        assert path_r == path
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_r), atol=3e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_block_multihead_supports_gate():
    assert FB.supports(64, 2, 256, 200, "gelu")
    assert not FB.supports(256, 2, 256, 200, "gelu")  # d too large
    assert not FB.supports(64, 3, 256, 200, "gelu")   # d % heads != 0
    assert not FB.supports(64, 2, 256, 2048, "gelu")  # t too long
    assert not FB.supports(64, 2, 256, 200, "mish")   # unsupported act


@pytest.mark.slow
def test_sasrec_forward_with_fused_block(monkeypatch):
    """End-to-end: SASRec forward through the fused encoder path
    (forced on CPU interpret mode) matches the default composition."""
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.models import get_model

    cfg = Config(
        model="SASRec",
        config_dict={"MAX_ITEM_LIST_LENGTH": 12, "hidden_size": 16,
                     "inner_size": 32, "n_layers": 2, "n_heads": 2},
    )
    model = get_model("SASRec")(cfg, n_items=50, max_seq_len=12)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 13, size=6).astype(np.int32)
    seq = rng.integers(1, 50, size=(6, 12)).astype(np.int32)
    seq = np.where(np.arange(12)[None] < lens[:, None], seq, 0)
    seq, lens = jnp.asarray(seq), jnp.asarray(lens)

    ref = model.forward(params, seq, lens)
    monkeypatch.setattr(L, "_use_fused_attention", lambda: True)
    got = model.forward(params, seq, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_block_four_heads():
    layers, x, lens, item_seq = _setup(seed=2, d=32, n_heads=4, inner=64)
    mask = L.attention_mask(item_seq, bidirectional=False)
    ref = L.transformer_encoder_apply(
        layers, x, mask, n_heads=4, hidden_dropout=0.0, attn_dropout=0.0,
        hidden_act="gelu", deterministic=True, rng=None,
    )
    fp = _nested_to_flat(layers[0])
    seed = jnp.zeros((1,), jnp.int32)
    out = FB.fused_transformer_layer(x, lens, seed, fp, True, 4, 0.0, 0.0, "gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("act", ["gelu", "silu"])
def test_fused_block_last_forward_matches_full(act):
    layers, x, lens, item_seq = _setup(seed=5)
    fp = _nested_to_flat(layers[0])
    seed = jnp.zeros((1,), jnp.int32)
    full = FB.fused_transformer_layer(x, lens, seed, fp, True, 2, 0.0, 0.0, act)
    want = jnp.take_along_axis(full, (lens - 1)[:, None, None], axis=1)[:, 0]
    got = FB.fused_transformer_layer_last(x, lens, seed, fp, 2, 0.0, 0.0, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_block_last_grads_match_full():
    layers, x, lens, item_seq = _setup(seed=6)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_full(x, nested):
        out = FB.fused_transformer_layer(
            x, lens, seed, _nested_to_flat(nested), True, 2, 0.0, 0.0, "gelu"
        )
        g = jnp.take_along_axis(out, (lens - 1)[:, None, None], axis=1)[:, 0]
        return jnp.sum(g * g)

    def loss_last(x, nested):
        g = FB.fused_transformer_layer_last(
            x, lens, seed, _nested_to_flat(nested), 2, 0.0, 0.0, "gelu"
        )
        return jnp.sum(g * g)

    gx_ref, gp_ref = jax.grad(loss_full, argnums=(0, 1))(x, layers[0])
    gx, gp = jax.grad(loss_last, argnums=(0, 1))(x, layers[0])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, ref in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat[path]), np.asarray(ref), atol=3e-4,
            err_msg=str(path),
        )


def test_sasrec_last_only_matches_fallback(monkeypatch):
    """SASRec fused path (with the last-query top layer) vs the XLA
    fallback, model-level."""
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.models import get_model

    cfg = Config(
        model="SASRec",
        config_dict={
            "hidden_size": 16, "n_layers": 2, "n_heads": 2,
            "inner_size": 32, "MAX_ITEM_LIST_LENGTH": 12,
        },
    )
    m = get_model("SASRec")(cfg, n_items=50, max_seq_len=12)
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    lens = rng.integers(1, 13, size=5).astype(np.int32)
    seq = rng.integers(1, 50, size=(5, 12)).astype(np.int32)
    seq = np.where(np.arange(12)[None] < lens[:, None], seq, 0)

    monkeypatch.setattr(L, "_use_fused_attention", lambda: True)
    out_f = m.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    monkeypatch.setattr(L, "_use_fused_attention", lambda: False)
    out_r = m.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=5e-5)


def test_fused_block_sel_forward_matches_full():
    layers, x, lens, item_seq = _setup(seed=7)
    fp = _nested_to_flat(layers[0])
    seed = jnp.zeros((1,), jnp.int32)
    b, t = x.shape[0], x.shape[1]
    rng = np.random.default_rng(8)
    sel = jnp.asarray(
        np.stack([rng.choice(t, size=3, replace=False) for _ in range(b)]),
        jnp.int32,
    )
    full = FB.fused_transformer_layer(x, lens, seed, fp, False, 2, 0.0, 0.0, "gelu")
    want = jnp.take_along_axis(full, sel[..., None], axis=1)
    got = FB.fused_transformer_layer_sel(x, lens, sel, seed, fp, 2, 0.0, 0.0, "gelu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_block_sel_grads_match_full():
    layers, x, lens, item_seq = _setup(seed=9)
    seed = jnp.zeros((1,), jnp.int32)
    b, t = x.shape[0], x.shape[1]
    rng = np.random.default_rng(10)
    sel = jnp.asarray(
        np.stack([rng.choice(t, size=3, replace=False) for _ in range(b)]),
        jnp.int32,
    )

    def loss_full(x, nested):
        out = FB.fused_transformer_layer(
            x, lens, seed, _nested_to_flat(nested), False, 2, 0.0, 0.0, "gelu"
        )
        g = jnp.take_along_axis(out, sel[..., None], axis=1)
        return jnp.sum(g * g)

    def loss_sel(x, nested):
        g = FB.fused_transformer_layer_sel(
            x, lens, sel, seed, _nested_to_flat(nested), 2, 0.0, 0.0, "gelu"
        )
        return jnp.sum(g * g)

    gx_ref, gp_ref = jax.grad(loss_full, argnums=(0, 1))(x, layers[0])
    gx, gp = jax.grad(loss_sel, argnums=(0, 1))(x, layers[0])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, ref in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat[path]), np.asarray(ref), atol=3e-4,
            err_msg=str(path),
        )


@pytest.mark.slow
def test_bert4rec_fused_sel_matches_fallback(monkeypatch):
    """BERT4Rec loss and eval forward: fused selected-positions path vs
    the XLA fallback (dropout off so paths are comparable)."""
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.models import get_model

    cfg = Config(
        model="BERT4Rec",
        config_dict={
            "hidden_size": 16, "n_layers": 2, "n_heads": 2,
            "inner_size": 32, "MAX_ITEM_LIST_LENGTH": 12,
            "hidden_dropout_prob": 0.0, "attn_dropout_prob": 0.0,
            "mask_ratio": 0.3,
        },
    )
    m = get_model("BERT4Rec")(cfg, n_items=50, max_seq_len=12)
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    lens = rng.integers(2, 13, size=6).astype(np.int32)
    seq = rng.integers(1, 50, size=(6, 12)).astype(np.int32)
    seq = np.where(np.arange(12)[None] < lens[:, None], seq, 0)
    batch = {
        "item_seq": jnp.asarray(seq),
        "item_seq_len": jnp.asarray(lens),
        "pos_item": jnp.asarray(rng.integers(1, 50, size=6).astype(np.int32)),
        "weight": jnp.ones((6,), jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    monkeypatch.setattr(L, "_use_fused_attention", lambda: True)
    loss_f = float(m.calculate_loss(params, batch, key))
    fwd_f = m.forward(params, batch["item_seq"], batch["item_seq_len"])
    monkeypatch.setattr(L, "_use_fused_attention", lambda: False)
    loss_r = float(m.calculate_loss(params, batch, key))
    fwd_r = m.forward(params, batch["item_seq"], batch["item_seq_len"])
    np.testing.assert_allclose(loss_f, loss_r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fwd_f), np.asarray(fwd_r), atol=5e-5)


@pytest.mark.slow
def test_block_stash_backward_matches_recompute():
    """The attention pr/ctx stash backward must produce identical dx
    and grads to the recompute backward for the full block kernel and
    the selected-positions kernel."""
    import sys

    import datamining_recblr_tpu.ops.fused_block  # noqa: F401
    FB = sys.modules["datamining_recblr_tpu.ops.fused_block"]

    rng = np.random.default_rng(7)
    d, h, t, b, s_n = 8, 2, 16, 11, 4
    mk = lambda s_: jnp.asarray(  # noqa: E731
        (0.1 * rng.standard_normal(s_)).astype(np.float32)
    )
    p = {
        "w_q": mk((d, d)), "b_q": mk((d,)), "w_k": mk((d, d)),
        "b_k": mk((d,)), "w_v": mk((d, d)), "b_v": mk((d,)),
        "w_o": mk((d, d)), "b_o": mk((d,)),
        "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "w1": mk((d, 4 * d)), "b1": mk((4 * d,)), "w2": mk((4 * d, d)),
        "b2": mk((d,)), "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
    }
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    dout = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(2, t + 1, size=b), jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)

    dx1, g1 = FB._block_bwd(
        x, lens, dout, seed, p, True, h, 0.0, 0.0, "gelu", block_rows=4
    )
    _, stash = FB._block_fwd(
        x, lens, seed, p, True, h, 0.0, 0.0, "gelu", block_rows=4, stash=True
    )
    dx2, g2 = FB._block_bwd(
        x, lens, dout, seed, p, True, h, 0.0, 0.0, "gelu", block_rows=4,
        stash_vals=stash,
    )
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), atol=1e-4, err_msg=k
        )

    idx = jnp.asarray(rng.integers(0, 4, size=(b, s_n)), jnp.int32)
    dsel = jnp.asarray(rng.standard_normal((b, s_n, d)).astype(np.float32))
    dx1, g1 = FB._block_sel_bwd(
        x, lens, idx, dsel, seed, p, h, 0.0, 0.0, "gelu", block_rows=4
    )
    _, stash = FB._block_sel_fwd(
        x, lens, idx, seed, p, h, 0.0, 0.0, "gelu", block_rows=4, stash=True
    )
    dx2, g2 = FB._block_sel_bwd(
        x, lens, idx, dsel, seed, p, h, 0.0, 0.0, "gelu", block_rows=4,
        stash_vals=stash,
    )
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), atol=1e-4, err_msg=k
        )
