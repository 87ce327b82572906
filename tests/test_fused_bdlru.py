"""Fused BD-LRU kernel (conv + gates + scan) vs the unfused reference
composition: forward and full VJP, interpret mode on CPU; plus
model-level equivalence of the fused and unfused paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.conv import causal_depthwise_conv
from datamining_recblr_tpu.ops.fused_bdlru import fused_bdlru
from datamining_recblr_tpu.ops.scan import linear_scan_xla


def _unfused(x, wc, bc, wg, bg, lam, use_conv=True):
    if use_conv:
        x = jax.nn.silu(causal_depthwise_conv(x, wc, bc))
    g = x @ wg + bg
    c = x.shape[-1]
    r, i = g[..., :c], g[..., c:]
    alpha = jnp.exp(-jax.nn.softplus(lam) * jax.nn.sigmoid(r))
    beta = jnp.sqrt(1.0 - alpha**2 + 1e-8) * jax.nn.sigmoid(i)
    return linear_scan_xla(alpha, beta * x)


def _case(rng, b, t, c, k=4):
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    wc = jnp.asarray((0.3 * rng.standard_normal((k, c))).astype(np.float32))
    bc = jnp.asarray((0.3 * rng.standard_normal((c,))).astype(np.float32))
    wg = jnp.asarray((0.1 * rng.standard_normal((c, 2 * c))).astype(np.float32))
    bg = jnp.asarray((0.1 * rng.standard_normal((2 * c,))).astype(np.float32))
    lam = jnp.asarray(np.linspace(-2.2, -6.9, c).astype(np.float32))
    return x, wc, bc, wg, bg, lam


@pytest.mark.parametrize("b,t,c", [(4, 12, 128), (3, 9, 64), (10, 24, 128)])
@pytest.mark.parametrize("use_conv", [True, False])
def test_fused_forward_matches_unfused(b, t, c, use_conv):
    rng = np.random.default_rng(b + t + c)
    args = _case(rng, b, t, c)
    got = np.asarray(fused_bdlru(*args, use_conv))
    want = np.asarray(_unfused(*args, use_conv))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_conv", [True, False])
@pytest.mark.slow
def test_fused_vjp_matches_unfused(use_conv):
    rng = np.random.default_rng(17)
    args = _case(rng, 5, 10, 128)  # batch not a multiple of BT
    cot = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))

    _, vjp_f = jax.vjp(lambda *a: fused_bdlru(*a, use_conv), *args)
    got = vjp_f(cot)
    _, vjp_u = jax.vjp(lambda *a: _unfused(*a, use_conv), *args)
    want = vjp_u(cot)

    names = ["dx", "dwc", "dbc", "dwg", "dbg", "dlam"]
    for g, w, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=3e-4, atol=3e-5, err_msg=name
        )


@pytest.mark.slow
def test_model_fused_path_matches_unfused_path():
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.models import get_model

    def build(impl):
        cfg = Config(
            model="RecBLR",
            config_dict={
                "hidden_size": 64,
                "num_layers": 2,
                "use_pallas_scan": impl,
                "MAX_ITEM_LIST_LENGTH": 20,
            },
        )
        return get_model("RecBLR")(cfg, n_items=99, max_seq_len=20)

    m_fused = build("always")   # pallas/fused (interpret mode on CPU)
    m_ref = build("never")      # unfused XLA
    params = m_ref.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 21, size=6).astype(np.int32)
    seq = rng.integers(1, 99, size=(6, 20)).astype(np.int32)
    seq = np.where(np.arange(20)[None] < lens[:, None], seq, 0)

    out_f = m_fused.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    out_r = m_ref.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), rtol=2e-4, atol=2e-5
    )

    # grads through the full model agree too
    batch = {
        "item_seq": jnp.asarray(seq),
        "item_seq_len": jnp.asarray(lens),
        "pos_item": jnp.asarray(rng.integers(1, 99, size=6)),
        "weight": jnp.ones((6,)),
    }
    # compare without dropout: the fused path draws masks from the
    # in-kernel TPU PRNG, the reference path from jax.random — same
    # distribution, different bits
    m_fused.dropout_prob = 0.0
    m_ref.dropout_prob = 0.0
    gf = jax.grad(lambda p: m_fused.calculate_loss(p, batch, jax.random.PRNGKey(1)))(params)
    gr = jax.grad(lambda p: m_ref.calculate_loss(p, batch, jax.random.PRNGKey(1)))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)
