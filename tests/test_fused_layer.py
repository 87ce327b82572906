"""Whole-layer fused kernel vs the unfused composition: forward + full
VJP in deterministic mode (tight tolerance), dropout-mask statistics and
fwd/bwd mask consistency, and model-level equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.fused_layer import fused_recurrent_layer

D, C, K = 64, 128, 4


def _params(rng, use_ffn=True):
    r = lambda *s: jnp.asarray((0.1 * rng.standard_normal(s)).astype(np.float32))
    p = {
        "w_in": r(D, 2 * C),
        "wc": r(K, C),
        "bc": r(C),
        "wg": r(C, 2 * C),
        "bg": r(2 * C),
        "lam": jnp.asarray(np.linspace(-2.2, -6.9, C).astype(np.float32)),
        "w_out": r(C, D),
        "ln1_s": jnp.ones((D,)),
        "ln1_b": jnp.zeros((D,)),
    }
    if use_ffn:
        p.update(
            w1=r(D, 4 * D), b1=r(4 * D), w2=r(4 * D, D), b2=r(D),
            ln2_s=jnp.ones((D,)), ln2_b=jnp.zeros((D,)),
        )
    return p


def _unfused(x, p, use_conv=True, use_ffn=True):
    from datamining_recblr_tpu.ops.conv import causal_depthwise_conv
    from datamining_recblr_tpu.ops.scan import linear_scan_xla

    def ln(v, s, b):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-12) * s + b

    xz = x @ p["w_in"]
    xb, z = jnp.split(xz, 2, axis=-1)
    if use_conv:
        xb = jax.nn.silu(causal_depthwise_conv(xb, p["wc"], p["bc"]))
    g = xb @ p["wg"] + p["bg"]
    r, i = jnp.split(g, 2, axis=-1)
    alpha = jnp.exp(-jax.nn.softplus(p["lam"]) * jax.nn.sigmoid(r))
    beta = jnp.sqrt(1 - alpha**2 + 1e-8) * jax.nn.sigmoid(i)
    h = linear_scan_xla(alpha, beta * xb)
    y = (jax.nn.silu(z) * h) @ p["w_out"]
    r1 = ln(y + x, p["ln1_s"], p["ln1_b"])
    if not use_ffn:
        return r1
    f = jax.nn.silu(r1 @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
    return ln(f + r1, p["ln2_s"], p["ln2_b"])


@pytest.mark.parametrize("use_conv", [True, False])
@pytest.mark.parametrize("use_ffn", [True, False])
def test_fused_layer_forward(use_conv, use_ffn):
    rng = np.random.default_rng(int(use_conv) * 2 + int(use_ffn))
    p = _params(rng, use_ffn=use_ffn)
    if not use_ffn:
        p = {k: v for k, v in p.items() if not k.startswith(("w1", "b1", "w2", "b2", "ln2"))}
    x = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    got = fused_recurrent_layer(x, seed, p, use_conv, use_ffn, 0.0)
    want = _unfused(x, p, use_conv, use_ffn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_fused_layer_vjp():
    rng = np.random.default_rng(7)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((6, 10, D)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((6, 10, D)).astype(np.float32))

    _, vjp_f = jax.vjp(lambda x_, p_: fused_recurrent_layer(x_, seed, p_, True, True, 0.0), x, p)
    dx_f, dp_f = vjp_f(cot)
    _, vjp_u = jax.vjp(lambda x_, p_: _unfused(x_, p_), x, p)
    dx_u, dp_u = vjp_u(cot)

    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_u), rtol=5e-4, atol=5e-5)
    for k in dp_u:
        np.testing.assert_allclose(
            np.asarray(dp_f[k]), np.asarray(dp_u[k]), rtol=5e-4, atol=5e-5,
            err_msg=k,
        )


@pytest.mark.slow
def test_dropout_statistics_and_determinism():
    rng = np.random.default_rng(3)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((8, 16, D)).astype(np.float32))
    seed = jnp.asarray([1234], jnp.int32)

    out1 = fused_recurrent_layer(x, seed, p, True, True, 0.5)
    out2 = fused_recurrent_layer(x, seed, p, True, True, 0.5)
    # same seed -> identical dropout
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    if jax.default_backend() == "tpu":
        # the CPU interpreter stubs the TPU PRNG to zeros, so seed
        # sensitivity is only observable on hardware
        out3 = fused_recurrent_layer(x, jnp.asarray([99], jnp.int32), p, True, True, 0.5)
        assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # p=0 matches deterministic
    out_d = fused_recurrent_layer(x, seed, p, True, True, 0.0)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(_unfused(x, p)), rtol=3e-5, atol=3e-5
    )


def test_dropout_grads_consistent_with_fwd():
    """Finite-difference check through the dropout path: the backward
    must regenerate the same masks as the forward."""
    rng = np.random.default_rng(11)
    p = _params(rng, use_ffn=False)
    p = {k: v for k, v in p.items() if not k.startswith(("w1", "b1", "w2", "b2", "ln2"))}
    x = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    seed = jnp.asarray([42], jnp.int32)

    def loss(x_):
        return jnp.sum(jnp.sin(fused_recurrent_layer(x_, seed, p, True, False, 0.4)))

    g = jax.grad(loss)(x)
    eps = 1e-3
    for idx in [(0, 0, 3), (1, 4, 10)]:
        plus = np.asarray(x).copy(); plus[idx] += eps
        minus = np.asarray(x).copy(); minus[idx] -= eps
        num = (loss(jnp.asarray(plus)) - loss(jnp.asarray(minus))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], float(num), rtol=5e-2, atol=1e-3)


def _ln_ref(v, s, b):
    mu = v.mean(-1, keepdims=True)
    var = ((v - mu) ** 2).mean(-1, keepdims=True)
    return (v - mu) * jax.lax.rsqrt(var + 1e-12) * s + b


def test_fused_dropout_ln_forward_and_vjp():
    from datamining_recblr_tpu.ops.fused_layer import fused_dropout_ln

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))

    got = fused_dropout_ln(x, seed, s, b, 0.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ln_ref(x, s, b)), rtol=3e-5, atol=3e-5
    )

    _, vjp_f = jax.vjp(lambda x_, s_, b_: fused_dropout_ln(x_, seed, s_, b_, 0.0), x, s, b)
    _, vjp_u = jax.vjp(lambda x_, s_, b_: _ln_ref(x_, s_, b_), x, s, b)
    for gf, gu, name in zip(vjp_f(cot), vjp_u(cot), ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gu), rtol=5e-4, atol=5e-5, err_msg=name
        )


def test_fused_dropout_ln_mask_replay():
    """Backward must regenerate the forward's dropout mask (finite
    differences through the dropout path)."""
    from datamining_recblr_tpu.ops.fused_layer import fused_dropout_ln

    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    s = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    seed = jnp.asarray([77], jnp.int32)

    out1 = fused_dropout_ln(x, seed, s, b, 0.4)
    out2 = fused_dropout_ln(x, seed, s, b, 0.4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def loss(x_):
        return jnp.sum(jnp.sin(fused_dropout_ln(x_, seed, s, b, 0.4)))

    g = jax.grad(loss)(x)
    eps = 1e-3
    for idx in [(0, 0, 3), (1, 4, 10)]:
        plus = np.asarray(x).copy(); plus[idx] += eps
        minus = np.asarray(x).copy(); minus[idx] -= eps
        num = (loss(jnp.asarray(plus)) - loss(jnp.asarray(minus))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], float(num), rtol=5e-2, atol=1e-3)


@pytest.mark.slow
def test_model_uses_fused_layer_and_matches():
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.models import get_model

    def build(impl):
        cfg = Config(
            model="RecBLR",
            config_dict={
                "hidden_size": 64, "num_layers": 2,
                "use_pallas_scan": impl, "MAX_ITEM_LIST_LENGTH": 14,
            },
        )
        return get_model("RecBLR")(cfg, n_items=77, max_seq_len=14)

    m_f = build("always")
    m_r = build("never")
    assert m_f._use_fused_layer()
    params = m_r.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    lens = rng.integers(1, 15, size=4).astype(np.int32)
    seq = rng.integers(1, 77, size=(4, 14)).astype(np.int32)
    seq = np.where(np.arange(14)[None] < lens[:, None], seq, 0)
    out_f = m_f.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    out_r = m_r.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), rtol=5e-4, atol=5e-5
    )

    batch = {
        "item_seq": jnp.asarray(seq),
        "item_seq_len": jnp.asarray(lens),
        "pos_item": jnp.asarray(rng.integers(1, 77, size=4)),
        "weight": jnp.ones((4,)),
    }
    # grads agree in deterministic-equivalent setting (dropout 0)
    for m in (m_f, m_r):
        m.dropout_prob = 0.0
    gf = jax.grad(lambda p: m_f.calculate_loss(p, batch, jax.random.PRNGKey(1)))(params)
    gr = jax.grad(lambda p: m_r.calculate_loss(p, batch, jax.random.PRNGKey(1)))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)


@pytest.mark.parametrize("use_conv", [True, False])
@pytest.mark.parametrize("use_ffn", [True, False])
def test_fused_layer_last_forward(use_conv, use_ffn):
    from datamining_recblr_tpu.ops.fused_layer import fused_recurrent_layer_last

    rng = np.random.default_rng(31 + int(use_conv) * 2 + int(use_ffn))
    p = _params(rng, use_ffn=use_ffn)
    if not use_ffn:
        p = {k: v for k, v in p.items() if not k.startswith(("w1", "b1", "w2", "b2", "ln2"))}
    x = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, 13, size=5), jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    got = fused_recurrent_layer_last(x, lens, seed, p, use_conv, use_ffn, 0.0)
    full = _unfused(x, p, use_conv, use_ffn)
    want = jnp.take_along_axis(full, (lens - 1)[:, None, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_fused_layer_last_vjp():
    from datamining_recblr_tpu.ops.fused_layer import fused_recurrent_layer_last

    rng = np.random.default_rng(37)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((6, 10, D)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, 11, size=6), jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((6, D)).astype(np.float32))

    def full_then_gather(x_, p_):
        full = _unfused(x_, p_)
        return jnp.take_along_axis(full, (lens - 1)[:, None, None], axis=1)[:, 0]

    _, vjp_f = jax.vjp(
        lambda x_, p_: fused_recurrent_layer_last(x_, lens, seed, p_, True, True, 0.0),
        x, p,
    )
    dx_f, dp_f = vjp_f(cot)
    _, vjp_u = jax.vjp(full_then_gather, x, p)
    dx_u, dp_u = vjp_u(cot)

    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_u), rtol=5e-4, atol=5e-5)
    for k in dp_u:
        np.testing.assert_allclose(
            np.asarray(dp_f[k]), np.asarray(dp_u[k]), rtol=5e-4, atol=5e-5,
            err_msg=k,
        )


@pytest.mark.slow
def test_fused_layer_last_dropout_mask_replay():
    """The last-variant's dropout path must agree with the full kernel +
    gather under the same seed (both replay in-kernel PRNG masks), and
    with finite differences at the last position, where gradients are
    large enough for f32 FD resolution."""
    from datamining_recblr_tpu.ops.fused_layer import (
        fused_recurrent_layer,
        fused_recurrent_layer_last,
    )

    rng = np.random.default_rng(41)
    p = _params(rng, use_ffn=False)
    p = {k: v for k, v in p.items() if not k.startswith(("w1", "b1", "w2", "b2", "ln2"))}
    x = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    lens = jnp.asarray([4, 6], jnp.int32)
    seed = jnp.asarray([42], jnp.int32)

    def loss(x_):
        return jnp.sum(
            jnp.sin(fused_recurrent_layer_last(x_, lens, seed, p, True, False, 0.4))
        )

    def loss_full(x_):
        full = fused_recurrent_layer(x_, seed, p, True, False, 0.4)
        g = jnp.take_along_axis(full, (lens - 1)[:, None, None], axis=1)[:, 0]
        return jnp.sum(jnp.sin(g))

    g = jax.grad(loss)(x)
    # NOTE: on CPU the interpreter stubs PRNG bits to zeros (all-keep
    # masks), so the two kernels see identical masks; on hardware their
    # streams differ (different shapes drawn), so only compare off-TPU.
    if jax.default_backend() != "tpu":
        g_full = jax.grad(loss_full)(x)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_full), rtol=1e-5, atol=1e-6
        )
    eps = 1e-3
    for idx in [(0, 3, 3), (1, 5, 10)]:  # last valid positions
        plus = np.asarray(x).copy(); plus[idx] += eps
        minus = np.asarray(x).copy(); minus[idx] -= eps
        num = (loss(jnp.asarray(plus)) - loss(jnp.asarray(minus))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], float(num), rtol=5e-2, atol=2e-3)


def test_fused_ln_dropout_forward_and_vjp():
    from datamining_recblr_tpu.ops.fused_layer import fused_ln_dropout

    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))

    pos = jnp.asarray(0.3 * rng.standard_normal((12, D)).astype(np.float32))
    got = fused_ln_dropout(x, pos, seed, s, b, 0.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ln_ref(x + pos[None], s, b)),
        rtol=3e-5, atol=3e-5,
    )

    _, vjp_f = jax.vjp(
        lambda x_, p_, s_, b_: fused_ln_dropout(x_, p_, seed, s_, b_, 0.0),
        x, pos, s, b,
    )
    _, vjp_u = jax.vjp(
        lambda x_, p_, s_, b_: _ln_ref(x_ + p_[None], s_, b_), x, pos, s, b
    )
    for gf, gu, name in zip(vjp_f(cot), vjp_u(cot), ("dx", "dpos", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gu), rtol=5e-4, atol=5e-5, err_msg=name
        )


def test_fused_ln_dropout_mask_replay():
    from datamining_recblr_tpu.ops.fused_layer import fused_ln_dropout

    rng = np.random.default_rng(52)
    x = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    s = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    seed = jnp.asarray([77], jnp.int32)

    pos0 = jnp.zeros((6, D), jnp.float32)
    out1 = fused_ln_dropout(x, pos0, seed, s, b, 0.4)
    out2 = fused_ln_dropout(x, pos0, seed, s, b, 0.4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def loss(x_):
        return jnp.sum(jnp.sin(fused_ln_dropout(x_, pos0, seed, s, b, 0.4)))

    g = jax.grad(loss)(x)
    eps = 1e-3
    for idx in [(0, 0, 3), (1, 4, 10)]:
        plus = np.asarray(x).copy(); plus[idx] += eps
        minus = np.asarray(x).copy(); minus[idx] -= eps
        num = (loss(jnp.asarray(plus)) - loss(jnp.asarray(minus))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], float(num), rtol=5e-2, atol=1e-3)


@pytest.mark.slow
def test_fused_layer_last_dropout_replay_across_blocks():
    """fwd and bwd of the last-variant must share one block-to-row
    mapping or the seed+program_id dropout replay silently breaks on
    multi-block batches (the PRNG draws would come from different
    seeds/shapes per row).  Checks the shared helper and that masks
    replay on a batch spanning several blocks."""
    from datamining_recblr_tpu.ops import fused_layer as FL

    for t in (8, 50, 200, 400, 512):
        assert FL._last_block_rows(t) >= 1
    # multi-block batch: B=40 at T=8 -> several blocks in both directions
    rng = np.random.default_rng(61)
    p = _params(rng, use_ffn=False)
    p = {k: v for k, v in p.items() if not k.startswith(("w1", "b1", "w2", "b2", "ln2"))}
    x = jnp.asarray(rng.standard_normal((40, 8, D)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, 9, size=40), jnp.int32)
    seed = jnp.asarray([5], jnp.int32)

    def loss(x_):
        return jnp.sum(
            jnp.sin(FL.fused_recurrent_layer_last(x_, lens, seed, p, True, False, 0.4))
        )

    g = jax.grad(loss)(x)
    # FD at a last position of a row in a late block
    eps = 1e-3
    idx = (37, int(lens[37]) - 1, 5)
    plus = np.asarray(x).copy(); plus[idx] += eps
    minus = np.asarray(x).copy(); minus[idx] -= eps
    num = (loss(jnp.asarray(plus)) - loss(jnp.asarray(minus))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[idx], float(num), rtol=5e-2, atol=2e-3)


@pytest.mark.slow
def test_fused_layer_prologue_forward_and_vjp():
    """prologue=True folds dropout->LN before the layer; at p=0 it must
    equal LN then the layer, with grads for pl_s/pl_b."""
    from datamining_recblr_tpu.ops.fused_layer import fused_recurrent_layer

    rng = np.random.default_rng(71)
    p = _params(rng)
    p["pl_s"] = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    p["pl_b"] = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((5, 12, D)).astype(np.float32))

    def ref(x_, p_):
        xn = _ln_ref(x_, p_["pl_s"], p_["pl_b"])
        core = {k: v for k, v in p_.items() if not k.startswith("pl_")}
        return _unfused(xn, core)

    got = fused_recurrent_layer(x, seed, p, True, True, 0.0, False, True)
    want = ref(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)

    _, vjp_f = jax.vjp(
        lambda x_, p_: fused_recurrent_layer(x_, seed, p_, True, True, 0.0, False, True),
        x, p,
    )
    dx_f, dp_f = vjp_f(cot)
    _, vjp_u = jax.vjp(ref, x, p)
    dx_u, dp_u = vjp_u(cot)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_u), rtol=5e-4, atol=5e-5)
    for k in dp_u:
        np.testing.assert_allclose(
            np.asarray(dp_f[k]), np.asarray(dp_u[k]), rtol=5e-4, atol=6e-5,
            err_msg=k,
        )


@pytest.mark.slow
def test_fused_layer_prologue_dropout_replay():
    """FD through the fused prologue's dropout path (multi-block)."""
    from datamining_recblr_tpu.ops.fused_layer import fused_recurrent_layer

    rng = np.random.default_rng(72)
    p = _params(rng, use_ffn=False)
    p = {k: v for k, v in p.items() if not k.startswith(("w1", "b1", "w2", "b2", "ln2"))}
    p["pl_s"] = jnp.ones((D,), jnp.float32)
    p["pl_b"] = jnp.zeros((D,), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    seed = jnp.asarray([9], jnp.int32)

    def loss(x_):
        return jnp.sum(
            jnp.sin(fused_recurrent_layer(x_, seed, p, True, False, 0.4, False, True))
        )

    g = jax.grad(loss)(x)
    eps = 1e-3
    for idx in [(0, 5, 3), (1, 4, 10)]:
        plus = np.asarray(x).copy(); plus[idx] += eps
        minus = np.asarray(x).copy(); minus[idx] -= eps
        num = (loss(jnp.asarray(plus)) - loss(jnp.asarray(minus))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], float(num), rtol=5e-2, atol=2e-3)


@pytest.mark.slow
def test_stash_backward_matches_recompute():
    """The h-stash backward (forward saves the scan output; backward
    skips its forward scan) must produce identical dx and grads to the
    recompute backward, stash padding included (non-multiple batch)."""
    from datamining_recblr_tpu.ops import fused_layer as FL

    rng = np.random.default_rng(5)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((11, 24, D)).astype(np.float32))
    dout = jnp.asarray(rng.standard_normal((11, 24, D)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    dx1, g1 = FL._layer_bwd(x, dout, seed, p, True, True, 0.0, block_rows=4)
    out, stash = FL._layer_fwd(
        x, seed, p, True, True, 0.0, block_rows=4, stash=True
    )
    assert len(stash) == len(FL._stash_names(True, True))
    dx2, g2 = FL._layer_bwd(
        x, dout, seed, p, True, True, 0.0, block_rows=4, stash_vals=stash
    )
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), atol=1e-4, err_msg=k
        )


@pytest.mark.slow
def test_stash_backward_matches_recompute_with_dropout():
    """Same stash-vs-recompute contract with dropout_p > 0: the stash
    backward must replay the SAME mask draw order as the recompute
    backward (per-chain seeding in _bwd_kernel_multi).  CPU interpret
    stubs PRNG bits (all-keep masks), so this exercises the draw-order
    plumbing; benchmarks/stash_dropout_check.py runs the same
    comparison with real random masks on hardware."""
    from datamining_recblr_tpu.ops import fused_layer as FL

    rng = np.random.default_rng(15)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((8, 16, D)).astype(np.float32))
    dout = jnp.asarray(rng.standard_normal((8, 16, D)).astype(np.float32))
    seed = jnp.asarray([7], jnp.int32)
    dx1, g1 = FL._layer_bwd(x, dout, seed, p, True, True, 0.3, block_rows=4)
    _, stash = FL._layer_fwd(
        x, seed, p, True, True, 0.3, block_rows=4, stash=True
    )
    dx2, g2 = FL._layer_bwd(
        x, dout, seed, p, True, True, 0.3, block_rows=4, stash_vals=stash
    )
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), atol=1e-4, err_msg=k
        )


def test_stash_policy_byte_budget():
    """The stash policy caps the fwd->bwd HBM footprint, not just T: a
    transformer-shaped stash past the budget must fall back to the
    recompute backward (ADVICE r4: O(B*T^2*heads) pr stashes could
    pile past HBM with more heads/layers)."""
    from datamining_recblr_tpu.ops import fused_layer as FL

    assert FL._stash_policy(200, 200 * 2**20)
    assert not FL._stash_policy(300, 1)  # T gate still holds
    assert not FL._stash_policy(200, FL._STASH_BUDGET_BYTES + 1)
    # flagship shapes stay inside the budget
    assert FL._stash_policy(200, 2048 * 200 * (2 * 200 + 64) * 4)  # pr+ctx
    assert FL._stash_policy(200, 2048 * 200 * 128 * 4)  # h stash
    # 8-head transformer at T=256 blows it -> recompute
    assert not FL._stash_policy(256, 2048 * 256 * (8 * 256 + 64) * 4)


@pytest.mark.slow
def test_multichain_backward_matches_single():
    """The independent-chains backward (measured ~neutral on v5e,
    benchmarks/chain_bench.py, kept for the audit record) must stay
    bit-equivalent to the single-chain one."""
    from datamining_recblr_tpu.ops import fused_layer as FL

    rng = np.random.default_rng(6)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((16, 20, D)).astype(np.float32))
    dout = jnp.asarray(rng.standard_normal((16, 20, D)).astype(np.float32))
    seed = jnp.zeros((1,), jnp.int32)
    dx1, g1 = FL._layer_bwd(x, dout, seed, p, True, True, 0.0, block_rows=4)
    dx2, g2 = FL._layer_bwd(
        x, dout, seed, p, True, True, 0.0, block_rows=4, chains=2
    )
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), atol=1e-4, err_msg=k
        )
