"""RecBLR model parity: forward pass vs an independent NumPy oracle that
follows the reference math (reference RecBLR.py:75-84,170-207,210-227)
step by step, sharing the same parameter values."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.models.recblr import RecBLR


def _np_softplus(x):
    return np.log1p(np.exp(x))


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_silu(x):
    return x * _np_sigmoid(x)


def _np_layer_norm(x, scale, bias, eps=1e-12):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def _np_serial_scan(alpha, tokens):
    # [B, T, C] serial recurrence
    h = np.zeros_like(tokens[:, 0])
    out = np.zeros_like(tokens)
    for t in range(tokens.shape[1]):
        h = alpha[:, t] * h + tokens[:, t]
        out[:, t] = h
    return out


def _np_forward(params, item_seq, item_seq_len, model):
    p = jax.tree.map(np.asarray, params)
    x = p["item_embedding"][item_seq]
    x = _np_layer_norm(x, p["input_ln"]["scale"], p["input_ln"]["bias"])
    for layer in p["layers"]:
        grl = layer["grl"]
        xz = x @ grl["w_in"]
        xb, z = np.split(xz, 2, axis=-1)
        if not model.disable_conv1d:
            # causal depthwise conv: y_t = b + sum_k w[k]*x[t-(K-1)+k]
            k = grl["conv_w"].shape[0]
            y = np.zeros_like(xb)
            for t in range(xb.shape[1]):
                acc = grl["conv_b"].copy()
                for j in range(k):
                    src = t - (k - 1) + j
                    if src >= 0:
                        acc = acc + grl["conv_w"][j] * xb[:, src]
                y[:, t] = acc
            xb = _np_silu(y)
        g = xb @ grl["w_gates"] + grl["b_gates"]
        rec, inp = np.split(g, 2, axis=-1)
        alpha = np.exp(-_np_softplus(grl["Lambda"]) * _np_sigmoid(rec))
        beta = np.sqrt(1.0 - alpha**2 + 1e-8) * _np_sigmoid(inp)
        h = _np_serial_scan(alpha, beta * xb)
        out = (_np_silu(z) * h) @ grl["w_out"]
        x = _np_layer_norm(out + x, layer["ln"]["scale"], layer["ln"]["bias"])
        if not model.disable_ffn:
            ffn = layer["ffn"]
            y = _np_silu(x @ ffn["w1"]["w"] + ffn["w1"]["b"])
            y = y @ ffn["w2"]["w"] + ffn["w2"]["b"]
            x = _np_layer_norm(y + x, ffn["ln"]["scale"], ffn["ln"]["bias"])
    idx = np.clip(item_seq_len - 1, 0, x.shape[1] - 1)
    return x[np.arange(x.shape[0]), idx]


def _make_model(**overrides):
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16,
            "num_layers": 2,
            "expand": 2,
            "d_conv": 4,
            "use_pallas_scan": "never",
            **overrides,
        },
    )
    return RecBLR(cfg, n_items=37, max_seq_len=12)


def _rand_batch(rng, n_items=37, b=4, t=12):
    lens = rng.integers(1, t + 1, size=b)
    seq = np.zeros((b, t), np.int32)
    for i, l in enumerate(lens):
        seq[i, :l] = rng.integers(1, n_items, size=l)
    return seq, lens.astype(np.int32)


def test_forward_matches_numpy_oracle():
    model = _make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    seq, lens = _rand_batch(rng)
    got = np.asarray(model.forward(params, jnp.asarray(seq), jnp.asarray(lens)))
    want = _np_forward(params, seq, lens, model)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ablation_flags():
    for overrides in [
        {"bd_lru_only": True},
        {"disable_conv1d": True},
        {"disable_ffn": True},
    ]:
        model = _make_model(**overrides)
        params = model.init_params(jax.random.PRNGKey(2))
        rng = np.random.default_rng(3)
        seq, lens = _rand_batch(rng)
        got = np.asarray(model.forward(params, jnp.asarray(seq), jnp.asarray(lens)))
        want = _np_forward(params, seq, lens, model)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # bd_lru_only forces both conv1d and ffn off (reference RecBLR.py:33-35)
    m = _make_model(bd_lru_only=True)
    assert m.disable_conv1d and m.disable_ffn


@pytest.mark.slow
def test_loss_and_grads_finite():
    model = _make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    seq, lens = _rand_batch(rng)
    batch = {
        "item_seq": jnp.asarray(seq),
        "item_seq_len": jnp.asarray(lens),
        "pos_item": jnp.asarray(rng.integers(1, 37, size=4)),
        "weight": jnp.ones((4,)),
    }

    def loss_fn(p):
        return model.calculate_loss(p, batch, jax.random.PRNGKey(1))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # CE initial loss should be ~ln(n_items)
    assert 2.0 < float(loss) < 6.0


def test_padding_invariance():
    """States at positions <= len-1 must not depend on what's after
    (right padding is causal-safe)."""
    model = _make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    seq, lens = _rand_batch(rng)
    out1 = model.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    # scribble garbage after the sequence end
    seq2 = seq.copy()
    for i, l in enumerate(lens):
        seq2[i, l:] = rng.integers(1, 37, size=seq.shape[1] - l)
    out2 = model.forward(params, jnp.asarray(seq2), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5)
