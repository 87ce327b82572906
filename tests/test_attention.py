"""Fused attention kernel vs the XLA einsum reference: forward and VJP
with causal + key-padding masks (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.attention import fused_attention


def _reference(q, k, v, lens, causal):
    b, h, t, dh = q.shape
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(dh))
    col = jnp.arange(t)[None, :]
    keep = col < lens[:, None]
    keep = keep[:, None, None, :]
    if causal:
        causal_m = jnp.tril(jnp.ones((t, t), bool))[None, None]
        keep = jnp.logical_and(keep, causal_m)
    scores = scores + jnp.where(keep, 0.0, -10000.0)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _case(rng, b=5, h=2, t=16, dh=32):
    q = jnp.asarray(rng.standard_normal((b, h, t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, dh)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, t + 1, size=b).astype(np.int32))
    return q, k, v, lens


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("t", [8, 16, 24])
def test_fused_attention_forward(causal, t):
    rng = np.random.default_rng(t + int(causal))
    q, k, v, lens = _case(rng, t=t)
    seed = jnp.zeros((1,), jnp.int32)
    got = fused_attention(q, k, v, lens, seed, causal, 0.0)
    want = _reference(q, k, v, lens, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_fused_attention_vjp(causal):
    rng = np.random.default_rng(17 + int(causal))
    q, k, v, lens = _case(rng, b=3, t=12)
    seed = jnp.zeros((1,), jnp.int32)
    cot = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    _, vjp_f = jax.vjp(
        lambda q_, k_, v_: fused_attention(q_, k_, v_, lens, seed, causal, 0.0),
        q, k, v,
    )
    got = vjp_f(cot)
    _, vjp_r = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, lens, causal), q, k, v)
    want = vjp_r(cot)
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5, err_msg=name
        )
