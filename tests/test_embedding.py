"""Embedding-gradient op: Pallas / XLA one-hot paths vs the scatter oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.embedding import (
    _bwd_pallas,
    _bwd_xla,
    embedding_lookup,
)


def _oracle(flat_ids, flat_g, v, d):
    out = np.zeros((v, d), np.float32)
    for i, g in zip(np.asarray(flat_ids), np.asarray(flat_g)):
        out[i] += g
    return out


@pytest.mark.parametrize("v,d,n", [(300, 64, 1000), (131, 8, 77), (4500, 16, 513)])
def test_pallas_grad_matches_oracle(v, d, n):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    g = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    want = _oracle(ids, g, v, d)
    got = np.asarray(_bwd_pallas(ids, g, v, d))
    # bf16 matmul rounding on the cotangents
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_xla_grad_matches_oracle():
    rng = np.random.default_rng(1)
    v, d, n = 500, 32, 2048
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    g = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    want = _oracle(ids, g, v, d)
    got = np.asarray(_bwd_xla(ids, g, v, d))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_custom_vjp_matches_gather_grad():
    rng = np.random.default_rng(2)
    v, d = 97, 16
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, (4, 9)), jnp.int32)

    def loss_custom(t):
        return jnp.sum(jnp.sin(embedding_lookup(t, ids)))

    def loss_plain(t):
        return jnp.sum(jnp.sin(t[ids]))

    g1 = jax.grad(loss_custom)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-2, atol=2e-2)
