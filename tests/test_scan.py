"""Scan op correctness: XLA associative scan vs serial oracle, and the
custom VJP vs numerical/autodiff gradients (the hand-derived backward of
reference parallel_scan.py:97-114)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.scan import (
    linear_scan,
    linear_scan_serial,
    linear_scan_xla,
)


def _rand_case(rng, b=3, t=17, c=5):
    gates = rng.uniform(0.5, 0.999, size=(b, t, c)).astype(np.float32)
    tokens = rng.standard_normal((b, t, c)).astype(np.float32)
    return gates, tokens


def test_forward_matches_serial_oracle():
    rng = np.random.default_rng(0)
    gates, tokens = _rand_case(rng)
    expected = linear_scan_serial(gates, tokens)
    got = np.asarray(linear_scan_xla(jnp.asarray(gates), jnp.asarray(tokens)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t", [1, 2, 7, 16, 33])
def test_forward_various_lengths(t):
    rng = np.random.default_rng(t)
    gates, tokens = _rand_case(rng, b=2, t=t, c=3)
    expected = linear_scan_serial(gates, tokens)
    got = np.asarray(linear_scan(jnp.asarray(gates), jnp.asarray(tokens), impl="xla"))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference_autodiff():
    """Compare the hand-derived VJP against autodiff through a plain
    (non-custom-vjp) scan implementation."""
    rng = np.random.default_rng(42)
    gates, tokens = _rand_case(rng, b=2, t=9, c=4)
    cot = rng.standard_normal(tokens.shape).astype(np.float32)

    def plain_scan(g, x):
        def combine(a, b):
            xa, fa = a
            xb, fb = b
            return xa * fb + xb, fa * fb

        h, _ = jax.lax.associative_scan(combine, (x, g), axis=1)
        return h

    g_j, x_j, c_j = map(jnp.asarray, (gates, tokens, cot))
    _, vjp_plain = jax.vjp(plain_scan, g_j, x_j)
    dg_ref, dx_ref = vjp_plain(c_j)

    _, vjp_custom = jax.vjp(linear_scan_xla, g_j, x_j)
    dg, dx = vjp_custom(c_j)

    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)


def test_custom_vjp_numerical_gradcheck():
    rng = np.random.default_rng(7)
    gates, tokens = _rand_case(rng, b=1, t=5, c=2)

    def loss(g, x):
        return jnp.sum(jnp.sin(linear_scan_xla(g, x)))

    g_j, x_j = jnp.asarray(gates), jnp.asarray(tokens)
    dg, dx = jax.grad(loss, argnums=(0, 1))(g_j, x_j)

    eps = 1e-3
    for idx in [(0, 0, 0), (0, 2, 1), (0, 4, 0)]:
        for arr, grad in [(gates, dg), (tokens, dx)]:
            plus = arr.copy()
            plus[(0,) + idx[1:]] += eps
            minus = arr.copy()
            minus[(0,) + idx[1:]] -= eps
            if arr is gates:
                num = (loss(jnp.asarray(plus), x_j) - loss(jnp.asarray(minus), x_j)) / (2 * eps)
            else:
                num = (loss(g_j, jnp.asarray(plus)) - loss(g_j, jnp.asarray(minus))) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(grad)[(0,) + idx[1:]], float(num), rtol=2e-2, atol=1e-3
            )
