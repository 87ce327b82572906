"""Pallas scan kernel correctness (interpret mode on CPU): forward vs
serial oracle and XLA path; custom VJP vs the XLA custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.pallas_scan import linear_scan_pallas
from datamining_recblr_tpu.ops.scan import linear_scan_serial, linear_scan_xla


def _case(rng, b, t, c):
    gates = rng.uniform(0.3, 0.999, size=(b, t, c)).astype(np.float32)
    tokens = rng.standard_normal((b, t, c)).astype(np.float32)
    return jnp.asarray(gates), jnp.asarray(tokens)


@pytest.mark.parametrize(
    "b,t,c",
    [
        (2, 8, 128),     # exact tile
        (3, 16, 130),    # channel padding
        (10, 24, 64),    # batch + channel padding
        (1, 200, 256),   # model-realistic T (not a power of two)
        (2, 1, 128),     # degenerate length
    ],
)
def test_pallas_forward_matches_oracle(b, t, c):
    rng = np.random.default_rng(b * 1000 + t + c)
    gates, tokens = _case(rng, b, t, c)
    got = np.asarray(linear_scan_pallas(gates, tokens))
    want = linear_scan_serial(np.asarray(gates), np.asarray(tokens))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_grad_matches_xla_custom_vjp():
    rng = np.random.default_rng(99)
    gates, tokens = _case(rng, 3, 12, 140)
    cot = jnp.asarray(rng.standard_normal((3, 12, 140)).astype(np.float32))

    _, vjp_p = jax.vjp(linear_scan_pallas, gates, tokens)
    dg_p, dx_p = vjp_p(cot)
    _, vjp_x = jax.vjp(linear_scan_xla, gates, tokens)
    dg_x, dx_x = vjp_x(cot)

    np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x), rtol=1e-5, atol=1e-5)


def test_dispatch_selects_pallas():
    from datamining_recblr_tpu.ops.scan import linear_scan

    rng = np.random.default_rng(5)
    gates, tokens = _case(rng, 2, 8, 128)
    out = linear_scan(gates, tokens, impl="pallas")
    want = linear_scan_serial(np.asarray(gates), np.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)
