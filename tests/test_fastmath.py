"""fastmath forms must match the standard lowerings to ~1 ulp — the
fused kernels use them for the reference's sigmoid-gate / exp-decay
math (RecBLR.py:196-199), so any drift here is model-math drift."""

import numpy as np

import jax
import jax.numpy as jnp

from datamining_recblr_tpu.ops import fastmath


def _grid():
    return jnp.asarray(
        np.concatenate(
            [
                np.linspace(-30, 30, 20001),
                np.array([0.0, 1e-8, -1e-8, 88.0, -88.0]),
            ]
        ),
        jnp.float32,
    )


def test_exp_matches():
    # relative error of exp2(x*log2e) grows ~|x|*ulp from rounding the
    # scaled argument: ~2e-6 at |x|=30, ~7e-6 at |x|=88
    x = _grid()
    got = np.asarray(fastmath.exp(x))
    want = np.asarray(jnp.exp(x))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sigmoid_matches():
    # the tanh form saturates to exact 0/1 ~1e-7 earlier than the
    # exp-based logistic (values ~1e-13 flush to 0), so the contract is
    # *absolute* accuracy — which is what gate multiplications need
    x = _grid()
    got = np.asarray(fastmath.sigmoid(x))
    want = np.asarray(jax.nn.sigmoid(x))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)
    # relative accuracy where the output is not vanishing (the 0.5+0.5t
    # form carries ~1 ulp of 1.0 absolute error, so relative error for
    # outputs << 1e-3 is inherently coarse — irrelevant for gates)
    mid = np.abs(np.asarray(x)) <= 8.0
    np.testing.assert_allclose(got[mid], want[mid], rtol=3e-4)
    # saturation exactness at the tails
    assert float(fastmath.sigmoid(jnp.float32(40.0))) == 1.0
    assert float(fastmath.sigmoid(jnp.float32(-40.0))) == 0.0


def test_silu_matches():
    x = _grid()
    np.testing.assert_allclose(
        np.asarray(fastmath.silu(x)),
        np.asarray(jax.nn.silu(x)),
        rtol=3e-5,
        atol=3e-6,
    )


def test_grads_match():
    for ours, ref in [
        (fastmath.exp, jnp.exp),
        (fastmath.sigmoid, jax.nn.sigmoid),
    ]:
        g1 = jax.vmap(jax.grad(ours))(jnp.linspace(-10.0, 10.0, 101))
        g2 = jax.vmap(jax.grad(ref))(jnp.linspace(-10.0, 10.0, 101))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)
