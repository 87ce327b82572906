"""Sequence-parallel scan across the virtual device mesh vs the serial
oracle, including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.scan import linear_scan_serial, linear_scan_xla
from datamining_recblr_tpu.ops.seq_parallel_scan import seq_parallel_scan
from datamining_recblr_tpu.parallel import make_mesh

pytestmark = pytest.mark.slow  # heavy multi-device trajectory pins


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"seq": 8})


def _case(rng, b=3, t=32, c=5):
    gates = rng.uniform(0.4, 0.999, size=(b, t, c)).astype(np.float32)
    tokens = rng.standard_normal((b, t, c)).astype(np.float32)
    return jnp.asarray(gates), jnp.asarray(tokens)


@pytest.mark.parametrize("t", [8, 32, 64])
def test_matches_serial_oracle(mesh, t):
    rng = np.random.default_rng(t)
    gates, tokens = _case(rng, t=t)
    got = np.asarray(seq_parallel_scan(gates, tokens, mesh, "seq", impl="xla"))
    want = linear_scan_serial(np.asarray(gates), np.asarray(tokens))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gradients_match_single_device(mesh):
    rng = np.random.default_rng(9)
    gates, tokens = _case(rng, b=2, t=16, c=4)
    cot = jnp.asarray(rng.standard_normal((2, 16, 4)).astype(np.float32))

    _, vjp_sp = jax.vjp(
        lambda g, x: seq_parallel_scan(g, x, mesh, "seq", impl="xla"),
        gates, tokens,
    )
    dg_sp, dx_sp = vjp_sp(cot)
    _, vjp_1d = jax.vjp(linear_scan_xla, gates, tokens)
    dg, dx = vjp_1d(cot)

    np.testing.assert_allclose(np.asarray(dg_sp), np.asarray(dg), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_sp), np.asarray(dx), rtol=1e-4, atol=1e-5)


def test_rejects_indivisible_t(mesh):
    rng = np.random.default_rng(1)
    gates, tokens = _case(rng, t=12)
    with pytest.raises(ValueError):
        seq_parallel_scan(gates, tokens, mesh, "seq")
