"""Fused softmax-CE kernel vs the XLA logsumexp composition (interpret
mode on CPU): forward nll, VJP wrt activations / table / bias, padded
vocab masking, and the BERT4Rec-style bias path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.ops.fused_ce import fused_softmax_ce

NEG = -1e30


def _reference(x, table, targets, bias=None, valid_v=None):
    logits = jnp.dot(
        x.astype(jnp.float32), table.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if valid_v is not None and valid_v < table.shape[0]:
        idx = jnp.arange(table.shape[0])[None, :]
        logits = jnp.where(idx < valid_v, logits, NEG)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    return logz - tgt


def _case(seed=0, n=12, d=8, v=37):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(v).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, v, size=n).astype(np.int32))
    return x, table, bias, targets


def test_fused_ce_forward():
    x, table, bias, targets = _case()
    got = fused_softmax_ce(x, table, targets)
    want = _reference(x, table, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_ce_forward_bias_and_masked_vocab():
    x, table, bias, targets = _case(seed=1)
    valid = table.shape[0] - 5
    targets = jnp.clip(targets, 1, valid - 1)
    got = fused_softmax_ce(x, table, targets, bias=bias, valid_v=valid)
    want = _reference(x, table, targets, bias=bias, valid_v=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_ce_grads(with_bias):
    x, table, bias, targets = _case(seed=2)
    w = jnp.asarray(np.random.default_rng(3).uniform(0, 1, size=x.shape[0]), jnp.float32)

    def loss_fused(x, table, bias):
        nll = fused_softmax_ce(
            x, table, targets, bias=bias if with_bias else None
        )
        return jnp.sum(nll * w)

    def loss_ref(x, table, bias):
        nll = _reference(x, table, targets, bias=bias if with_bias else None)
        return jnp.sum(nll * w)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, table, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, table, bias)
    for g, r, name in zip(got, want, ("dx", "dtable", "dbias")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5,
            err_msg=name,
        )


def test_fused_ce_row_padding():
    # n not a multiple of the block: padded rows must not pollute grads
    x, table, bias, targets = _case(seed=4, n=11)

    def loss(x, table):
        return jnp.sum(fused_softmax_ce(x, table, targets))

    def loss_ref(x, table):
        return jnp.sum(_reference(x, table, targets))

    got = jax.grad(loss, argnums=(0, 1))(x, table)
    want = jax.grad(loss_ref, argnums=(0, 1))(x, table)
    for g, r in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5)


# --- vocab-chunked variant (online logsumexp over table chunks) -------


def test_chunked_ce_forward_multi_chunk():
    # vocab_block=16 over v=37 -> 3 chunks incl. a padded tail
    x, table, bias, targets = _case(seed=7)
    got = fused_softmax_ce(x, table, targets, bias=bias, vocab_block=16)
    want = _reference(x, table, targets, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_chunked_ce_forward_masked_vocab():
    x, table, bias, targets = _case(seed=8)
    valid = table.shape[0] - 5
    targets = jnp.clip(targets, 1, valid - 1)
    got = fused_softmax_ce(
        x, table, targets, bias=bias, valid_v=valid, vocab_block=16
    )
    want = _reference(x, table, targets, bias=bias, valid_v=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_bias", [False, True])
def test_chunked_ce_grads(with_bias):
    # n=11: padded rows must not pollute dtable/dbias either
    x, table, bias, targets = _case(seed=9, n=11)
    w = jnp.asarray(
        np.random.default_rng(10).uniform(0, 1, size=x.shape[0]), jnp.float32
    )

    def loss_fused(x, table, bias):
        nll = fused_softmax_ce(
            x, table, targets, bias=bias if with_bias else None,
            vocab_block=16,
        )
        return jnp.sum(nll * w)

    def loss_ref(x, table, bias):
        nll = _reference(x, table, targets, bias=bias if with_bias else None)
        return jnp.sum(nll * w)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, table, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, table, bias)
    for g, r, name in zip(got, want, ("dx", "dtable", "dbias")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_chunked_matches_resident_kernel():
    """Both kernel families agree on the same inputs (fwd + grads)."""
    x, table, bias, targets = _case(seed=11, n=16, v=64)

    def loss(x, table, bias, vb):
        nll = fused_softmax_ce(x, table, targets, bias=bias, vocab_block=vb)
        return jnp.sum(nll)

    got = jax.value_and_grad(
        lambda *a: loss(*a, 16), argnums=(0, 1, 2)
    )(x, table, bias)
    want = jax.value_and_grad(
        lambda *a: loss(*a, None), argnums=(0, 1, 2)
    )(x, table, bias)
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=1e-5)
    for g, r in zip(got[1], want[1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5)


def test_chunked_ce_gate():
    """models.base gate: huge-vocab configs route to the chunked kernel
    only when the XLA fallback's logits tensor is big."""
    from datamining_recblr_tpu.ops import fused_ce

    assert not fused_ce.supports(330_000, 64)       # beyond VMEM
    assert fused_ce.supports_chunked(330_000, 64)
    # XLong shape: 512 rows x 330k vocab -> 676 MB logits, way past gate
    assert 512 * 330_000 * 4 >= fused_ce.CHUNK_MIN_LOGITS_BYTES
    # tiny rows at moderate vocab stay on XLA
    assert 512 * 20_000 * 4 < fused_ce.CHUNK_MIN_LOGITS_BYTES


def test_fused_ce_matches_base_ce_loss():
    """End-to-end agreement with models.base.ce_loss (weighted mean)."""
    from datamining_recblr_tpu.models.base import ce_loss

    x, table, bias, targets = _case(seed=5, n=16, v=50)
    w = jnp.asarray(np.random.default_rng(6).integers(0, 2, size=16), jnp.float32)
    logits = jnp.dot(x, table.T, preferred_element_type=jnp.float32)
    want = ce_loss(logits, targets, w)
    nll = fused_softmax_ce(x, table, targets)
    got = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
