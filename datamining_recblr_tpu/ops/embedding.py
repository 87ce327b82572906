"""Embedding lookup with an MXU-friendly gradient.

XLA lowers the embedding gather's gradient to a serial scatter-add;
profiling shows it as the largest non-kernel op in the train step
(~3 ms at B=2048, T=200).  This custom VJP computes the table gradient
as chunked one-hot matmuls instead — bf16 MXU work that measures ~2x
faster at flagship shapes.  Forward is a plain gather."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 65536


@jax.custom_vjp
def embedding_lookup(table, ids):
    """table: [V, D]; ids: int[...]; returns table[ids] ([..., D])."""
    return table[ids]


def _fwd(table, ids):
    # saving the table costs nothing (same param buffer); it carries
    # the shape/dtype the backward needs
    return table[ids], (table, ids)


def _bwd(res, grad):
    table, ids = res
    v, d = table.shape
    dtype = table.dtype
    flat_ids = ids.reshape(-1)
    flat_g = grad.reshape(-1, d)
    n = flat_ids.shape[0]
    out = jnp.zeros((v, d), jnp.float32)
    for s in range(0, n, _CHUNK):
        oh = jax.nn.one_hot(flat_ids[s : s + _CHUNK], v, dtype=jnp.bfloat16)
        out = out + jnp.dot(
            oh.T,
            flat_g[s : s + _CHUNK].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return out.astype(dtype), None


embedding_lookup.defvjp(_fwd, _bwd)
