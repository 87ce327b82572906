"""Top-k over the (possibly vocab-sharded) catalog scores.

BASELINE.json's north star calls for full-catalog scoring as a sharded
matmul + top-k: with the item axis sharded over the ``model`` mesh
axis, each shard takes its local top-k, offsets the indices into global
item space, and a small [n_shards * k] all-gather + merge produces the
global top-k — the [B, |V|] score matrix is never gathered."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def topk_scores(scores, k: int):
    """Plain top-k: returns (values [B, k], item ids [B, k])."""
    return jax.lax.top_k(scores, k)


def sharded_topk(scores, k: int, mesh, vocab_axis: str = "model"):
    """Top-k where ``scores`` [B, V] is sharded over ``vocab_axis``.

    Per-shard top-k -> index offset -> all_gather of n*k candidates ->
    final local top-k.  Returns replicated (values, ids) [B, k].
    """
    n = mesh.shape[vocab_axis]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, vocab_axis),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _tk(local):
        v_local = local.shape[-1]
        vals, idx = jax.lax.top_k(local, min(k, v_local))
        shard = jax.lax.axis_index(vocab_axis)
        idx = idx + shard * v_local
        # gather all shards' candidates and merge
        all_vals = jax.lax.all_gather(vals, vocab_axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, vocab_axis, axis=1, tiled=True)
        mvals, mpos = jax.lax.top_k(all_vals, k)
        mids = jnp.take_along_axis(all_idx, mpos, axis=1)
        return mvals, mids

    return _tk(scores)
