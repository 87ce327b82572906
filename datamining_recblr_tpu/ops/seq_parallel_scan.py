"""Sequence-parallel linear-recurrence scan across devices.

The reference's sequence-length scaling is strictly intra-device (the
Triton Blelloch scan + embedding padding, SURVEY §5); this module goes
beyond it: the time axis is sharded over a mesh axis, each device scans
its chunk locally (Pallas/XLA kernel), and the cross-chunk carry — the
pair (last state, product of gates) under the first-order combine
``(x_l, f_l) o (x_r, f_r) = (x_l f_r + x_r, f_l f_r)`` — is exchanged
with one all-gather over ICI and folded back in by a second local scan
whose first token absorbs the incoming carry:

    h_1 = g_1 * carry_in + x_1   <=>   x'_1 = x_1 + g_1 * carry_in

Total cost: 2 local scans + one [n_dev, B, C] all-gather — log-free and
bandwidth-light for the small device counts of a pod slice.  Fully
differentiable (composed from the custom-VJP scan and collectives under
``shard_map``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from datamining_recblr_tpu.ops.scan import linear_scan


def seq_parallel_scan(
    gates, tokens, mesh, seq_axis: str, batch_axis: str | None = None,
    impl: str = "auto",
):
    """h[:, t] = gates[:, t] * h[:, t-1] + tokens[:, t], with the time
    axis (axis 1) sharded over ``seq_axis`` of ``mesh``.

    gates/tokens: [B, T, C]; T must divide the ``seq_axis`` size.
    ``batch_axis`` additionally shards the batch axis (data parallelism
    composed with sequence parallelism — each (data, seq) device scans
    its rows' chunk).  Returns [B, T, C] sharded the same way.
    """
    n_dev = mesh.shape[seq_axis]
    if gates.shape[1] % n_dev:
        raise ValueError(
            f"T={gates.shape[1]} must divide seq axis size {n_dev}"
        )

    spec = P(batch_axis, seq_axis, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def _scan(g, x):
        # first pass: chunk-local scan from zero state
        h_local = linear_scan(g, x, impl=impl)
        chunk_prod = jnp.prod(g, axis=1)          # [B, C]
        last = h_local[:, -1]                     # [B, C]

        # gather every chunk's (last, prod) and fold the exclusive
        # prefix combine up to this device's position
        pairs_last = jax.lax.all_gather(last, seq_axis)        # [n, B, C]
        pairs_prod = jax.lax.all_gather(chunk_prod, seq_axis)  # [n, B, C]
        my = jax.lax.axis_index(seq_axis)
        carry = jnp.zeros_like(last)
        carry_in = jnp.zeros_like(last)
        for j in range(n_dev):
            carry_in = jnp.where(my == j, carry, carry_in)
            carry = carry * pairs_prod[j] + pairs_last[j]

        # second pass: absorb the carry into the first token
        x_adj = x.at[:, 0].add(g[:, 0] * carry_in)
        return linear_scan(g, x_adj, impl=impl)

    return _scan(gates, tokens)
