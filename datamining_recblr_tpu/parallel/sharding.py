"""Sharding layouts for model params and batches.

Layout strategy (BASELINE.json north star; SURVEY §7 step 7):

* ``item_embedding`` (and BERT4Rec's ``output_bias``): **row-sharded**
  over the ``model`` axis — the biggest tensor and the full-catalog
  logits' contraction operand.  ID lookup and CE/top-k then partition
  into per-shard compute + small collectives under GSPMD.
* every other parameter: replicated (the towers are tiny: ~100k params
  at hidden=64 — data-parallel replication is the right call).
* batches: sharded over ``data`` on the leading axis.
* optimizer state follows the params automatically (same tree shape).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datamining_recblr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

_ROW_SHARDED = {"item_embedding"}
_VOCAB_SHARDED = {"output_bias"}

# --- replicate-vs-row-shard POLICY for vocab-leading tensors ----------
#
# Replication keeps the fused streaming-CE kernel (it needs the whole
# [V, D] table in every shard_map shard; measured to hold the unmeshed
# path's performance class — README mesh-1 column), so it is the
# DEFAULT wherever it is affordable.  Row-sharding buys (a) per-chip
# capacity for the table + its 2x Adam moments and (b) the GSPMD
# vocab-parallel CE + sharded top-k that split the [B, V] logits over
# the model axis — which is what multi-chip exists for at large V.
#
# The crossover is expressed in table ELEMENTS (V * D): below
# ROW_SHARD_MIN_ELEMS the whole table is a few MB (beauty 10.5k x 64 =
# 0.7M elems = 2.7 MB f32) and replication is obviously right; above
# it (Yelp-scale V ~ 65k at D=64 = 4.2M elems ~ 17 MB param + 34 MB
# Adam state per chip, and [4096, 65k] f32 eval logits ~ 1 GB) the
# capacity + logits-splitting argument wins and the table row-shards.
# Models pad their vocab-leading rows to the model-axis multiple
# (SequentialModel.pad_vocab_rows), so DIVISIBILITY NEVER DECIDES —
# this policy does.
ROW_SHARD_MIN_ELEMS = 4 * 1024 * 1024


def want_row_shard(
    nrows: int, ncols: int, mesh: Mesh | None, mode: str = "auto"
) -> bool:
    """The policy: row-shard a [nrows, ncols] vocab-leading tensor?

    ``mode`` (config key ``vocab_row_shard``): "auto" applies the
    element-count crossover above; "always"/"never" force the choice
    (tests use "always" to exercise the sharded mechanics at toy
    vocabs; "never" pins the fused-CE/replicated layout)."""
    if mesh is None:
        return False
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return False
    if mode == "always":
        return True
    if mode == "never":
        return False
    return nrows * max(ncols, 1) >= ROW_SHARD_MIN_ELEMS


def rows_sharded(
    nrows: int, mesh: Mesh | None, ncols: int, mode: str = "auto"
) -> bool:
    """True when a vocab-leading tensor with ``nrows`` rows actually
    gets row-sharded over the ``model`` axis by :func:`param_pspecs`:
    ``ncols`` is required (no 64-wide default) so every call site uses
    the tensor's real hidden width — a proxy default could silently
    disagree with param_pspecs for hidden != 64 (ADVICE r4).
    the :func:`want_row_shard` policy says so AND the rows divide the
    axis (models pad rows so this always holds for their tables; the
    divisibility guard remains as a safety net for external callers).
    Kernels gate on this: the fused CE runs only against a replicated
    table (a row-sharded one takes the GSPMD vocab-parallel XLA path
    instead)."""
    if mesh is None:
        return False
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    return (
        want_row_shard(nrows, ncols, mesh, mode) and nrows % model_size == 0
    )


def param_pspecs(params, mesh: Mesh | None = None, mode: str = "auto") -> dict:
    """PartitionSpec tree matching a model param tree.  Vocab-leading
    tensors follow the :func:`want_row_shard` policy; 1-D vocab vectors
    (BERT4Rec's ``output_bias``) inherit the table's hidden width for
    the element-count policy so bias and table decide together."""
    model_size = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
    # hidden width proxy for 1-D vocab vectors: the embedding table's
    # column count (any model in this repo has exactly one such table)
    hidden = 64
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        if names & _ROW_SHARDED and getattr(leaf, "ndim", 0) == 2:
            hidden = leaf.shape[1]
            break

    def sharded(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape:
            return False
        ncols = shape[1] if len(shape) > 1 else hidden
        return rows_sharded(shape[0], mesh, ncols, mode)

    def spec_for(path, leaf):
        # meshes without a model axis (e.g. data x seq) replicate params
        if model_size <= 1:
            return P()
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        if names & _ROW_SHARDED and sharded(leaf):
            return P(MODEL_AXIS, None)
        if names & _VOCAB_SHARDED and sharded(leaf):
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _batch_spec(x, mesh: Mesh | None) -> P:
    """[B, T] sequence tensors additionally shard T over ``seq`` when
    the mesh has that axis (long-context sequence parallelism)."""
    if (
        mesh is not None
        and mesh.shape.get(SEQ_AXIS, 1) > 1
        and getattr(x, "ndim", 1) == 2
    ):
        return P(DATA_AXIS, SEQ_AXIS)
    return P(DATA_AXIS)


def batch_pspec(batch, mesh: Mesh | None = None) -> dict:
    return jax.tree.map(lambda x: _batch_spec(x, mesh), batch)


def shard_params(params, mesh: Mesh, mode: str = "auto"):
    specs = param_pspecs(params, mesh, mode)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch, mesh: Mesh):
    """Place a *global* host batch data-sharded on the mesh.

    Multi-process: every process passes the same global batch (all
    hosts derive it from the shared seed), and each contributes only
    its ``process_local_rows`` slice via
    ``jax.make_array_from_process_local_data`` — the data axis is laid
    out process-contiguously (``jax.devices()`` order), so local rows
    land on local devices with no cross-host transfer."""
    if jax.process_count() > 1:
        import numpy as np

        from datamining_recblr_tpu.parallel.input import process_local_rows

        # fail loudly here rather than at array-assembly depth: the
        # per-process slice scheme needs an even row split and a
        # process-contiguous data axis (jax.devices() order)
        procs = jax.process_count()
        mesh_procs = [d.process_index for d in mesh.devices.flat]
        if mesh_procs != sorted(mesh_procs):
            raise ValueError(
                "shard_batch: mesh data axis is not process-contiguous "
                f"(device process order {mesh_procs}); build the mesh from "
                "jax.devices() order so local rows land on local devices"
            )

        def put(x):
            x = np.asarray(x)
            if x.shape[0] % procs != 0:
                raise ValueError(
                    f"shard_batch: global batch rows {x.shape[0]} do not "
                    f"divide process_count {procs}; pad the batch to a "
                    "static per-process shape"
                )
            lo, hi = process_local_rows(x.shape[0], mesh)
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, _batch_spec(x, mesh)), x[lo:hi]
            )

        return jax.tree.map(put, batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _batch_spec(x, mesh))),
        batch,
    )


def named(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda s: isinstance(s, P),
    )
