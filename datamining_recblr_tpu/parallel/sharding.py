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


def rows_sharded(nrows: int, mesh: Mesh | None) -> bool:
    """True when a vocab-leading tensor with ``nrows`` rows gets
    row-sharded over the ``model`` axis by :func:`param_pspecs` (it
    stays replicated when the mesh has no model axis or the rows do not
    divide it).  Kernels gate on this: the fused CE runs only against a
    replicated table (a row-sharded one takes the GSPMD vocab-parallel
    XLA path instead)."""
    if mesh is None:
        return False
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    return model_size > 1 and nrows % model_size == 0


def param_pspecs(params, mesh: Mesh | None = None) -> dict:
    """PartitionSpec tree matching a model param tree.  When a mesh is
    given, tensors whose leading dim does not divide the model axis stay
    replicated (e.g. BERT4Rec's n_items+1-row table)."""
    model_size = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1

    def divisible(leaf):
        dim = getattr(leaf, "shape", (0,))[0] if hasattr(leaf, "shape") else 0
        return dim and rows_sharded(dim, mesh)

    def spec_for(path, leaf):
        # meshes without a model axis (e.g. data x seq) replicate params
        if model_size <= 1:
            return P()
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        if names & _ROW_SHARDED and divisible(leaf):
            return P(MODEL_AXIS, None)
        if names & _VOCAB_SHARDED and divisible(leaf):
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


def shard_params(params, mesh: Mesh):
    specs = param_pspecs(params, mesh)
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
