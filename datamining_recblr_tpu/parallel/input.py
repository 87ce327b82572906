"""Multi-host / multi-chip input pipeline.

For >=2 hosts (SURVEY §7 hard part 4: deterministic multi-host input),
every process must feed only its slice of the global batch.  The
deterministic recipe: all hosts compute the same epoch permutation from
the shared seed, each host materializes the rows of the global batch
that fall on its addressable devices, and
``jax.make_array_from_process_local_data`` assembles the global sharded
array — bitwise-identical global batches regardless of host count.

Two placement strategies (Trainer ``mesh_input`` config):

* ``resident`` (default): the whole training split is placed on the
  mesh **replicated** once (``replicate_global``); each train step
  ships only a [B] index vector sharded over ``data`` and gathers its
  batch rows on device — no per-step host->device batch transfer, the
  same design as the single-device path (train/trainer.py).
* ``stream``: per-step host batches; each process feeds the
  ``process_local_rows`` slice and ``shard_host_batch`` assembles the
  global data-sharded array.  For splits too big to replicate in HBM.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datamining_recblr_tpu.parallel.mesh import DATA_AXIS


def process_local_rows(global_rows: int, mesh: Mesh):
    """(start, stop) row range of the global batch this process feeds,
    assuming row-contiguous layout over the data axis."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return 0, global_rows
    idx = jax.process_index()
    per = global_rows // n_proc
    return idx * per, (idx + 1) * per if idx + 1 < n_proc else global_rows


def shard_host_batch(batch: dict, mesh: Mesh) -> dict:
    """Assemble a data-sharded global batch from per-process local rows.

    ``batch`` holds each process's *local* slice, i.e. the
    ``process_local_rows`` range of the global batch (single-process,
    that is the full batch).  Works for any process count — JAX maps
    each process's rows onto its addressable devices."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def replicate_global(tree, mesh: Mesh):
    """Place identical host arrays on every device of the mesh
    (replicated).  All processes must pass the same data — true for the
    training split, which every host builds from the same seed/files."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )
