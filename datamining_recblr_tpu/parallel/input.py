"""Multi-host input pipeline helpers.

For >=2 hosts (SURVEY §7 hard part 4: deterministic multi-host input),
every process must feed only its slice of the global batch.  The
deterministic recipe: all hosts compute the same epoch permutation from
the shared seed, each host materializes the rows of the global batch
that fall on its addressable devices, and
``jax.make_array_from_process_local_data`` assembles the global sharded
array — bitwise-identical global batches regardless of host count.
Single-process meshes short-circuit to a plain device_put."""

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

    ``batch`` holds each process's *local* slice (all processes pass the
    full batch when single-process)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
