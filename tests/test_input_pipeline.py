"""Multi-host input helpers (parallel/input.py): global-batch assembly
via jax.make_array_from_process_local_data, replicated split placement,
and the process-local row ranges. Single-process here; the same calls
are the multi-process recipe (each process passes its local rows)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from datamining_recblr_tpu.parallel import make_mesh
from datamining_recblr_tpu.parallel.input import (
    process_local_rows,
    replicate_global,
    shard_host_batch,
)


def test_process_local_rows_single_process():
    mesh = make_mesh({"data": 4, "model": 2})
    assert process_local_rows(128, mesh) == (0, 128)


def test_shard_host_batch_assembles_global_array():
    mesh = make_mesh({"data": 4, "model": 2})
    batch = {
        "item_seq": np.arange(64, dtype=np.int32).reshape(8, 8),
        "weight": np.ones(8, np.float32),
    }
    out = shard_host_batch(batch, mesh)
    assert out["item_seq"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out["item_seq"]), batch["item_seq"])
    # fully addressable single-process: jit can consume it directly
    s = jax.jit(lambda b: jnp.sum(b["item_seq"] * b["weight"][:, None]))(out)
    assert float(s) == float(batch["item_seq"].sum())


def test_replicate_global_places_full_copy_per_device():
    mesh = make_mesh({"data": 4, "model": 2})
    x = np.arange(24, dtype=np.int32).reshape(6, 4)
    rep = replicate_global({"x": x}, mesh)["x"]
    assert rep.sharding.spec == P()
    assert rep.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(rep), x)
    # gather through a data-sharded index vector: batch comes out
    # data-sharded with no collectives (the trainer's resident path)
    idx = shard_host_batch({"i": np.array([5, 4, 1, 0], np.int32)}, mesh)["i"]
    got = jax.jit(lambda d, i: d[i])(rep, idx)
    assert got.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(got), x[[5, 4, 1, 0]])
