"""Device mesh construction.

The reference has no multi-device execution at all (SURVEY §2.5:
``single_spec=True`` in every run); the distributed design here is the
new-framework target from BASELINE.json's north star: a 2-D
``Mesh(('data', 'model'))`` where the recurrent/attention towers run
data-parallel over ``data`` and the item-embedding table + full-catalog
logits are row/vocab-sharded over ``model``.  Collectives are inserted
by GSPMD from sharding annotations — ICI within a slice, DCN across
hosts (initialize with ``jax.distributed.initialize`` for multi-host)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"  # sequence (time) parallelism for long-context RecBLR


def make_mesh(shape: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh from an axis-name -> size dict.

    ``shape=None`` puts every available device on the ``data`` axis.
    Example: ``make_mesh({"data": 4, "model": 2})`` on 8 devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {DATA_AXIS: len(devices), MODEL_AXIS: 1}
    sizes = list(shape.values())
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {total} devices, have {len(devices)}"
        )
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def default_mesh_shape(n_devices: int) -> dict[str, int]:
    """Reasonable 2-D default: model axis 2 when even, else 1."""
    if n_devices % 2 == 0 and n_devices > 1:
        return {DATA_AXIS: n_devices // 2, MODEL_AXIS: 2}
    return {DATA_AXIS: n_devices, MODEL_AXIS: 1}


def multihost_initialize(**kwargs):
    """Multi-host entry: wraps ``jax.distributed.initialize`` (no-op if
    already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized
