"""Checkpointing: best-validation model saved and reloaded before test.

Mirrors the reference's RecBole behavior (best checkpoint written to
``saved/`` during fit, auto-reloaded before ``Trainer.evaluate`` —
SURVEY §2.3 / log:312), implemented with Orbax.

Sharding-aware: device arrays are passed to Orbax as-is (NOT forced to
host NumPy), so a multi-process run with model-sharded params saves
each process's addressable shards into one shared checkpoint — every
process must call save/restore collectively on the same path, exactly
like a real multi-host TPU job.  Restore rebuilds each leaf with the
sharding of the matching ``target`` leaf, so a row-sharded embedding
comes back row-sharded (no unsharded materialization).  A plain-NumPy
pickle fallback remains for exotic single-process environments only —
multi-process saves fail loudly rather than fall back (a pickle cannot
express cross-process shards).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    """Host copy for the single-process pickle fallback (raises on
    non-addressable multi-process shards — callers gate on
    ``jax.process_count() == 1``)."""
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _abstract_target(tree):
    """Restore template: jax.Arrays become ShapeDtypeStructs carrying
    their sharding, so Orbax rebuilds each leaf sharded in place;
    other leaves (np arrays, python scalars) restore by example."""

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    return jax.tree.map(leaf, tree)


def save_checkpoint(path: str, state: dict) -> str:
    """Save a pytree state dict; returns the path actually written.
    Collective in multi-process runs: every process must call it with
    the same (shared-filesystem) path."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ocp_path = path + ".orbax"
        ckptr.save(ocp_path, state, force=True)
        ckptr.wait_until_finished()
        return ocp_path
    except Exception as e:
        if jax.process_count() > 1:
            raise RuntimeError(
                f"orbax multi-process checkpoint save failed for {path}; "
                "the pickle fallback cannot express cross-process shards"
            ) from e
        import logging

        logging.getLogger("datamining_recblr_tpu").warning(
            "orbax checkpointing failed (%s: %s); writing pickle fallback"
            " to %s.pkl", type(e).__name__, e, path,
        )
        with open(path + ".pkl", "wb") as f:
            pickle.dump(_to_host(state), f)
        return path + ".pkl"


def restore_checkpoint(path: str, target: dict | None = None) -> dict:
    if path.endswith(".pkl") or (
        not os.path.isdir(path) and os.path.exists(path + ".pkl")
    ):
        p = path if path.endswith(".pkl") else path + ".pkl"
        with open(p, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp

    p = path if path.endswith(".orbax") else path + ".orbax"
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(p, target=_abstract_target(target))
    return ckptr.restore(p)
