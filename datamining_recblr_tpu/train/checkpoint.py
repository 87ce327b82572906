"""Checkpointing: best-validation model saved and reloaded before test.

Mirrors the reference's RecBole behavior (best checkpoint written to
``saved/`` during fit, auto-reloaded before ``Trainer.evaluate`` —
SURVEY §2.3 / log:312), implemented with Orbax (async-capable,
sharding-aware) with a plain-NumPy fallback when Orbax can't be used
(e.g. exotic test environments)."""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict) -> str:
    """Save a pytree state dict; returns the path actually written."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ocp_path = path + ".orbax"
        ckptr.save(ocp_path, _to_host(state), force=True)
        ckptr.wait_until_finished()
        return ocp_path
    except Exception as e:
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
        return ckptr.restore(p, target=_to_host(target))
    return ckptr.restore(p)
