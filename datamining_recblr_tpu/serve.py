"""Serving path: batched top-k recommendation from a trained model.

The reference has no serving surface — its closest analogue is the
per-user ``full_sort_predict`` loop in the cold-start driver
(reference ``run_with_unseen.py:209-237``).  This module provides the
production equivalent: load a checkpoint, jit one scoring+top-k step
(full-catalog MXU matmul + ``lax.top_k``; vocab-sharded merge under a
mesh), and recommend for arbitrary batches of user histories with
optional history exclusion."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.eval.metrics import mask_scores
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.train.checkpoint import restore_checkpoint


class Recommender:
    def __init__(self, model, params, top_k: int = 10, mesh=None):
        self.model = model
        self.params = params
        self.top_k = int(top_k)
        self.mesh = mesh

        def _step(params, item_seq, item_seq_len, history_mask):
            scores = model.full_sort_scores(params, item_seq, item_seq_len)
            scores = mask_scores(scores, history=history_mask)
            if mesh is not None and "model" in mesh.shape:
                from datamining_recblr_tpu.ops.topk import sharded_topk

                return sharded_topk(scores, self.top_k, mesh)
            return jax.lax.top_k(scores, self.top_k)

        self._step = jax.jit(_step)

    @classmethod
    def from_checkpoint(
        cls, checkpoint_path: str, config: Config, n_items: int,
        max_seq_len: int, top_k: int = 10,
    ) -> "Recommender":
        model = get_model(config["model"])(config, n_items, max_seq_len)
        example = model.init_params(jax.random.PRNGKey(0))
        state = restore_checkpoint(checkpoint_path, {"params": example, "epoch": 0})
        params = jax.tree.map(jnp.asarray, state["params"])
        return cls(model, params, top_k=top_k)

    def recommend(self, sequences, exclude_history: bool = True):
        """sequences: list of per-user item-id lists (most recent last).

        Returns (item_ids [B, k], scores [B, k]) as NumPy arrays; the
        PAD item and (optionally) each user's own history are excluded.
        """
        b = len(sequences)
        t = self.model.max_seq_len
        seq = np.zeros((b, t), np.int32)
        lens = np.zeros((b,), np.int32)
        hist = np.zeros((b, self.model.n_items_padded), bool)
        for i, items in enumerate(sequences):
            window = np.asarray(items, np.int32)[-t:]
            seq[i, : len(window)] = window
            lens[i] = len(window)
            if exclude_history and len(items):
                hist[i, np.asarray(items, np.int64)] = True
        vals, ids = self._step(
            self.params,
            jnp.asarray(seq),
            jnp.asarray(lens),
            jnp.asarray(hist) if exclude_history else jnp.zeros_like(jnp.asarray(hist)),
        )
        return np.asarray(ids), np.asarray(vals)
