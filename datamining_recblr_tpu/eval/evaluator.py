"""Batched full-sort evaluator.

Replaces RecBole's ``Trainer.evaluate`` full-catalog ranking loop (the
reference's eval path, SURVEY §3.2): for each eval batch, one jitted
step computes the sequence representation, the [B, V] catalog scores
(MXU matmul), the target ranks, and the metric accumulators — nothing
but two scalars per metric leaves the device per batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from datamining_recblr_tpu.data.batching import iter_batches
from datamining_recblr_tpu.eval.metrics import mask_scores, rank_metrics, target_ranks


class Evaluator:
    def __init__(self, model, config):
        self.model = model
        self.metrics = [m.lower() for m in config["metrics"]]
        self.topk = [int(k) for k in config["topk"]]
        self.batch_size = int(config["eval_batch_size"])

        @jax.jit
        def _eval_step(params, item_seq, item_seq_len, pos_item, weight):
            scores = self.model.full_sort_scores(params, item_seq, item_seq_len)
            scores = mask_scores(scores)
            ranks = target_ranks(scores, pos_item)
            return rank_metrics(ranks, self.metrics, self.topk, weight)

        self._eval_step = _eval_step

    def evaluate(self, params, split) -> dict[str, float]:
        """Returns {"metric@k": value} averaged over real rows."""
        sums = {}
        for batch in iter_batches(split, self.batch_size):
            acc = self._eval_step(
                params,
                jnp.asarray(batch["item_seq"]),
                jnp.asarray(batch["item_seq_len"]),
                jnp.asarray(batch["pos_item"]),
                jnp.asarray(batch["weight"]),
            )
            for key, (s, w) in acc.items():
                cur = sums.setdefault(key, [0.0, 0.0])
                cur[0] += float(s)
                cur[1] += float(w)
        return {k: (s / w if w else 0.0) for k, (s, w) in sums.items()}


def format_result(result: dict[str, float]) -> str:
    """4-decimal reporting, like the reference logs (log:313,327)."""
    return "  ".join(f"{k}: {v:.4f}" for k, v in sorted(result.items()))
