"""Batched full-sort evaluator.

Replaces RecBole's ``Trainer.evaluate`` full-catalog ranking loop (the
reference's eval path, SURVEY §3.2): for each eval batch, one jitted
step computes the sequence representation, the [B, V] catalog scores
(MXU matmul), the target ranks, and the metric accumulators — nothing
but two scalars per metric leaves the device per batch.

History masking: RecBole's sequential full-sort mode masks only the PAD
item, not training history (SURVEY §7 open question — resolved: for
sequential datasets RecBole's ``history_index`` is None).  The
``mask_history`` config therefore defaults False, but the capability
exists: pass a ``history_fn`` mapping user ids to a [B, V] boolean
mask and those items score -inf."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from datamining_recblr_tpu.data.batching import iter_batches
from datamining_recblr_tpu.eval.metrics import mask_scores, rank_metrics, target_ranks


def history_fn_from_data(data):
    """Build a history_fn from SeqData.user_train_items: batch of user
    ids -> [B, n_items] bool mask of items seen in training."""

    def fn(user_ids: np.ndarray) -> np.ndarray:
        mask = np.zeros((len(user_ids), data.n_items), bool)
        for j, u in enumerate(user_ids):
            items = data.user_train_items[int(u)]
            if len(items):
                mask[j, items] = True
        return mask

    return fn


class Evaluator:
    def __init__(self, model, config, mesh=None):
        self.model = model
        self.metrics = [m.lower() for m in config["metrics"]]
        self.topk = [int(k) for k in config["topk"]]
        self.batch_size = int(config["eval_batch_size"])
        self.mesh = mesh
        if mesh is not None:
            data_size = mesh.shape.get("data", 1)
            assert self.batch_size % data_size == 0, (
                f"eval_batch_size {self.batch_size} must divide by the data"
                f" mesh axis ({data_size})"
            )

        @jax.jit
        def _eval_step(params, item_seq, item_seq_len, pos_item, weight):
            scores = self.model.full_sort_scores(params, item_seq, item_seq_len)
            scores = mask_scores(scores)
            ranks = target_ranks(scores, pos_item)
            return rank_metrics(ranks, self.metrics, self.topk, weight)

        @jax.jit
        def _eval_step_hist(params, item_seq, item_seq_len, pos_item, weight, history):
            scores = self.model.full_sort_scores(params, item_seq, item_seq_len)
            scores = mask_scores(scores, history=history)
            ranks = target_ranks(scores, pos_item)
            return rank_metrics(ranks, self.metrics, self.topk, weight)

        self._eval_step = _eval_step
        self._eval_step_hist = _eval_step_hist

    def evaluate(self, params, split, history_fn=None) -> dict[str, float]:
        """Returns {"metric@k": value} averaged over real rows."""
        sums = {}
        for batch in iter_batches(split, self.batch_size):
            if self.mesh is not None:
                from datamining_recblr_tpu.parallel.sharding import shard_batch

                sharded = shard_batch(
                    {k: batch[k] for k in ("item_seq", "item_seq_len", "pos_item", "weight")},
                    self.mesh,
                )
                args = [
                    params,
                    sharded["item_seq"],
                    sharded["item_seq_len"],
                    sharded["pos_item"],
                    sharded["weight"],
                ]
            else:
                args = [
                    params,
                    jnp.asarray(batch["item_seq"]),
                    jnp.asarray(batch["item_seq_len"]),
                    jnp.asarray(batch["pos_item"]),
                    jnp.asarray(batch["weight"]),
                ]
            if history_fn is not None:
                hist = history_fn(batch["user_id"])
                acc = self._eval_step_hist(*args, jnp.asarray(hist))
            else:
                acc = self._eval_step(*args)
            for key, (s, w) in acc.items():
                cur = sums.setdefault(key, [0.0, 0.0])
                cur[0] += float(s)
                cur[1] += float(w)
        return {k: (s / w if w else 0.0) for k, (s, w) in sums.items()}


def format_result(result: dict[str, float]) -> str:
    """4-decimal reporting, like the reference logs (log:313,327)."""
    return "  ".join(f"{k}: {v:.4f}" for k, v in sorted(result.items()))
