"""On-device top-k ranking metrics for leave-one-out evaluation.

Computes Hit/NDCG/MRR/Recall/Precision/MAP @k from the *rank* of the
single ground-truth item, entirely on device — replacing the
reference's delegation to RecBole's evaluator (full-catalog ranking
per reference ``config.yaml:39-43`` / SURVEY §2.3) and its slow
per-user Python loop in the cold-start path
(``run_with_unseen.py:209-255``).

Tie-breaking matches ``torch.topk(sorted=True)`` as RecBole uses it:
among equal scores the smaller item index ranks first.  With a single
relevant item per user (leave-one-out), Recall@k == Hit@k and
MAP@k == MRR@k; both identities hold in RecBole's definitions too.
"""

from __future__ import annotations

import jax.numpy as jnp


def target_ranks(scores, targets):
    """1-based rank of ``targets[b]`` in descending ``scores[b]``.

    scores: [B, V] float; targets: [B] int.
    Rank = (# strictly greater) + (# equal with smaller index) + 1.

    Written as masked reductions over the item axis (no gather /
    take_along_axis) so that under GSPMD with vocab-sharded scores the
    whole computation partitions into local reductions + one psum —
    the [B, V] score matrix is never materialized unsharded.
    """
    scores = scores.astype(jnp.float32)
    idx = jnp.arange(scores.shape[-1])[None, :]
    is_tgt = idx == targets[:, None]
    tgt_score = jnp.sum(jnp.where(is_tgt, scores, 0.0), axis=-1, keepdims=True)
    greater = jnp.sum(scores > tgt_score, axis=-1)
    eq_before = jnp.sum(
        (scores == tgt_score) & (idx < targets[:, None]), axis=-1
    )
    return greater + eq_before + 1


_METRIC_FNS = {
    # single-target forms; rank is 1-based, k a python int
    "hit": lambda rank, k: (rank <= k).astype(jnp.float32),
    "recall": lambda rank, k: (rank <= k).astype(jnp.float32),
    "ndcg": lambda rank, k: jnp.where(
        rank <= k, 1.0 / jnp.log2(rank.astype(jnp.float32) + 1.0), 0.0
    ),
    "mrr": lambda rank, k: jnp.where(
        rank <= k, 1.0 / rank.astype(jnp.float32), 0.0
    ),
    "map": lambda rank, k: jnp.where(
        rank <= k, 1.0 / rank.astype(jnp.float32), 0.0
    ),
    "precision": lambda rank, k: (rank <= k).astype(jnp.float32) / k,
}


def rank_metrics(ranks, metrics, topk, weights=None):
    """Weighted-sum metric accumulators from 1-based ranks.

    Returns dict {"<metric>@<k>": (weighted sum, weight sum)} pairs as
    jnp scalars — callers accumulate across batches and divide.
    """
    if weights is None:
        weights = jnp.ones(ranks.shape, jnp.float32)
    w = weights.astype(jnp.float32)
    wsum = jnp.sum(w)
    out = {}
    for name in metrics:
        fn = _METRIC_FNS[name.lower()]
        for k in topk:
            out[f"{name}@{k}"] = (jnp.sum(fn(ranks, k) * w), wsum)
    return out


def mask_scores(scores, pad_value=-jnp.inf, history=None):
    """Mask PAD item 0 (RecBole full-sort sets the PAD column to -inf)
    and optionally a [B, V] boolean history mask.  Uses an iota compare
    instead of a scatter so vocab-sharded scores stay sharded."""
    idx = jnp.arange(scores.shape[-1])[None, :]
    scores = jnp.where(idx == 0, pad_value, scores)
    if history is not None:
        scores = jnp.where(history, pad_value, scores)
    return scores
