"""Synthetic interaction generators.

The reference's datasets (ML-1M, Amazon-*, Yelp, H&M) are large blobs
not shipped with either repo, so tests and benchmarks synthesize data
with the same statistical shape: Zipf-distributed item popularity,
per-user sequence lengths, and a first-order Markov structure over
items so that sequence models have signal to learn (a model that
learns beats popularity ranking — used by the convergence tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datamining_recblr_tpu.data.atomic import write_atomic_inter


def generate_synthetic_interactions(
    n_users: int = 200,
    n_items: int = 100,
    min_len: int = 5,
    max_len: int = 30,
    markov_weight: float = 0.8,
    n_clusters: int = 8,
    seed: int = 0,
) -> pd.DataFrame:
    """Markov-cluster interaction log: items belong to clusters; the next
    item stays within the current item's cluster with prob
    ``markov_weight``, else jumps uniformly.  Timestamps increase per
    user."""
    rng = np.random.default_rng(seed)
    clusters = rng.integers(0, n_clusters, size=n_items)
    members = [np.flatnonzero(clusters == c) for c in range(n_clusters)]
    members = [m if len(m) else np.arange(n_items) for m in members]

    rows_u, rows_i, rows_t = [], [], []
    for u in range(n_users):
        length = int(rng.integers(min_len, max_len + 1))
        item = int(rng.integers(0, n_items))
        t0 = float(rng.integers(1_000_000, 2_000_000))
        for s in range(length):
            rows_u.append(f"u{u}")
            rows_i.append(f"i{item}")
            rows_t.append(t0 + s)
            if rng.random() < markov_weight:
                item = int(rng.choice(members[clusters[item]]))
            else:
                item = int(rng.integers(0, n_items))
    return pd.DataFrame({"user_id": rows_u, "item_id": rows_i, "timestamp": rows_t})


def write_synthetic_inter(path: str, **kwargs) -> pd.DataFrame:
    df = generate_synthetic_interactions(**kwargs)
    write_atomic_inter(df, path)
    return df


def synthetic_splits(
    n_users: int,
    n_items: int,
    max_seq_len: int,
    n_train: int,
    seed: int = 0,
):
    """Directly build random fixed-shape SplitArrays at a target scale
    (for throughput benchmarking — no file IO, no augmentation cost).
    Returns (train, valid) SplitArrays with ids in [1, n_items)."""
    from datamining_recblr_tpu.data.dataset import SplitArrays

    rng = np.random.default_rng(seed)

    def make(n):
        lens = rng.integers(2, max_seq_len + 1, size=n).astype(np.int32)
        seq = rng.integers(1, n_items, size=(n, max_seq_len), dtype=np.int32)
        mask = np.arange(max_seq_len)[None, :] < lens[:, None]
        seq = np.where(mask, seq, 0).astype(np.int32)
        tgt = rng.integers(1, n_items, size=n, dtype=np.int32)
        usr = rng.integers(1, n_users, size=n, dtype=np.int32)
        return SplitArrays(seq, lens, tgt, usr)

    return make(n_train), make(max(n_train // 8, 1))
