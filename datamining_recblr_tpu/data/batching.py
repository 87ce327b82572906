"""Fixed-shape batching for jit-compiled steps.

Every batch has exactly ``batch_size`` rows — the trailing partial batch
is zero-padded with a ``weight`` mask (0 for pad rows) so the compiled
step sees a single static shape.  Losses and metrics are weighted means,
which reproduces the reference's per-batch semantics while keeping XLA
recompilation at zero.
"""

from __future__ import annotations

import numpy as np


def batch_count(n: int, batch_size: int) -> int:
    return (n + batch_size - 1) // batch_size


def iter_batches(split, batch_size: int, *, shuffle=False, rng=None, neg_items=None):
    """Yield dict batches from a SplitArrays.

    Args:
      split: SplitArrays.
      batch_size: rows per batch (static).
      shuffle: permute rows each call (training).
      rng: np.random.Generator for shuffling / negative sampling.
      neg_items: if not None, an int (n_items) enabling uniform negative
        sampling in [1, n_items) for BPR (RecBole train_neg_sample_args
        uniform-1 semantics).
    """
    n = len(split)
    idx = np.arange(n)
    if shuffle:
        assert rng is not None
        rng.shuffle(idx)
    for start in range(0, n, batch_size):
        chunk = idx[start : start + batch_size]
        pad = batch_size - len(chunk)
        weight = np.ones(batch_size, np.float32)
        if pad:
            chunk = np.concatenate([chunk, np.zeros(pad, np.int64)])
            weight[len(weight) - pad :] = 0.0
        batch = {
            "item_seq": split.windows(chunk),
            "item_seq_len": split.item_seq_len[chunk],
            "pos_item": split.pos_item[chunk],
            "user_id": split.user_id[chunk],
            "weight": weight,
        }
        if neg_items is not None:
            neg = rng.integers(1, neg_items, size=batch_size, dtype=np.int64)
            pos = batch["pos_item"]
            # resample collisions with the positive item (uniform sampler parity)
            for _ in range(4):
                coll = neg == pos
                if not coll.any():
                    break
                neg[coll] = rng.integers(1, neg_items, size=int(coll.sum()))
            batch["neg_item"] = neg.astype(np.int32)
        yield batch
