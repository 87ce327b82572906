"""Golden tests for ranking metrics: hand-computed Hit/NDCG/MRR on
tiny score matrices, including tie-breaking parity with torch.topk
(smaller index wins among equal scores)."""

import jax.numpy as jnp
import numpy as np

from datamining_recblr_tpu.eval.metrics import mask_scores, rank_metrics, target_ranks


def test_target_ranks_basic():
    scores = jnp.asarray(
        [
            [0.0, 5.0, 3.0, 4.0],   # target 2 (score 3): rank 3
            [0.0, 1.0, 2.0, 9.0],   # target 3 (score 9): rank 1
        ]
    )
    targets = jnp.asarray([2, 3])
    ranks = np.asarray(target_ranks(scores, targets))
    np.testing.assert_array_equal(ranks, [3, 1])


def test_target_ranks_ties_smaller_index_first():
    scores = jnp.asarray([[1.0, 2.0, 2.0, 2.0]])
    # item 1, 2, 3 all score 2.0; torch.topk orders them 1,2,3.
    assert int(target_ranks(scores, jnp.asarray([1]))[0]) == 1
    assert int(target_ranks(scores, jnp.asarray([2]))[0]) == 2
    assert int(target_ranks(scores, jnp.asarray([3]))[0]) == 3


def test_rank_metrics_values():
    ranks = jnp.asarray([1, 3, 11])
    out = rank_metrics(ranks, ["hit", "ndcg", "mrr"], [10], None)
    hit_sum, w = out["hit@10"]
    assert float(w) == 3.0
    np.testing.assert_allclose(float(hit_sum), 2.0)
    ndcg_sum, _ = out["ndcg@10"]
    expected_ndcg = 1.0 + 1.0 / np.log2(4.0)  # rank1 + rank3; rank11 misses
    np.testing.assert_allclose(float(ndcg_sum), expected_ndcg, rtol=1e-6)
    mrr_sum, _ = out["mrr@10"]
    np.testing.assert_allclose(float(mrr_sum), 1.0 + 1.0 / 3.0, rtol=1e-6)


def test_rank_metrics_weighted():
    ranks = jnp.asarray([1, 1])
    out = rank_metrics(ranks, ["hit"], [10], jnp.asarray([1.0, 0.0]))
    s, w = out["hit@10"]
    assert float(s) == 1.0 and float(w) == 1.0


def test_mask_scores_pads_item0():
    scores = jnp.ones((2, 4))
    masked = mask_scores(scores)
    assert np.isneginf(np.asarray(masked)[:, 0]).all()
    # with history mask
    hist = jnp.zeros((2, 4), bool).at[0, 2].set(True)
    masked2 = mask_scores(scores, history=hist)
    assert np.isneginf(np.asarray(masked2)[0, 2])
    assert np.asarray(masked2)[1, 2] == 1.0


def test_single_target_identities():
    ranks = jnp.asarray([2, 5, 30])
    out = rank_metrics(ranks, ["recall", "hit", "map", "mrr"], [10], None)
    assert float(out["recall@10"][0]) == float(out["hit@10"][0])
    assert float(out["map@10"][0]) == float(out["mrr@10"][0])
