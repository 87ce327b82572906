"""Serving path tests: sharded top-k vs plain top-k, and the
Recommender API (history exclusion, checkpoint load)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.ops.topk import sharded_topk
from datamining_recblr_tpu.parallel import make_mesh
from datamining_recblr_tpu.serve import Recommender


def test_sharded_topk_matches_plain():
    mesh = make_mesh({"model": 8})
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((6, 64)).astype(np.float32))
    vals_s, ids_s = sharded_topk(scores, 5, mesh)
    vals_p, ids_p = jax.lax.top_k(scores, 5)
    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals_p), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_p))


def test_recommender_excludes_history_and_pad(tmp_path):
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16, "num_layers": 1,
            "use_pallas_scan": "never", "MAX_ITEM_LIST_LENGTH": 8,
        },
    )
    model = get_model("RecBLR")(cfg, n_items=30, max_seq_len=8)
    params = model.init_params(jax.random.PRNGKey(0))
    rec = Recommender(model, params, top_k=5)

    seqs = [[1, 2, 3], [4, 5, 6, 7, 8, 9, 10, 11, 12]]  # second longer than T
    ids, vals = rec.recommend(seqs)
    assert ids.shape == (2, 5) and vals.shape == (2, 5)
    assert (ids != 0).all()  # PAD never recommended
    assert not (set(ids[0]) & {1, 2, 3})  # history excluded
    assert not (set(ids[1]) & set(seqs[1]))
    # scores sorted descending
    assert (np.diff(vals, axis=1) <= 1e-6).all()

    ids2, _ = rec.recommend(seqs, exclude_history=False)
    assert ids2.shape == (2, 5)


def test_recommender_from_checkpoint(tmp_path):
    from datamining_recblr_tpu.train.checkpoint import save_checkpoint

    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16, "num_layers": 1,
            "use_pallas_scan": "never", "MAX_ITEM_LIST_LENGTH": 8,
        },
    )
    model = get_model("RecBLR")(cfg, n_items=30, max_seq_len=8)
    params = model.init_params(jax.random.PRNGKey(1))
    path = save_checkpoint(str(tmp_path / "ck" / "m"), {"params": params, "epoch": 0})
    rec = Recommender.from_checkpoint(path, cfg, n_items=30, max_seq_len=8, top_k=3)
    ids, vals = rec.recommend([[1, 5, 9]])
    assert ids.shape == (1, 3)
    # results match the in-memory params
    rec2 = Recommender(model, params, top_k=3)
    ids2, vals2 = rec2.recommend([[1, 5, 9]])
    np.testing.assert_array_equal(ids, ids2)
