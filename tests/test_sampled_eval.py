"""Sampled-candidate (uniN) evaluation mode: sanity vs full-catalog
evaluation and protocol properties."""

import jax
import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.dataset import build_from_dataframe
from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
from datamining_recblr_tpu.eval.evaluator import Evaluator
from datamining_recblr_tpu.models import get_model


@pytest.fixture(scope="module")
def setup():
    df = generate_synthetic_interactions(
        n_users=100, n_items=60, min_len=8, max_len=20, markov_weight=0.9, seed=2
    )
    data = build_from_dataframe(df, max_seq_len=16)
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16, "num_layers": 1, "use_pallas_scan": "never",
            "MAX_ITEM_LIST_LENGTH": 16, "eval_batch_size": 256,
        },
    )
    model = get_model("RecBLR")(cfg, data.n_items, data.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, data, model, params


def test_uni_mode_parses_and_runs(setup):
    cfg, data, model, params = setup
    cfg_s = Config(model="RecBLR", config_dict={
        **cfg.as_dict(), "eval_args": {"mode": "uni20"},
    })
    ev = Evaluator(model, cfg_s)
    assert ev.n_negatives == 20
    res = ev.evaluate(params, data.test)
    assert 0.0 <= res["ndcg@10"] <= 1.0
    # with only 21 candidates, hit@20 is almost always 1
    assert res["hit@20"] > 0.9


def test_uni_mode_scores_higher_than_full(setup):
    """Ranking against 20 sampled negatives is easier than against the
    full catalog, so sampled metrics dominate full metrics."""
    cfg, data, model, params = setup
    full = Evaluator(model, cfg).evaluate(params, data.test)
    cfg_s = Config(model="RecBLR", config_dict={
        **cfg.as_dict(), "eval_args": {"mode": "uni20"},
    })
    sampled = Evaluator(model, cfg_s).evaluate(params, data.test)
    assert sampled["hit@10"] >= full["hit@10"]


def test_pop_mode_runs(setup):
    cfg, data, model, params = setup
    cfg_p = Config(model="RecBLR", config_dict={
        **cfg.as_dict(), "eval_args": {"mode": "pop20"},
    })
    ev = Evaluator(model, cfg_p)
    assert ev.pop_sampling and ev.n_negatives == 20
    ev.set_item_popularity(data.item_popularity())
    res = ev.evaluate(params, data.test)
    assert 0.0 <= res["ndcg@10"] <= 1.0
    # PAD never sampled (probability mass zero at index 0)
    assert ev._pop_probs[0] == 0.0


def test_pop_mode_requires_counts(setup):
    cfg, data, model, params = setup
    cfg_p = Config(model="RecBLR", config_dict={
        **cfg.as_dict(), "eval_args": {"mode": "pop5"},
    })
    ev = Evaluator(model, cfg_p)
    with pytest.raises(AssertionError):
        ev.evaluate(params, data.test)


def test_unsupported_mode_raises(setup):
    cfg, data, model, params = setup
    bad = Config(model="RecBLR", config_dict={
        **cfg.as_dict(), "eval_args": {"mode": "weird9"},
    })
    with pytest.raises(ValueError):
        Evaluator(model, bad)
