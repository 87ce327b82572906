"""Cold-start subsystem tests: user split determinism/idempotence,
similarity mapping, mode none/pre sequence construction, and the full
pipeline on synthetic data."""

import numpy as np
import pandas as pd
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.synthetic import write_synthetic_inter
from datamining_recblr_tpu.unseen.features import synthesize_item_features
from datamining_recblr_tpu.unseen.pipeline import (
    build_unseen_split,
    prepare_data_split,
    run_unseen_experiment,
)
from datamining_recblr_tpu.unseen.similarity import ItemSimilarity


def _setup_dataset(tmp_path, **kwargs):
    ddir = tmp_path / "dataset" / "toy"
    df = write_synthetic_inter(
        str(ddir / "toy.inter"),
        n_users=100, n_items=50, min_len=6, max_len=18, markov_weight=0.9,
        seed=7, **kwargs,
    )
    cfg = Config(
        model="RecBLR",
        config_dict={
            "dataset": "toy",
            "data_path": str(tmp_path / "dataset"),
            "hidden_size": 16,
            "num_layers": 1,
            "epochs": 2,
            "train_batch_size": 128,
            "eval_batch_size": 256,
            "MAX_ITEM_LIST_LENGTH": 16,
            "user_inter_num_interval": "[3,inf)",
            "item_inter_num_interval": "[1,inf)",
            "use_pallas_scan": "never",
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
        },
    )
    return cfg, df


def test_prepare_data_split_deterministic_and_idempotent(tmp_path):
    cfg, df = _setup_dataset(tmp_path)
    train1, test1 = prepare_data_split(cfg, test_size=0.1, seed=42)
    train2, test2 = prepare_data_split(cfg, test_size=0.1, seed=42)  # reuses files
    assert set(train1["user_id"]) == set(train2["user_id"])
    assert set(test1["user_id"]) == set(test2["user_id"])
    # user-level split: no user in both
    assert not (set(train1["user_id"]) & set(test1["user_id"]))
    # roughly 10% of users held out
    n_users = df["user_id"].nunique()
    assert abs(test1["user_id"].nunique() - 0.1 * n_users) <= 2


def test_similarity_maps_unseen_to_valid():
    feats = pd.DataFrame(
        {
            "item_id": ["a", "b", "c", "x"],
            "description": [
                "red shoe leather",
                "blue shirt cotton",
                "red boot leather",
                "red sneaker leather",
            ],
        }
    )
    sim = ItemSimilarity(feats, valid_tokens=["a", "b", "c"], n_components=2)
    near = sim.nearest_valid("x")
    assert near in {"a", "c"}  # the leather/red items, not the shirt
    mapped = sim.map_sequence(["a", "x", "b"], {"a", "b", "c"})
    assert mapped[0] == "a" and mapped[2] == "b" and mapped[1] in {"a", "c"}
    # token without features is dropped
    assert sim.map_sequence(["zz"], {"a"}) == []


def test_synthesize_features_vectorized():
    df = pd.DataFrame(
        {
            "user_id": ["u1", "u2", "u1", "u3", "u1"],
            "item_id": ["a", "a", "b", "a", "b"],
            "timestamp": [1, 2, 3, 4, 5],
        }
    )
    feats = synthesize_item_features(df)
    assert set(feats["item_id"]) == {"a", "b"}
    assert feats["description"].str.contains("activity").all()


def test_mode_none_skips_oov_users(tmp_path):
    cfg, _ = _setup_dataset(tmp_path)
    from datamining_recblr_tpu.data.dataset import build_from_dataframe

    train_df, test_df = prepare_data_split(cfg)
    data = build_from_dataframe(
        train_df, max_seq_len=16,
        user_interval="[3,inf)", item_interval="[1,inf)",
    )
    split, n_total, n_eval = build_unseen_split(
        test_df, data, "none", None, "user_id", "item_id", "timestamp"
    )
    assert n_eval <= n_total
    assert len(split) == n_eval
    if n_eval:
        assert (split.pos_item > 0).all()
        assert (split.item_seq_len >= 1).all()


@pytest.mark.slow
def test_full_unseen_pipeline_both_modes(tmp_path):
    cfg, _ = _setup_dataset(tmp_path)
    pdir = str(tmp_path / "plot")
    for mode in ["none", "pre"]:
        out = run_unseen_experiment(mode=mode, config=cfg, plot_dir=pdir)
        assert "hit@10" in out["unseen_result"]
        assert "ndcg@10" in out["unseen_result"]
        assert 0.0 <= out["unseen_result"]["ndcg@10"] <= 1.0
        assert out["n_evaluated"] >= 0
    # mode pre should evaluate at least as many users as mode none
    out_none = run_unseen_experiment(mode="none", config=cfg, plot_dir=pdir)
    out_pre = run_unseen_experiment(mode="pre", config=cfg, plot_dir=pdir)
    assert out_pre["n_evaluated"] >= out_none["n_evaluated"]
