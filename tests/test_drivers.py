"""Driver-level tests: run_experiment end-to-end from a .inter file on
disk through config -> data -> fit -> test -> plots, plus the config
system layering."""

import pytest
import os

import numpy as np

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.synthetic import write_synthetic_inter
from datamining_recblr_tpu.drivers import run_experiment


def test_config_layering(tmp_path):
    f1 = tmp_path / "a.yaml"
    f1.write_text("hidden_size: 48\nepochs: 7\n")
    f2 = tmp_path / "b.yaml"
    f2.write_text("epochs: 3\n")
    cfg = Config(
        model="RecBLR",
        config_file_list=[str(f1), str(f2)],
        config_dict={"dropout_prob": 0.1},
    )
    assert cfg["hidden_size"] == 48      # from first file
    assert cfg["epochs"] == 3            # second file overrides first
    assert cfg["dropout_prob"] == 0.1    # dict overrides all
    assert cfg["num_layers"] == 2        # model default survives
    assert cfg["seed"] == 2020           # builtin default


def test_reference_config_yaml_loads():
    cfg = Config(model="RecBLR", config_file_list=["config.yaml"])
    assert cfg["dataset"] == "amazon-beauty"
    assert cfg["MAX_ITEM_LIST_LENGTH"] == 200
    assert cfg["train_batch_size"] == 2048
    assert cfg["valid_metric"] == "NDCG@10"


@pytest.mark.slow
def test_run_experiment_from_inter_file(tmp_path):
    ddir = tmp_path / "dataset" / "toy"
    write_synthetic_inter(
        str(ddir / "toy.inter"),
        n_users=80, n_items=40, min_len=6, max_len=18, markov_weight=0.9, seed=5,
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
            "metrics_file": str(tmp_path / "metrics.jsonl"),
        },
    )
    result = run_experiment(
        cfg, plot_prefix="toy", plot_dir=str(tmp_path / "plot")
    )
    assert np.isfinite(result["best_valid_score"])
    assert "ndcg@10" in result["test_result"]
    # plots + csv created
    assert os.path.exists(tmp_path / "plot" / "toy_training_metrics.csv")
    assert os.path.exists(tmp_path / "plot" / "toytrain_loss_plot.png")
    # metrics JSONL written
    assert os.path.exists(tmp_path / "metrics.jsonl")
    # environment captured
    assert result["environment"]["device_count"] >= 1
