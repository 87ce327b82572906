"""CLI smoke tests: the root driver scripts wired end-to-end on a tiny
synthetic dataset (in-process, CPU)."""

import json
import os
import sys

import pytest

from datamining_recblr_tpu.data.synthetic import write_synthetic_inter


@pytest.fixture()
def toy_env(tmp_path, monkeypatch):
    ddir = tmp_path / "dataset" / "toy"
    write_synthetic_inter(
        str(ddir / "toy.inter"), n_users=60, n_items=30, min_len=5, max_len=12, seed=9
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
dataset: toy
data_path: {tmp_path / 'dataset'}
MAX_ITEM_LIST_LENGTH: 10
hidden_size: 16
num_layers: 1
epochs: 1
train_batch_size: 64
eval_batch_size: 128
user_inter_num_interval: "[3,inf)"
item_inter_num_interval: "[1,inf)"
use_pallas_scan: never
checkpoint_dir: {tmp_path / 'saved'}
n_layers: 1
n_heads: 2
inner_size: 32
"""
    )
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    return tmp_path, str(cfg)


@pytest.mark.parametrize("model_flag", ["R", "S", "B"])
def test_run_cli(toy_env, monkeypatch, model_flag):
    tmp_path, cfg = toy_env
    import run as run_cli

    monkeypatch.setattr(
        sys, "argv", ["run.py", "--model", model_flag, "--config", cfg]
    )
    run_cli.main()
    prefix = {"R": "RecBLR", "S": "SASRec", "B": "BERT4Rec"}[model_flag]
    assert os.path.exists(tmp_path / "plot" / f"{prefix}_toy_training_metrics.csv")


def test_compare_plots_cli(toy_env, monkeypatch):
    tmp_path, cfg = toy_env
    # fabricate two metrics files
    for name in ["a", "b"]:
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            for e in range(3):
                f.write(
                    json.dumps(
                        {"event": "epoch", "epoch": e, "train_loss": 5 - e,
                         "train_time": 1.0, "eval_time": 0.5, "valid_score": 0.1 * e}
                    )
                    + "\n"
                )
    import compare_plots

    monkeypatch.setattr(
        sys, "argv",
        ["compare_plots.py", f"a={tmp_path}/a.jsonl", f"b={tmp_path}/b.jsonl",
         "--out", str(tmp_path / "plot")],
    )
    compare_plots.main()
    assert os.path.exists(tmp_path / "plot" / "comparison_train_time.png")


def test_trim_cli(toy_env, monkeypatch):
    tmp_path, cfg = toy_env
    import trim

    src = tmp_path / "dataset" / "toy" / "toy.inter"
    dst = tmp_path / "trimmed.inter"
    monkeypatch.setattr(
        sys, "argv",
        ["trim.py", str(src), str(dst), "--keep_fraction", "0.5"],
    )
    trim.main()
    from datamining_recblr_tpu.data.atomic import read_atomic_file

    orig = read_atomic_file(str(src))
    out = read_atomic_file(str(dst))
    assert abs(len(out) - len(orig) // 2) <= 1
    # kept rows are the most recent ones
    assert out["timestamp"].min() >= orig["timestamp"].quantile(0.45)


def test_prepare_item_features_cli(toy_env, monkeypatch):
    tmp_path, cfg = toy_env
    import prepare_item_features as pif

    monkeypatch.setattr(
        sys, "argv",
        ["prepare_item_features.py", "--dataset", "toy",
         "--data_path", str(tmp_path / "dataset")],
    )
    pif.main()
    assert os.path.exists(tmp_path / "dataset" / "toy" / "toy_item_features.csv")


@pytest.mark.slow
def test_full_exp_comp_is_ablation_of_one_model(toy_env, monkeypatch):
    # reference full_exp.py:127-143: --exp comp = ablations of --model
    tmp_path, cfg = toy_env
    import full_exp

    monkeypatch.setattr(
        sys, "argv",
        ["full_exp.py", "--exp", "comp", "--model", "r", "--mode", "1layer",
         "--config", cfg],
    )
    full_exp.main()
    assert os.path.exists(
        tmp_path / "plot" / "RecBLR_1layer_training_metrics.csv"
    )


def test_full_exp_comp_requires_mode(toy_env, monkeypatch):
    tmp_path, cfg = toy_env
    import full_exp

    monkeypatch.setattr(
        sys, "argv", ["full_exp.py", "--exp", "comp", "--config", cfg]
    )
    with pytest.raises(SystemExit):
        full_exp.main()
