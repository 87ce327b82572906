"""Utility-layer tests: FLOPs counting, environment report, metrics
logger, plotting dataframes, profiler hook."""

import pytest
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from datamining_recblr_tpu.utils.env import environment_report, format_environment
from datamining_recblr_tpu.utils.flops import forward_flops
from datamining_recblr_tpu.utils.logging import MetricsLogger, load_metrics
from datamining_recblr_tpu.utils.plotting import generate_plots, records_to_dataframe


def test_forward_flops_counts_matmul():
    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    flops = forward_flops(lambda x, y: x @ y, a, b)
    assert flops is not None
    # 2*M*N*K, allow XLA accounting slack
    assert 0.5 * 2 * 64 * 128 * 32 <= flops <= 4 * 2 * 64 * 128 * 32


def test_environment_report():
    rep = environment_report()
    assert rep["device_count"] >= 1
    assert "jax" in rep
    assert isinstance(format_environment(rep), str)


def test_metrics_logger_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(path)
    ml.log("epoch", epoch=0, train_loss=5.0, train_time=1.0)
    ml.log("epoch", epoch=1, train_loss=4.0, train_time=1.1, valid_score=0.2)
    ml.log("test", ndcg=0.3)
    back = load_metrics(path)
    assert len(back) == 3
    assert [r for r in back if r["event"] == "epoch"][1]["valid_score"] == 0.2
    df = records_to_dataframe(ml.epoch_records())
    assert list(df["epoch"]) == [0, 1]


def test_generate_plots(tmp_path):
    records = [
        {"event": "epoch", "epoch": e, "train_loss": 5 - e, "train_time": 1.0,
         "eval_time": 0.3, "valid_score": 0.1 * e,
         "valid_hit@10": 0.2 * e, "valid_ndcg@10": 0.1 * e, "valid_mrr@10": 0.05 * e}
        for e in range(3)
    ]
    df = generate_plots(records, "unit", out_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "unit_training_metrics.csv")
    assert os.path.exists(tmp_path / "unittrain_loss_plot.png")
    assert os.path.exists(tmp_path / "unitndcg_plot.png")
    assert "hit@10" in df.columns


@pytest.mark.slow
def test_trainer_profile_dir(tmp_path):
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
    from datamining_recblr_tpu.data.dataset import build_from_dataframe
    from datamining_recblr_tpu.models import get_model
    from datamining_recblr_tpu.train import Trainer

    df = generate_synthetic_interactions(n_users=40, n_items=20, seed=4)
    data = build_from_dataframe(df, max_seq_len=8)
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16, "num_layers": 1, "epochs": 2,
            "train_batch_size": 64, "eval_batch_size": 128,
            "use_pallas_scan": "never", "MAX_ITEM_LIST_LENGTH": 8,
            "checkpoint_dir": str(tmp_path / "saved"),
            "profile_dir": str(tmp_path / "prof"),
            "dataset": "t",
        },
    )
    model = get_model("RecBLR")(cfg, data.n_items, data.max_seq_len)
    Trainer(cfg, model).fit(data)
    # trace captured during the second epoch
    assert any(
        f.endswith(".xplane.pb")
        for root, _, files in os.walk(tmp_path / "prof")
        for f in files
    )


def test_init_logger_one_file_per_run(tmp_path):
    """Multi-experiment drivers call init_logger once per run in one
    process; run N's lines must not leak into run N-1's file."""
    from datamining_recblr_tpu.utils.logging import init_logger

    f1, f2 = str(tmp_path / "a.log"), str(tmp_path / "b.log")
    log = init_logger(log_file=f1)
    log.info("first-run line")
    log = init_logger(log_file=f2)
    log.info("second-run line")
    assert "second-run line" not in open(f1).read()
    assert "second-run line" in open(f2).read()
