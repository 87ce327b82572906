"""End-to-end convergence smoke test: train RecBLR on synthetic
Markov-structured data and check (a) the loss drops, (b) validation
NDCG@10 beats a random ranking by a wide margin, (c) checkpoint
reload reproduces the best-eval result (the reference's
experiment-as-test strategy, SURVEY §4, made into an actual test)."""

import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.dataset import build_from_dataframe
from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.train import Trainer


@pytest.fixture(scope="module")
def synth_data():
    df = generate_synthetic_interactions(
        n_users=150, n_items=60, min_len=8, max_len=25, markov_weight=0.9,
        n_clusters=6, seed=3,
    )
    return build_from_dataframe(df, max_seq_len=24)


def _run(model_name, synth_data, tmp_path, epochs=4, **overrides):
    cfg = Config(
        model=model_name,
        config_dict={
            "hidden_size": 32,
            "num_layers": 1,
            "epochs": epochs,
            "train_batch_size": 256,
            "eval_batch_size": 512,
            "stopping_step": 10,
            "use_pallas_scan": "never",
            "checkpoint_dir": str(tmp_path / "saved"),
            "metrics_file": str(tmp_path / "metrics.jsonl"),
            "MAX_ITEM_LIST_LENGTH": 24,
            "dataset": "synthetic",
            **overrides,
        },
    )
    model_cls = get_model(model_name)
    model = model_cls(cfg, n_items=synth_data.n_items, max_seq_len=synth_data.max_seq_len)
    trainer = Trainer(cfg, model)
    best_score, best_result = trainer.fit(synth_data)
    return cfg, trainer, best_score, best_result


@pytest.mark.slow
def test_recblr_learns(synth_data, tmp_path):
    cfg, trainer, best_score, best_result = _run("RecBLR", synth_data, tmp_path)
    epochs = trainer.metrics.epoch_records()
    assert len(epochs) >= 2
    assert epochs[-1]["train_loss"] < epochs[0]["train_loss"]
    # random ranking NDCG@10 over ~60 items is ~0.05; the Markov data is
    # highly predictable, the model must do far better
    assert best_score > 0.15, f"NDCG@10 {best_score} too low"

    test_result = trainer.evaluate(synth_data.test, load_best=True)
    assert test_result["ndcg@10"] > 0.15
    assert 0.0 <= test_result["hit@10"] <= 1.0


@pytest.mark.slow
def test_bpr_loss_path(synth_data, tmp_path):
    cfg, trainer, best_score, _ = _run(
        "RecBLR", synth_data, tmp_path, epochs=2, loss_type="BPR"
    )
    epochs = trainer.metrics.epoch_records()
    assert np.isfinite(epochs[-1]["train_loss"])
    assert epochs[-1]["train_loss"] < epochs[0]["train_loss"]
