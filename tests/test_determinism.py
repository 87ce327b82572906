"""Reproducibility: identical seeds give identical training
trajectories and evaluation results (the reference's determinism-as-
harness strategy, SURVEY §4.2)."""

import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.dataset import build_from_dataframe
from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.train import Trainer


@pytest.fixture(scope="module")
def synth_data():
    df = generate_synthetic_interactions(n_users=80, n_items=40, seed=6)
    return build_from_dataframe(df, max_seq_len=10)


def _fit(synth_data, tmp_path, tag, seed):
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16, "num_layers": 1, "epochs": 3,
            "train_batch_size": 64, "eval_batch_size": 128,
            "use_pallas_scan": "never", "MAX_ITEM_LIST_LENGTH": 10,
            "checkpoint_dir": str(tmp_path / f"saved_{tag}"),
            "dataset": "d", "seed": seed,
        },
    )
    model = get_model("RecBLR")(cfg, synth_data.n_items, synth_data.max_seq_len)
    tr = Trainer(cfg, model)
    tr.fit(synth_data, checkpoint_path=str(tmp_path / f"ck_{tag}"))
    return [r["train_loss"] for r in tr.metrics.epoch_records()], tr


@pytest.mark.slow
def test_same_seed_identical_trajectory(synth_data, tmp_path):
    losses1, tr1 = _fit(synth_data, tmp_path, "a", 2020)
    losses2, tr2 = _fit(synth_data, tmp_path, "b", 2020)
    np.testing.assert_array_equal(losses1, losses2)
    r1 = tr1.evaluate(synth_data.test)
    r2 = tr2.evaluate(synth_data.test)
    assert r1 == r2


@pytest.mark.slow
def test_different_seed_differs(synth_data, tmp_path):
    losses1, _ = _fit(synth_data, tmp_path, "c", 2020)
    losses2, _ = _fit(synth_data, tmp_path, "d", 7)
    assert losses1 != losses2
