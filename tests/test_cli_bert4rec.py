"""run_bert4rec.py CLI smoke test (in-process, CPU)."""

import pytest
import os
import sys

from datamining_recblr_tpu.data.synthetic import write_synthetic_inter


@pytest.mark.slow
def test_run_bert4rec_cli(tmp_path, monkeypatch):
    for name in ["toyA", "toyB"]:
        write_synthetic_inter(
            str(tmp_path / "dataset" / name / f"{name}.inter"),
            n_users=50, n_items=25, min_len=5, max_len=10, seed=hash(name) % 100,
        )
        (tmp_path / f"{name}.yaml").write_text(
            f"""
dataset: {name}
data_path: {tmp_path / 'dataset'}
MAX_ITEM_LIST_LENGTH: 8
hidden_size: 16
inner_size: 32
n_layers: 1
n_heads: 2
epochs: 1
train_batch_size: 64
eval_batch_size: 128
user_inter_num_interval: "[3,inf)"
item_inter_num_interval: "[1,inf)"
checkpoint_dir: {tmp_path / 'saved'}
"""
        )
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    import run_bert4rec

    monkeypatch.setattr(
        sys, "argv",
        ["run_bert4rec.py", "--config", str(tmp_path / "toyA.yaml"),
         "--config", str(tmp_path / "toyB.yaml")],
    )
    run_bert4rec.main()
    assert os.path.exists(tmp_path / "plot" / "BERT4Rec_toyA_training_metrics.csv")
    assert os.path.exists(tmp_path / "plot" / "bert4rec_train_time.png")
