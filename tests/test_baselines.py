"""SASRec and BERT4Rec baseline tests: shape contracts, protocol
details (BERT4Rec mask-append eval), and learning smoke tests on the
shared synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.dataset import build_from_dataframe
from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.models.bert4rec import BERT4Rec
from datamining_recblr_tpu.train import Trainer


@pytest.fixture(scope="module")
def synth_data():
    df = generate_synthetic_interactions(
        n_users=120, n_items=50, min_len=8, max_len=20, markov_weight=0.9,
        n_clusters=5, seed=11,
    )
    return build_from_dataframe(df, max_seq_len=16)


def _cfg(model_name, tmp_path, **overrides):
    return Config(
        model=model_name,
        config_dict={
            "hidden_size": 32,
            "inner_size": 64,
            "n_layers": 1,
            "n_heads": 2,
            "epochs": 4,
            "train_batch_size": 256,
            "eval_batch_size": 512,
            "hidden_dropout_prob": 0.2,
            "attn_dropout_prob": 0.2,
            "checkpoint_dir": str(tmp_path / "saved"),
            "MAX_ITEM_LIST_LENGTH": 16,
            "dataset": "synthetic",
            **overrides,
        },
    )


def test_model_registry_aliases():
    assert get_model("R") is get_model("RecBLR")
    assert get_model("S") is get_model("SASRec")
    assert get_model("B") is get_model("BERT4Rec")


@pytest.mark.slow
def test_sasrec_learns(synth_data, tmp_path):
    cfg = _cfg("SASRec", tmp_path)
    model = get_model("SASRec")(cfg, synth_data.n_items, synth_data.max_seq_len)
    trainer = Trainer(cfg, model)
    best_score, _ = trainer.fit(synth_data)
    recs = trainer.metrics.epoch_records()
    assert recs[-1]["train_loss"] < recs[0]["train_loss"]
    assert best_score > 0.10


def test_sasrec_causality(synth_data, tmp_path):
    """Changing items after position len-1 must not change the output."""
    cfg = _cfg("SASRec", tmp_path)
    model = get_model("SASRec")(cfg, synth_data.n_items, synth_data.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    seq = np.asarray(synth_data.test.item_seq[:8]).copy()
    lens = np.asarray(synth_data.test.item_seq_len[:8])
    out1 = model.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    rng = np.random.default_rng(0)
    for i, l in enumerate(lens):
        seq[i, l:] = rng.integers(1, synth_data.n_items, size=seq.shape[1] - l)
    out2 = model.forward(params, jnp.asarray(seq), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_bert4rec_mask_append_protocol(synth_data, tmp_path):
    cfg = _cfg("BERT4Rec", tmp_path)
    model = BERT4Rec(cfg, synth_data.n_items, synth_data.max_seq_len)
    seq = jnp.asarray([[5, 7, 9, 0, 0, 0]])
    lens = jnp.asarray([3])
    out = np.asarray(model.reconstruct_test_seq(seq, lens))
    # mask appended at position len, then shifted left by one
    np.testing.assert_array_equal(out[0], [7, 9, model.mask_token, 0, 0, 0][: out.shape[1]])
    # full sequence: oldest item falls off
    seq2 = jnp.asarray([[1, 2, 3, 4, 5, 6]])
    out2 = np.asarray(model.reconstruct_test_seq(seq2, jnp.asarray([6])))
    np.testing.assert_array_equal(out2[0], [2, 3, 4, 5, 6, model.mask_token])


def test_bert4rec_full_scores_excludes_mask_row(synth_data, tmp_path):
    cfg = _cfg("BERT4Rec", tmp_path)
    model = BERT4Rec(cfg, synth_data.n_items, synth_data.max_seq_len)
    params = model.init_params(jax.random.PRNGKey(0))
    scores = model.full_sort_scores(
        params,
        jnp.asarray(synth_data.test.item_seq[:4]),
        jnp.asarray(synth_data.test.item_seq_len[:4]),
    )
    assert scores.shape == (4, synth_data.n_items)  # no mask-token column


@pytest.mark.slow
def test_bert4rec_learns(synth_data, tmp_path):
    cfg = _cfg("BERT4Rec", tmp_path, epochs=6)
    model = BERT4Rec(cfg, synth_data.n_items, synth_data.max_seq_len)
    trainer = Trainer(cfg, model)
    best_score, _ = trainer.fit(synth_data)
    recs = trainer.metrics.epoch_records()
    assert recs[-1]["train_loss"] < recs[0]["train_loss"]
    assert best_score > 0.08
