"""Trainer extras: history masking, checkpoint resume, and the
checkpoint state roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.dataset import build_from_dataframe
from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
from datamining_recblr_tpu.eval.evaluator import history_fn_from_data
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.train import Trainer


@pytest.fixture(scope="module")
def synth_data():
    df = generate_synthetic_interactions(
        n_users=80, n_items=40, min_len=8, max_len=20, markov_weight=0.9, seed=21
    )
    return build_from_dataframe(df, max_seq_len=16)


def _cfg(tmp_path, **over):
    return Config(
        model="RecBLR",
        config_dict={
            "hidden_size": 16,
            "num_layers": 1,
            "epochs": 2,
            "train_batch_size": 128,
            "eval_batch_size": 256,
            "use_pallas_scan": "never",
            "MAX_ITEM_LIST_LENGTH": 16,
            "dataset": "synthetic",
            "checkpoint_dir": str(tmp_path / "saved"),
            **over,
        },
    )


def test_history_fn_masks_seen_items(synth_data):
    fn = history_fn_from_data(synth_data)
    users = synth_data.test.user_id[:4]
    mask = fn(users)
    assert mask.shape == (4, synth_data.n_items)
    for j, u in enumerate(users):
        items = synth_data.user_train_items[int(u)]
        assert mask[j, items].all()
        assert not mask[j, 0]  # PAD never marked


@pytest.mark.slow
def test_mask_history_changes_eval(synth_data, tmp_path):
    cfg = _cfg(tmp_path)
    model = get_model("RecBLR")(cfg, synth_data.n_items, synth_data.max_seq_len)
    trainer = Trainer(cfg, model)
    trainer.fit(synth_data)
    plain = trainer.evaluator.evaluate(trainer.params, synth_data.test)
    masked = trainer.evaluator.evaluate(
        trainer.params, synth_data.test, history_fn_from_data(synth_data)
    )
    # masking history removes competing items -> metrics can only differ;
    # both remain valid probabilities
    assert 0 <= masked["ndcg@10"] <= 1 and 0 <= plain["ndcg@10"] <= 1


@pytest.mark.slow
def test_resume_continues_training(synth_data, tmp_path):
    cfg = _cfg(tmp_path, epochs=2)
    model = get_model("RecBLR")(cfg, synth_data.n_items, synth_data.max_seq_len)
    t1 = Trainer(cfg, model)
    t1.fit(synth_data, checkpoint_path=str(tmp_path / "saved" / "run1"))
    assert t1.ckpt_path is not None
    first_best = t1.best_score

    cfg2 = _cfg(tmp_path, epochs=4)
    model2 = get_model("RecBLR")(cfg2, synth_data.n_items, synth_data.max_seq_len)
    t2 = Trainer(cfg2, model2)
    t2.resume_from(t1.ckpt_path)
    assert t2.start_epoch >= 1
    assert t2.best_score == pytest.approx(first_best)
    best2, _ = t2.fit(synth_data, checkpoint_path=str(tmp_path / "saved" / "run2"))
    # training continued and kept-or-improved the best score
    assert best2 >= first_best - 1e-9
    epochs_run = [r["epoch"] for r in t2.metrics.epoch_records()]
    assert min(epochs_run) == t2.start_epoch


@pytest.mark.slow
def test_resume_trajectory_matches_uninterrupted(synth_data, tmp_path):
    """A resumed run must replay the exact loss trajectory of the
    uninterrupted run: per-epoch permutations derive from (seed, epoch),
    not from a generator seeded at fit() entry."""

    def losses(trainer):
        return {
            r["epoch"]: np.float32(r["train_loss"])
            for r in trainer.metrics.epoch_records()
        }

    cfg_a = _cfg(tmp_path, epochs=4)
    model_a = get_model("RecBLR")(cfg_a, synth_data.n_items, synth_data.max_seq_len)
    ta = Trainer(cfg_a, model_a)
    ta.fit(synth_data, checkpoint_path=str(tmp_path / "saved" / "full"))
    full = losses(ta)

    cfg_b = _cfg(tmp_path, epochs=2)
    model_b = get_model("RecBLR")(cfg_b, synth_data.n_items, synth_data.max_seq_len)
    tb = Trainer(cfg_b, model_b)
    tb.fit(synth_data, checkpoint_path=str(tmp_path / "saved" / "part"))
    part = losses(tb)
    # identical prefix before the interruption
    for e in part:
        assert part[e] == full[e], f"epoch {e} diverged before resume"

    cfg_c = _cfg(tmp_path, epochs=4)
    model_c = get_model("RecBLR")(cfg_c, synth_data.n_items, synth_data.max_seq_len)
    tc = Trainer(cfg_c, model_c)
    tc.resume_from(tb.ckpt_path)
    tc.fit(synth_data, checkpoint_path=str(tmp_path / "saved" / "resumed"))
    resumed = losses(tc)
    assert resumed, "resumed run trained no epochs"
    for e, v in resumed.items():
        assert v == full[e], f"epoch {e}: resumed {v} != uninterrupted {full[e]}"


def test_checkpoint_pickle_fallback_warns(tmp_path, synth_data, monkeypatch, caplog):
    import logging
    import sys

    from datamining_recblr_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = _cfg(tmp_path)
    model = get_model("RecBLR")(cfg, synth_data.n_items, synth_data.max_seq_len)
    trainer = Trainer(cfg, model)
    state = trainer._checkpoint_state(1)
    monkeypatch.setitem(sys.modules, "orbax.checkpoint", None)  # import -> error
    with caplog.at_level(logging.WARNING, logger="datamining_recblr_tpu"):
        path = save_checkpoint(str(tmp_path / "fb" / "ck"), state)
    assert path.endswith(".pkl")
    assert any("pickle fallback" in r.message for r in caplog.records)
    back = restore_checkpoint(path)
    assert int(back["epoch"]) == 1


def test_checkpoint_roundtrip(tmp_path, synth_data):
    cfg = _cfg(tmp_path)
    model = get_model("RecBLR")(cfg, synth_data.n_items, synth_data.max_seq_len)
    trainer = Trainer(cfg, model)
    from datamining_recblr_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    state = trainer._checkpoint_state(3)
    path = save_checkpoint(str(tmp_path / "ck" / "test"), state)
    back = restore_checkpoint(path, state)
    assert int(back["epoch"]) == 3
    orig = jax.tree.leaves(state["params"])
    rest = jax.tree.leaves(back["params"])
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_streamed_split_matches_resident(synth_data, tmp_path, monkeypatch):
    """When the train split exceeds the resident-HBM budget the trainer
    streams host batches (XLong-scale splits); the trajectory must be
    identical to the resident-gather path."""
    import datamining_recblr_tpu.train.trainer as TR

    def run():
        cfg = _cfg(tmp_path, epochs=2)
        model = get_model("RecBLR")(
            cfg, synth_data.n_items, synth_data.max_seq_len
        )
        tr = Trainer(cfg, model)
        tr.fit(synth_data)
        return tr.evaluate(synth_data.test, load_best=False)

    res_resident = run()
    monkeypatch.setattr(TR, "_RESIDENT_SPLIT_BUDGET", 0)
    res_stream = run()
    for k, v in res_resident.items():
        assert abs(res_stream[k] - v) < 1e-9, k
    # dispatch-batched streaming (tiny K so blocks + tail both run):
    # the lax.scan over stacked batches must reproduce the same
    # trajectory as per-step dispatches (same fold_in(step) seeding)
    monkeypatch.setattr(TR, "_STREAM_BLOCK_MAX_STEPS", 2)
    res_scan = run()
    for k, v in res_resident.items():
        assert abs(res_scan[k] - v) < 1e-9, k


def test_epoch_scan_matches_per_step(synth_data, tmp_path):
    """The one-dispatch-per-epoch lax.scan path must reproduce the
    per-step resident path's trajectory exactly (same permutation
    slices, same weight masking of the padded tail, same fold_in
    seeding)."""

    def run(scan):
        cfg = _cfg(tmp_path, epochs=2, epoch_scan=scan)
        model = get_model("RecBLR")(
            cfg, synth_data.n_items, synth_data.max_seq_len
        )
        tr = Trainer(cfg, model)
        tr.fit(synth_data)
        return tr.evaluate(synth_data.test, load_best=False)

    res_scan = run(True)
    res_step = run(False)
    for k, v in res_step.items():
        assert abs(res_scan[k] - v) < 1e-9, k


@pytest.mark.slow
@pytest.mark.parametrize("seq_len", [16, 12])
def test_compact_split_trains_identically(tmp_path, monkeypatch, seq_len):
    """The COMPACT train split's on-device batch assembly (gather from
    the flat item stream) must reproduce the dense resident path's
    trajectory exactly — same samples, same order, same seeding.
    seq_len=16 runs the 8-wide row-gather assembly (flat_wide), 12 the
    elementwise-gather fallback."""
    import datamining_recblr_tpu.data.dataset as DS
    from datamining_recblr_tpu.data.synthetic import (
        generate_synthetic_interactions,
    )

    df = generate_synthetic_interactions(
        n_users=80, n_items=40, min_len=8, max_len=20, markov_weight=0.9,
        seed=21,
    )

    def run(data):
        cfg = _cfg(tmp_path, epochs=2, MAX_ITEM_LIST_LENGTH=seq_len)
        model = get_model("RecBLR")(cfg, data.n_items, data.max_seq_len)
        tr = Trainer(cfg, model)
        tr.fit(data)
        return tr.evaluate(data.test, load_best=False)

    res_dense = run(DS.build_from_dataframe(df, max_seq_len=seq_len))
    monkeypatch.setattr(DS, "_COMPACT_TRAIN_ELEMS", 0)
    data_c = DS.build_from_dataframe(df, max_seq_len=seq_len)
    assert data_c.train.compact
    res_compact = run(data_c)
    for k, v in res_dense.items():
        assert abs(res_compact[k] - v) < 1e-9, k
