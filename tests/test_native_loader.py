"""Native (C++) data loader vs the Python builder: bit-identical output
contract on synthetic datasets, including filtering, remapping, splits,
augmentation ordering, and token maps."""

import numpy as np
import pytest

from datamining_recblr_tpu.data import native
from datamining_recblr_tpu.data.atomic import read_atomic_file
from datamining_recblr_tpu.data.dataset import build_from_dataframe
from datamining_recblr_tpu.data.synthetic import write_synthetic_inter

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.mark.parametrize(
    "user_interval,item_interval",
    [(None, None), ("[5,inf)", "[5,inf)"), ("[3,inf)", "[2,inf)")],
)
def test_native_matches_python(tmp_path, user_interval, item_interval):
    path = str(tmp_path / "toy" / "toy.inter")
    write_synthetic_inter(
        path, n_users=120, n_items=60, min_len=4, max_len=25, seed=13
    )
    df = read_atomic_file(path)
    py = build_from_dataframe(
        df, max_seq_len=12,
        user_interval=user_interval, item_interval=item_interval,
    )
    nat = native.build_dataset_from_file(
        path, max_seq_len=12,
        user_interval=user_interval, item_interval=item_interval,
    )

    assert nat.n_users == py.n_users
    assert nat.n_items == py.n_items
    assert nat.n_interactions == py.n_interactions
    assert nat.item_token2id == py.item_token2id
    assert nat.user_token2id == py.user_token2id

    for split in ["train", "valid", "test"]:
        a, b = getattr(nat, split), getattr(py, split)
        assert len(a) == len(b), split
        np.testing.assert_array_equal(a.item_seq, b.item_seq, err_msg=split)
        np.testing.assert_array_equal(a.item_seq_len, b.item_seq_len, err_msg=split)
        np.testing.assert_array_equal(a.pos_item, b.pos_item, err_msg=split)
        np.testing.assert_array_equal(a.user_id, b.user_id, err_msg=split)

    assert len(nat.user_train_items) == len(py.user_train_items)
    for a, b in zip(nat.user_train_items, py.user_train_items):
        np.testing.assert_array_equal(a, b)


def test_build_dataset_uses_native(tmp_path):
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.dataset import build_dataset

    path = str(tmp_path / "toy2" / "toy2.inter")
    write_synthetic_inter(path, n_users=40, n_items=25, seed=3)
    cfg = Config(
        model="RecBLR",
        config_dict={
            "dataset": "toy2",
            "data_path": str(tmp_path),
            "MAX_ITEM_LIST_LENGTH": 10,
            "user_inter_num_interval": "[3,inf)",
            "item_inter_num_interval": "[1,inf)",
        },
    )
    d_native = build_dataset(cfg)
    cfg["use_native_loader"] = False
    d_python = build_dataset(cfg)
    np.testing.assert_array_equal(d_native.train.item_seq, d_python.train.item_seq)
    assert d_native.summary() == d_python.summary()


def test_native_build_nullptr_raises(tmp_path, monkeypatch):
    """rb_build returning nullptr must surface a Python error, not a
    silent pandas switch (native/rec_data.cc rb_build error paths)."""
    path = str(tmp_path / "toy3" / "toy3.inter")
    write_synthetic_inter(path, n_users=20, n_items=10, seed=5)

    class NullBuildLib:
        def __init__(self, real):
            self._real = real

        def rb_build(self, *a):
            return None  # simulate fopen/fread failure

        def __getattr__(self, name):
            return getattr(self._real, name)

    real = native._load()
    monkeypatch.setattr(native, "_LIB", NullBuildLib(real))
    with pytest.raises(RuntimeError, match="native build failed"):
        native.build_dataset_from_file(path, max_seq_len=8)


def test_build_dataset_warns_on_native_failure(tmp_path, monkeypatch, caplog):
    import logging

    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.dataset import build_dataset

    path = str(tmp_path / "toy4" / "toy4.inter")
    write_synthetic_inter(path, n_users=40, n_items=25, seed=7)
    cfg = Config(
        model="RecBLR",
        config_dict={
            "dataset": "toy4",
            "data_path": str(tmp_path),
            "MAX_ITEM_LIST_LENGTH": 10,
        },
    )

    def boom(*a, **k):
        raise RuntimeError("native build failed for test")

    monkeypatch.setattr(native, "build_dataset_from_file", boom)
    with caplog.at_level(logging.WARNING, logger="datamining_recblr_tpu"):
        data = build_dataset(cfg)
    assert data.n_users > 1  # Python fallback still built the dataset
    assert any("native loader failed" in r.message for r in caplog.records)


def test_native_compact_train_matches_dense(tmp_path, monkeypatch):
    """Above the compact threshold the native wrapper must return the
    COMPACT train form (built from rb_train_lists) with sample-for-
    sample identical content to the dense native build — this is the
    path XLong takes through build_dataset (round-5 fix: the native
    loader used to always materialize the dense train split, silently
    bypassing the device-resident compact path in the trainer)."""
    import datamining_recblr_tpu.data.dataset as ds_mod

    path = str(tmp_path / "toyc" / "toyc.inter")
    write_synthetic_inter(
        path, n_users=80, n_items=50, min_len=4, max_len=20, seed=5
    )
    dense = native.build_dataset_from_file(path, max_seq_len=12)
    assert not dense.train.compact
    monkeypatch.setattr(ds_mod, "_COMPACT_TRAIN_ELEMS", 0)
    compact = native.build_dataset_from_file(path, max_seq_len=12)
    a, b = compact.train, dense.train
    assert a.compact
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.item_seq_len, b.item_seq_len)
    np.testing.assert_array_equal(a.pos_item, b.pos_item)
    np.testing.assert_array_equal(a.user_id, b.user_id)
    idx = np.arange(len(a))
    np.testing.assert_array_equal(a.windows(idx), b.item_seq)
    # valid/test stay dense
    assert not compact.valid.compact and not compact.test.compact
