"""Data layer golden tests: atomic file parsing, k-core filtering, ID
remap, leave-one-out split, and prefix augmentation — hand-computed
expectations on tiny datasets."""

import numpy as np
import pandas as pd

from datamining_recblr_tpu.data.atomic import read_atomic_file, write_atomic_inter
from datamining_recblr_tpu.data.batching import iter_batches
from datamining_recblr_tpu.data.dataset import (
    build_from_dataframe,
    kcore_filter,
    parse_interval,
)
from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions


def _df(rows):
    return pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"])


def test_parse_interval():
    p = parse_interval("[5,inf)")
    np.testing.assert_array_equal(p(np.array([4, 5, 6, 100])), [False, True, True, True])
    p2 = parse_interval("[0,10]")
    np.testing.assert_array_equal(p2(np.array([0, 10, 11])), [True, True, False])


def test_atomic_roundtrip(tmp_path):
    df = _df([("u1", "a", 1.0), ("u2", "b", 2.0)])
    path = str(tmp_path / "toy" / "toy.inter")
    write_atomic_inter(df, path)
    back = read_atomic_file(path, columns=["user_id", "item_id", "timestamp"])
    assert list(back["user_id"]) == ["u1", "u2"]
    assert list(back["item_id"]) == ["a", "b"]
    assert back["timestamp"].tolist() == [1.0, 2.0]


def test_kcore_iterates_to_fixpoint():
    rows = [
        ("u1", "a", 1), ("u1", "b", 2), ("u1", "c", 3), ("u1", "a", 4),
        ("u2", "c", 1), ("u2", "b", 2), ("u2", "a", 3), ("u2", "e", 4),
        ("u3", "c", 1), ("u3", "d", 2),
    ]
    df = _df(rows)
    out = kcore_filter(df, "user_id", "item_id", "[3,inf)", "[2,inf)")
    # u3 dropped (2 < 3) -> d gone with it; e dropped (count 1 < 2) but
    # u2 still has 3 inters, so the filter converges to u1+u2 without e.
    assert set(out["user_id"]) == {"u1", "u2"}
    assert "e" not in set(out["item_id"]) and "d" not in set(out["item_id"])
    assert len(out) == 7


def test_leave_one_out_split_and_augmentation():
    rows = [
        ("u1", "a", 1), ("u1", "b", 2), ("u1", "c", 3), ("u1", "d", 4), ("u1", "e", 5),
        ("u2", "b", 1), ("u2", "c", 2), ("u2", "a", 3),
    ]
    data = build_from_dataframe(_df(rows), max_seq_len=4)
    # remap: first-appearance order in time-sorted table:
    # times sorted stable: (u1,a,1),(u2,b,1),(u1,b,2),(u2,c,2),(u1,c,3),(u2,a,3),(u1,d,4),(u1,e,5)
    # items first seen: a=1, b=2, c=3, d=4, e=5 ; users u1=1, u2=2
    assert data.item_token2id == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
    assert data.n_items == 6 and data.n_users == 3

    # u1 items [a,b,c,d,e] -> train [a,b,c], valid d, test e
    # u2 items [b,c,a] -> train [b], valid c, test a
    # train prefixes: u1: ([a],b), ([a,b],c); u2: none (train part len 1)
    assert len(data.train) == 2
    np.testing.assert_array_equal(data.train.pos_item, [2, 3])
    np.testing.assert_array_equal(data.train.item_seq[0], [1, 0, 0, 0])
    np.testing.assert_array_equal(data.train.item_seq[1], [1, 2, 0, 0])

    # valid: u1 ([a,b,c], d), u2 ([b], c)
    assert len(data.valid) == 2
    np.testing.assert_array_equal(sorted(data.valid.pos_item), [3, 4])
    # test: u1 ([a,b,c,d], e), u2 ([b,c], a)
    assert len(data.test) == 2
    row_u1 = list(data.test.user_id).index(1)
    np.testing.assert_array_equal(data.test.item_seq[row_u1], [1, 2, 3, 4])
    assert data.test.pos_item[row_u1] == 5


def test_max_len_truncation_keeps_most_recent():
    rows = [("u1", f"i{k}", k) for k in range(10)]
    # need another user so i-items pass no filtering (none configured)
    data = build_from_dataframe(_df(rows), max_seq_len=3)
    # train part = items[:-2] = i0..i7 ; longest prefix sample is ([i0..i6], i7)
    # truncated to last 3: [i4,i5,i6]
    last = np.argmax(data.train.item_seq_len)
    longest = data.train.item_seq[list(data.train.pos_item).index(8)]
    # i4 has id 5 (ids start at 1 in appearance order)
    np.testing.assert_array_equal(longest, [5, 6, 7])
    assert data.train.item_seq_len[list(data.train.pos_item).index(8)] == 3
    del last


def test_batching_pads_and_masks():
    from datamining_recblr_tpu.data.dataset import SplitArrays

    n = 5
    split = SplitArrays(
        np.arange(n * 4, dtype=np.int32).reshape(n, 4) % 7,
        np.full(n, 4, np.int32),
        np.arange(1, n + 1, dtype=np.int32),
        np.arange(n, dtype=np.int32),
    )
    batches = list(iter_batches(split, batch_size=3))
    assert len(batches) == 2
    assert batches[0]["weight"].sum() == 3
    assert batches[1]["weight"].sum() == 2
    assert batches[1]["item_seq"].shape == (3, 4)

    rng = np.random.default_rng(0)
    bneg = list(iter_batches(split, 3, shuffle=True, rng=rng, neg_items=7))
    assert all("neg_item" in b for b in bneg)
    assert all((b["neg_item"] >= 1).all() and (b["neg_item"] < 7).all() for b in bneg)


def test_synthetic_generator_shapes():
    df = generate_synthetic_interactions(n_users=20, n_items=15, seed=1)
    data = build_from_dataframe(
        df, max_seq_len=10, user_interval="[5,inf)", item_interval="[1,inf)"
    )
    assert data.n_users > 1 and data.n_items > 1
    assert len(data.train) > 0 and len(data.valid) > 0 and len(data.test) > 0
    # every valid/test user appears exactly once
    assert len(set(data.test.user_id)) == len(data.test)


def test_stat_matched_generator_exact_counts():
    """generate_stat_matched_interactions must reproduce target dataset
    statistics exactly, and survive the reference's 5-core filter
    (config.yaml user/item_inter_num_interval [5,inf)) unchanged."""
    from datamining_recblr_tpu.data.synthetic import (
        generate_stat_matched_interactions,
    )

    n_users, n_items, n_inters = 300, 120, 2400
    df = generate_stat_matched_interactions(
        n_users, n_items, n_inters, n_clusters=12, seed=3
    )
    assert len(df) == n_inters
    assert df["user_id"].nunique() == n_users
    assert df["item_id"].nunique() == n_items
    assert df.groupby("user_id").size().min() >= 5
    assert df.groupby("item_id").size().min() >= 5
    # the 5-core fixpoint keeps every row
    out = kcore_filter(df, "user_id", "item_id", "[5,inf)", "[5,inf)")
    assert len(out) == n_inters
    # timestamps strictly increase within each user (TO split order)
    ts = df.sort_values(["user_id", "timestamp"]).groupby("user_id")["timestamp"]
    assert (ts.diff().dropna() > 0).all()


def test_compact_train_split_matches_dense(monkeypatch):
    """The COMPACT train split (windows into per-user streams, built
    for XLong-scale splits that must never materialize [N, L]) must
    hold exactly the same samples in exactly the same order as the
    dense build — the trainer's seeded permutation indexes by row."""
    import numpy as np

    import datamining_recblr_tpu.data.dataset as DS
    from datamining_recblr_tpu.data.synthetic import (
        generate_synthetic_interactions,
    )

    df = generate_synthetic_interactions(
        n_users=50, n_items=30, min_len=6, max_len=18, seed=11
    )
    dense = DS.build_from_dataframe(df, max_seq_len=8)
    monkeypatch.setattr(DS, "_COMPACT_TRAIN_ELEMS", 0)
    comp = DS.build_from_dataframe(df, max_seq_len=8)

    assert not dense.train.compact and comp.train.compact
    assert comp.train.item_seq is None
    assert len(comp.train) == len(dense.train)
    assert comp.train.seq_len == dense.train.seq_len == 8
    idx = np.arange(len(dense.train))
    np.testing.assert_array_equal(comp.train.windows(idx), dense.train.item_seq)
    np.testing.assert_array_equal(comp.train.item_seq_len, dense.train.item_seq_len)
    np.testing.assert_array_equal(comp.train.pos_item, dense.train.pos_item)
    np.testing.assert_array_equal(comp.train.user_id, dense.train.user_id)
    # take() keeps the compact form consistent
    sub = comp.train.take(idx[5:17])
    np.testing.assert_array_equal(sub.windows(np.arange(12)),
                                  dense.train.item_seq[5:17])
    # valid/test stay dense
    assert not comp.valid.compact and not comp.test.compact


def test_stat_matched_user_preference_component():
    """pref_weight > 0 keeps the exact-stats contract AND concentrates
    each user's items into their latent preferred clusters (the
    co-occurrence signal the round-4 BERT4Rec diagnostic found missing
    from a pure first-order chain); pref_weight = 0 must regenerate the
    old generator's output bit-identically (same rng call sequence) so
    the canonical preset datasets are unchanged."""
    import numpy as np

    from datamining_recblr_tpu.data.synthetic import (
        generate_stat_matched_interactions,
    )

    n_users, n_items, n_inters = 300, 120, 2400
    base = generate_stat_matched_interactions(
        n_users, n_items, n_inters, n_clusters=12, seed=3
    )
    base_again = generate_stat_matched_interactions(
        n_users, n_items, n_inters, n_clusters=12, seed=3, pref_weight=0.0
    )
    assert base.equals(base_again)

    pref = generate_stat_matched_interactions(
        n_users, n_items, n_inters, n_clusters=12, seed=3,
        markov_weight=0.15, pref_weight=0.5, pref_k=2,
    )
    assert len(pref) == n_inters
    assert pref["user_id"].nunique() == n_users
    assert pref["item_id"].nunique() == n_items
    assert pref.groupby("user_id").size().min() >= 5
    assert pref.groupby("item_id").size().min() >= 5

    # concentration: mean number of distinct clusters a user touches
    # must drop vs the preference-free generator (items pile into each
    # user's pref_k clusters instead of wandering)
    def mean_user_clusters(df, seed):
        rng = np.random.default_rng(seed)
        # regenerate the same cluster assignment the generator drew:
        # consume the lens draws first (gamma), then clusters
        items = df["item_id"].str.slice(1).astype(int)
        # proxy clustering: item id ranges don't map to clusters, so
        # measure distinct-ITEM spread per user scaled by repeats
        g = df.assign(item=items).groupby("user_id")["item"]
        return (g.nunique() / g.size()).mean()

    # with preference pull, users revisit their clusters' items more:
    # distinct-item ratio per user drops measurably
    assert mean_user_clusters(pref, 3) < mean_user_clusters(base, 3) - 0.02


def test_beauty_synth_reproduces_reference_logged_stats(tmp_path):
    """The beauty-scale preset, through the FULL data pipeline (atomic
    file -> 5-core filter -> remap -> leave-one-out -> augmentation),
    must reproduce the reference's logged post-filter statistics
    exactly: 18,897 users / 10,544 items / 167,588 interactions
    (reference log RecBLR-amazon-beauty-Nov-23-2025_12-40-09 lines
    109-116) — the closest attainable stand-in for the real-data golden
    test while the `.inter` blobs are stripped from this environment."""
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.dataset import build_dataset
    from datamining_recblr_tpu.data.synthetic import write_stat_matched_dataset

    write_stat_matched_dataset(str(tmp_path), "beauty-synth")
    cfg = Config(
        model="RecBLR",
        dataset="beauty-synth",
        config_dict={
            "data_path": str(tmp_path),
            # T=50 keeps the augmented arrays small; the user/item/
            # interaction counts don't depend on it
            "MAX_ITEM_LIST_LENGTH": 50,
        },
    )
    data = build_dataset(cfg)
    assert data.n_users - 1 == 18897
    assert data.n_items - 1 == 10544
    # one valid + one test sample per user (leave-one-out);
    # train samples = prefix augmentation of the rest
    assert len(data.valid) == 18897 and len(data.test) == 18897
    assert len(data.train) == 167588 - 3 * 18897
