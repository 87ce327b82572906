"""Sequential dataset construction: filtering, ID remap, leave-one-out
split, prefix augmentation — host-side NumPy/pandas, emitting the
fixed-shape arrays the jitted TPU train/eval steps consume.

Behavioral contract (pinned by the reference run-log config dump,
SURVEY.md §2.3):

* iterative k-core interval filtering (``user_inter_num_interval`` /
  ``item_inter_num_interval``, reference ``config.yaml:26-27``) applied
  until fixpoint;
* token -> contiguous id remap with ``[PAD]`` = 0 in first-appearance
  order (RecBole semantics; ``run_with_unseen.py:213,233`` relies on
  ``token2id``/``id2token``);
* time-ordered (stable sort) per-user sequences, leave-one-out split
  ``LS: valid_and_test`` — last item test, second-to-last valid
  (log:31);
* prefix augmentation of the training portion: one sample per prefix
  (RecBole sequential augmentation), sequences truncated to the most
  recent ``MAX_ITEM_LIST_LENGTH`` items.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from datamining_recblr_tpu.data.atomic import read_atomic_file


# ---------------------------------------------------------------------------
# interval filtering
# ---------------------------------------------------------------------------

_INTERVAL_RE = re.compile(r"^\s*([\[(])\s*([^,]+)\s*,\s*([^)\]]+)\s*([)\]])\s*$")

# Above this many [N, L] elements (1 GB of int32) the augmented train
# split is built in COMPACT form (windows into per-user streams) and
# never materialized dense — see SplitArrays.
_COMPACT_TRAIN_ELEMS = 256 * 1024 * 1024


def parse_interval(spec: str | None):
    """Parse a RecBole interval string like ``"[5,inf)"`` into an
    inclusive/exclusive (lo, hi) predicate over counts."""
    if not spec:
        return lambda c: np.ones_like(c, dtype=bool)
    m = _INTERVAL_RE.match(spec)
    if not m:
        raise ValueError(f"bad interval spec {spec!r}")
    lbr, lo_s, hi_s, rbr = m.groups()
    lo = float(lo_s)
    hi = float(hi_s)

    def pred(c):
        c = np.asarray(c, dtype=np.float64)
        ok_lo = c >= lo if lbr == "[" else c > lo
        ok_hi = c <= hi if rbr == "]" else c < hi
        return ok_lo & ok_hi

    return pred


def kcore_filter(
    df: pd.DataFrame,
    user_field: str,
    item_field: str,
    user_interval: str | None,
    item_interval: str | None,
) -> pd.DataFrame:
    """Iteratively drop users/items whose interaction count falls outside
    the configured intervals, until stable (RecBole
    ``_filter_by_inter_num`` semantics)."""
    upred = parse_interval(user_interval)
    ipred = parse_interval(item_interval)
    while True:
        n = len(df)
        ucnt = df[user_field].value_counts()
        keep_users = ucnt.index[upred(ucnt.values)]
        df = df[df[user_field].isin(set(keep_users))]
        icnt = df[item_field].value_counts()
        keep_items = icnt.index[ipred(icnt.values)]
        df = df[df[item_field].isin(set(keep_items))]
        if len(df) == n:
            return df


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------

@dataclass
class SplitArrays:
    """Fixed-shape sample arrays for one split.

    Two storage forms:

    * DENSE: ``item_seq [N, L]`` holds every sample's window.
    * COMPACT (large train splits): ``item_seq is None``; each sample j
      is the left-aligned window ``flat_items[flat_start[j] :
      flat_start[j] + item_seq_len[j]]`` of the concatenated per-user
      item streams.  Augmented prefix samples are just windows into
      those streams, so the compact form is ~L times smaller (XLong:
      ~63 MB vs 16 GB) — small enough to live device-resident, which is
      what makes XLong-scale training feed the chip over a ~20 MB/s
      remote tunnel (the dense split cannot: ~16 GB/epoch of batch
      uploads).  ``windows()`` materializes dense rows on the host for
      consumers that need them.
    """

    item_seq: np.ndarray | None  # [N, L] int32, right-padded with 0 (dense)
    item_seq_len: np.ndarray  # [N]    int32
    pos_item: np.ndarray      # [N]    int32 target item
    user_id: np.ndarray       # [N]    int32
    flat_items: np.ndarray | None = None  # [total] int32 (compact)
    flat_start: np.ndarray | None = None  # [N]     int32 (compact)
    max_seq_len: int = 0      # L (compact; dense reads item_seq.shape[1])

    def __len__(self):
        return len(self.pos_item)

    @property
    def compact(self) -> bool:
        return self.item_seq is None

    @property
    def seq_len(self) -> int:
        return self.max_seq_len if self.compact else self.item_seq.shape[1]

    def take(self, idx):
        if self.compact:
            return SplitArrays(
                None,
                self.item_seq_len[idx],
                self.pos_item[idx],
                self.user_id[idx],
                flat_items=self.flat_items,
                flat_start=self.flat_start[idx],
                max_seq_len=self.max_seq_len,
            )
        return SplitArrays(
            self.item_seq[idx],
            self.item_seq_len[idx],
            self.pos_item[idx],
            self.user_id[idx],
        )

    def windows(self, idx) -> np.ndarray:
        """[len(idx), L] int32 dense windows for the given sample rows
        (host-side; works on both storage forms)."""
        if not self.compact:
            return self.item_seq[idx]
        t = self.max_seq_len
        start = self.flat_start[idx].astype(np.int64)
        lens = self.item_seq_len[idx]
        cols = start[:, None] + np.arange(t, dtype=np.int64)[None, :]
        valid = np.arange(t, dtype=np.int32)[None, :] < lens[:, None]
        flat = self.flat_items
        return np.where(
            valid, flat[np.minimum(cols, len(flat) - 1)], 0
        ).astype(np.int32)


@dataclass
class SeqData:
    n_users: int              # includes PAD=0
    n_items: int              # includes PAD=0
    n_interactions: int
    max_seq_len: int
    train: SplitArrays
    valid: SplitArrays
    test: SplitArrays
    user_token2id: dict = field(default_factory=dict)
    item_token2id: dict = field(default_factory=dict)
    user_id2token: list = field(default_factory=list)
    item_id2token: list = field(default_factory=list)
    # full per-user train sequences (list of np arrays), for history masks
    user_train_items: list = field(default_factory=list)

    def summary(self) -> str:
        return (
            f"users={self.n_users - 1} items={self.n_items - 1} "
            f"inters={self.n_interactions} | train={len(self.train)} "
            f"valid={len(self.valid)} test={len(self.test)} L={self.max_seq_len}"
        )

    def item_popularity(self) -> np.ndarray:
        """Per-item interaction counts over the training portion
        (indexed by item id, PAD=0 at index 0) — the popN eval
        sampling distribution."""
        counts = np.zeros(self.n_items, np.int64)
        for items in self.user_train_items:
            if len(items):
                counts += np.bincount(items, minlength=self.n_items)
        return counts


def compact_from_streams(
    flat: np.ndarray, lens_u: np.ndarray, max_seq_len: int
) -> SplitArrays:
    """COMPACT augmented train split from the concatenated per-user
    train streams (``flat``; user u's stream is the ``lens_u[u]``-long
    block in user order).  Sample order and content are identical to
    the dense prefix-augmentation build: users in remapped-id order,
    prefix length k = 1..L_u-1 ascending within each user.  Shared by
    the Python builder (``train_compact``) and the native-loader
    wrapper (``data/native.py``) so the two stay in lockstep."""
    lens_u = lens_u.astype(np.int64)
    off = np.concatenate([[0], np.cumsum(lens_u)])[:-1]
    n_per = np.maximum(lens_u - 1, 0)
    usr = np.repeat(np.arange(len(lens_u)), n_per).astype(np.int32)
    # per-sample prefix length k = 1..L_u-1, restarting at each user
    k = (
        np.arange(int(n_per.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(n_per) - n_per, n_per)
        + 1
    )
    tgt = flat[off[usr] + k].astype(np.int32)
    lens_s = np.minimum(k, max_seq_len).astype(np.int32)
    start = (off[usr] + k - lens_s).astype(np.int32)
    return SplitArrays(
        None, lens_s, tgt, usr,
        flat_items=flat.astype(np.int32, copy=False),
        flat_start=start, max_seq_len=max_seq_len,
    )


# ---------------------------------------------------------------------------
# core construction
# ---------------------------------------------------------------------------

def _remap(tokens: pd.Series):
    """First-appearance-order remap to contiguous ids starting at 1
    (id 0 = '[PAD]')."""
    cat = pd.unique(tokens)
    token2id = {t: i + 1 for i, t in enumerate(cat)}
    id2token = ["[PAD]"] + list(cat)
    ids = tokens.map(token2id).to_numpy(np.int32)
    return ids, token2id, id2token


def build_from_dataframe(
    df: pd.DataFrame,
    max_seq_len: int,
    user_field: str = "user_id",
    item_field: str = "item_id",
    time_field: str = "timestamp",
    user_interval: str | None = None,
    item_interval: str | None = None,
    augment_train: bool = True,
) -> SeqData:
    df = kcore_filter(df, user_field, item_field, user_interval, item_interval)

    # stable time-order sort, then group by user preserving time order
    df = df.sort_values(by=time_field, kind="stable")
    uids, u_t2i, u_i2t = _remap(df[user_field])
    iids, i_t2i, i_i2t = _remap(df[item_field])

    n_users = len(u_i2t)
    n_items = len(i_i2t)

    # per-user item lists in time order
    order = np.argsort(uids, kind="stable")
    sorted_u = uids[order]
    sorted_i = iids[order]
    boundaries = np.flatnonzero(np.diff(sorted_u)) + 1
    groups = np.split(sorted_i, boundaries)
    group_users = sorted_u[np.concatenate([[0], boundaries])] if len(sorted_u) else []

    user_train_items: list[np.ndarray] = [np.empty(0, np.int32)] * n_users

    train_samples: list[tuple[int, np.ndarray, int]] = []
    valid_samples: list[tuple[int, np.ndarray, int]] = []
    test_samples: list[tuple[int, np.ndarray, int]] = []

    for u, items in zip(group_users, groups):
        items = items.astype(np.int32)
        if len(items) < 3:
            # too short for LS split: everything goes to train prefixes
            train_part = items
            user_train_items[u] = train_part
            if augment_train:
                for k in range(1, len(train_part)):
                    train_samples.append((u, train_part[:k], train_part[k]))
            continue
        test_item = items[-1]
        valid_item = items[-2]
        train_part = items[:-2]
        user_train_items[u] = train_part
        if augment_train:
            for k in range(1, len(train_part)):
                train_samples.append((u, train_part[:k], train_part[k]))
        else:
            train_samples.append((u, train_part[:-1], train_part[-1]))
        valid_samples.append((u, train_part, valid_item))
        test_samples.append((u, items[:-1], test_item))

    def to_arrays(samples) -> SplitArrays:
        n = len(samples)
        seq = np.zeros((n, max_seq_len), np.int32)
        lens = np.zeros((n,), np.int32)
        tgt = np.zeros((n,), np.int32)
        usr = np.zeros((n,), np.int32)
        for j, (u, prefix, target) in enumerate(samples):
            window = prefix[-max_seq_len:]
            seq[j, : len(window)] = window
            lens[j] = len(window)
            tgt[j] = target
            usr[j] = u
        return SplitArrays(seq, lens, tgt, usr)

    def train_compact() -> SplitArrays:
        """COMPACT train split: augmented prefix samples as windows into
        the concatenated per-user streams — identical sample ORDER and
        content to the dense to_arrays(train_samples) build (users in
        remapped-id order, k ascending; verified by
        tests/test_data.py::test_compact_train_split_matches_dense)."""
        lens_u = np.array([len(x) for x in user_train_items], np.int64)
        flat = (
            np.concatenate([x for x in user_train_items if len(x)])
            if lens_u.sum()
            else np.empty(0, np.int32)
        ).astype(np.int32)
        return compact_from_streams(flat, lens_u, max_seq_len)

    # large augmented train splits skip the [N, L] host materialization
    # entirely (XLong: 3.9M x 1024 = 16 GB host RAM + a 16 GB/epoch
    # upload stream); the compact form feeds the device-resident
    # assembly path in train/trainer.py
    n_train_elems = len(train_samples) * max_seq_len
    use_compact = augment_train and n_train_elems > _COMPACT_TRAIN_ELEMS

    return SeqData(
        n_users=n_users,
        n_items=n_items,
        n_interactions=len(df),
        max_seq_len=max_seq_len,
        train=train_compact() if use_compact else to_arrays(train_samples),
        valid=to_arrays(valid_samples),
        test=to_arrays(test_samples),
        user_token2id=u_t2i,
        item_token2id=i_t2i,
        user_id2token=u_i2t,
        item_id2token=i_i2t,
        user_train_items=user_train_items,
    )


def build_dataset(config) -> SeqData:
    """Load the dataset named in config from ``<data_path>/<name>/<name>.inter``
    (RecBole directory layout) and build the splits."""
    name = config["dataset"]
    path = os.path.join(config["data_path"], name, f"{name}.inter")
    kwargs = dict(
        max_seq_len=config["MAX_ITEM_LIST_LENGTH"],
        user_field=config["USER_ID_FIELD"],
        item_field=config["ITEM_ID_FIELD"],
        time_field=config["TIME_FIELD"],
        user_interval=config["user_inter_num_interval"],
        item_interval=config["item_inter_num_interval"],
    )
    if config.get("use_native_loader", True):
        try:
            from datamining_recblr_tpu.data import native

            if native.available():
                return native.build_dataset_from_file(path, **kwargs)
        except Exception as e:
            # The Python builder is bit-identical, but silently switching
            # would hide a broken native build — make the fallback loud.
            import logging

            logging.getLogger("datamining_recblr_tpu").warning(
                "native loader failed (%s: %s); falling back to the Python"
                " builder", type(e).__name__, e,
            )
    load_col = config["load_col"] or {}
    df = read_atomic_file(path, columns=load_col.get("inter"))
    return build_from_dataframe(df, **kwargs)
