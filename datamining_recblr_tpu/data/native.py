"""ctypes bindings for the native (C++) data-loading core.

``native/rec_data.cc`` implements the atomic-file parse + k-core +
remap + split + augmentation pipeline with a bit-identical output
contract to the Python builder (``dataset.py``); this module loads the
shared library (built by ``make -C native``, checked into the package
tree as ``_rec_data.so``) and exposes ``build_dataset_native``.  When
the library is missing or the platform can't load it, everything falls
back to the Python path transparently."""

from __future__ import annotations

import ctypes
import math
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_rec_data.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.rb_build.restype = ctypes.c_void_p
    lib.rb_build.argtypes = [
        ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
    ]
    lib.rb_stat.restype = ctypes.c_int64
    lib.rb_stat.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rb_fill_split.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rb_tokens_size.restype = ctypes.c_int64
    lib.rb_tokens_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rb_tokens.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]
    lib.rb_train_items_total.restype = ctypes.c_int64
    lib.rb_train_items_total.argtypes = [ctypes.c_void_p]
    lib.rb_train_lists.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rb_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _interval_params(spec: str | None):
    if not spec:
        return (-math.inf, math.inf, 1, 1)
    from datamining_recblr_tpu.data.dataset import _INTERVAL_RE

    m = _INTERVAL_RE.match(spec)
    if not m:
        raise ValueError(f"bad interval spec {spec!r}")
    lbr, lo_s, hi_s, rbr = m.groups()
    return (float(lo_s), float(hi_s), 1 if lbr == "[" else 0, 1 if rbr == "]" else 0)


def build_dataset_from_file(
    path: str,
    max_seq_len: int,
    user_field: str = "user_id",
    item_field: str = "item_id",
    time_field: str = "timestamp",
    user_interval: str | None = None,
    item_interval: str | None = None,
):
    """Native-path equivalent of dataset.build_from_dataframe reading the
    file directly.  Returns SeqData."""
    from datamining_recblr_tpu.data.dataset import SeqData, SplitArrays

    lib = _load()
    assert lib is not None, "native library not available"

    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
    names = [c.rsplit(":", 1)[0] for c in header]
    cols = {}
    for want, key in [(user_field, "u"), (item_field, "i"), (time_field, "t")]:
        if want not in names:
            raise KeyError(f"{path}: column {want} not in header {names}")
        cols[key] = names.index(want)

    u_lo, u_hi, u_li, u_hi_i = _interval_params(user_interval)
    i_lo, i_hi, i_li, i_hi_i = _interval_params(item_interval)

    handle = lib.rb_build(
        path.encode(), max_seq_len,
        cols["u"], cols["i"], cols["t"],
        u_lo, u_hi, u_li, u_hi_i,
        i_lo, i_hi, i_li, i_hi_i,
    )
    if not handle:
        raise RuntimeError(f"native build failed for {path}")
    try:
        n_users = lib.rb_stat(handle, 0)
        n_items = lib.rb_stat(handle, 1)
        n_inter = lib.rb_stat(handle, 2)
        sizes = [lib.rb_stat(handle, 3 + s) for s in range(3)]

        def fetch_split(s, n):
            seq = np.zeros((n, max_seq_len), np.int32)
            lens = np.zeros((n,), np.int32)
            tgt = np.zeros((n,), np.int32)
            usr = np.zeros((n,), np.int32)
            if n:
                i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
                lib.rb_fill_split(handle, s, i32p(seq), i32p(lens), i32p(tgt), i32p(usr))
            return SplitArrays(seq, lens, tgt, usr)

        total = lib.rb_train_items_total(handle)
        offsets = np.zeros((n_users,), np.int64)
        items = np.zeros((max(total, 1),), np.int32)
        lib.rb_train_lists(
            handle,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            items.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        user_train_items = [np.empty(0, np.int32)] * int(n_users)
        prev = 0
        for uid in range(1, int(n_users)):
            end = int(offsets[uid])
            user_train_items[uid] = items[prev:end].copy()
            prev = end

        # Large augmented train splits come back COMPACT (windows into
        # the per-user streams we already fetched) instead of dense —
        # same trigger and same construction as the Python builder
        # (dataset.build_from_dataframe / compact_from_streams), so the
        # bit-identity contract holds on both storage forms.  Without
        # this, the native-loader path (preferred by build_dataset)
        # would hand the trainer a dense XLong split (16 GB) that can
        # only stream over the remote tunnel (~16 GB/epoch, the
        # round-4/round-5 ~700-800 s/epoch + ~10 GB RSS/epoch regime)
        # instead of the ~63 MB device-resident compact form.
        from datamining_recblr_tpu.data.dataset import (
            _COMPACT_TRAIN_ELEMS,
            compact_from_streams,
        )

        if sizes[0] * max_seq_len > _COMPACT_TRAIN_ELEMS:
            lens_u = np.diff(offsets, prepend=0)
            train = compact_from_streams(
                items[: int(total)], lens_u, max_seq_len
            )
            assert len(train) == sizes[0], (
                f"native compact train size {len(train)} != native "
                f"augmented size {sizes[0]}"
            )
        else:
            train = fetch_split(0, sizes[0])
        valid = fetch_split(1, sizes[1])
        test = fetch_split(2, sizes[2])

        def fetch_tokens(which):
            size = lib.rb_tokens_size(handle, which)
            buf = ctypes.create_string_buffer(int(size))
            lib.rb_tokens(handle, which, buf)
            toks = buf.raw.decode().split("\n")[:-1]
            return toks

        user_toks = fetch_tokens(0)
        item_toks = fetch_tokens(1)

        return SeqData(
            n_users=int(n_users),
            n_items=int(n_items),
            n_interactions=int(n_inter),
            max_seq_len=max_seq_len,
            train=train,
            valid=valid,
            test=test,
            user_token2id={t: i + 1 for i, t in enumerate(user_toks)},
            item_token2id={t: i + 1 for i, t in enumerate(item_toks)},
            user_id2token=["[PAD]"] + user_toks,
            item_id2token=["[PAD]"] + item_toks,
            user_train_items=user_train_items,
        )
    finally:
        lib.rb_free(handle)
