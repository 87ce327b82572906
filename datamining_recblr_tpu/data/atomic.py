"""RecBole *atomic file* reader.

The reference's datasets are RecBole atomic files: TSV with a typed
header row ``field:type`` per column, e.g.
``user_id:token\titem_id:token\ttimestamp:float`` (visible in reference
``trim.py:3-4`` and the load_col config at ``config.yaml:23-24``).
Types: ``token`` (string id), ``float``, ``token_seq``, ``float_seq``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

_DTYPE_FOR = {
    "token": str,
    "float": np.float64,
    "token_seq": str,
    "float_seq": str,
}


def read_atomic_file(path: str, columns: list[str] | None = None) -> pd.DataFrame:
    """Read an atomic ``.inter``/``.item``/``.user`` file.

    Returns a DataFrame whose column names have the ``:type`` suffix
    stripped.  If ``columns`` is given, only those are kept (parity with
    RecBole's ``load_col``).
    """
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
    names, dtypes = [], {}
    for col in header:
        if ":" in col:
            name, ftype = col.rsplit(":", 1)
        else:
            name, ftype = col, "token"
        names.append(name)
        dtypes[name] = _DTYPE_FOR.get(ftype, str)
    df = pd.read_csv(
        path,
        sep="\t",
        skiprows=1,
        names=names,
        dtype=dtypes,
        na_filter=False,
    )
    if columns is not None:
        missing = [c for c in columns if c not in df.columns]
        if missing:
            raise KeyError(f"{path}: missing columns {missing}; has {list(df.columns)}")
        df = df[list(columns)]
    return df


def write_atomic_inter(
    df: pd.DataFrame,
    path: str,
    user_field: str = "user_id",
    item_field: str = "item_id",
    time_field: str = "timestamp",
):
    """Write a ``.inter`` atomic file with typed headers (used by the
    data-prep utilities and the cold-start split writer, parity with
    reference ``run_with_unseen.py:90-95``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = f"{user_field}:token\t{item_field}:token\t{time_field}:float\n"
    with open(path, "w") as f:
        f.write(header)
        df.to_csv(
            f,
            sep="\t",
            header=False,
            index=False,
            columns=[user_field, item_field, time_field],
        )
