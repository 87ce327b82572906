#!/usr/bin/env python
"""Item-feature preparation CLI — equivalent of the reference's
``prepare_item_features.py``: build ``<ds>_item_features.csv`` from
``.item`` text metadata when present, otherwise synthesize descriptions
from interaction statistics (vectorized, not the reference's O(N^2)
per-item loop)."""

import argparse

from datamining_recblr_tpu.unseen.features import prepare_item_features


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--data_path", default="dataset")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    feats = prepare_item_features(args.dataset, args.data_path, args.out)
    print(f"wrote {len(feats)} item feature rows")


if __name__ == "__main__":
    main()
