#!/usr/bin/env python
"""Dataset trimming utility — equivalent of the reference's ``trim.py``:
sort a ``.inter`` file by timestamp and keep the most recent 1/N."""

import argparse

from datamining_recblr_tpu.data.atomic import read_atomic_file, write_atomic_inter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="input .inter path")
    ap.add_argument("output", help="output .inter path")
    ap.add_argument("--keep_fraction", type=float, default=1 / 8,
                    help="most-recent fraction to keep (reference: 1/8 of yelp)")
    ap.add_argument("--time_field", default="timestamp")
    args = ap.parse_args()

    df = read_atomic_file(args.input)
    df = df.sort_values(args.time_field, kind="stable")
    keep = int(len(df) * args.keep_fraction)
    out = df.iloc[len(df) - keep :]
    write_atomic_inter(out, args.output)
    print(f"kept {len(out)}/{len(df)} most recent interactions -> {args.output}")


if __name__ == "__main__":
    main()
