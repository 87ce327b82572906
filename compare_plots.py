#!/usr/bin/env python
"""Cross-run comparison plots — equivalent of the reference's
``compare_plots.py``, but reading structured JSONL metrics files
instead of scraping temp log files."""

import argparse
import os

from datamining_recblr_tpu.utils.logging import load_metrics
from datamining_recblr_tpu.utils.plotting import generate_comparison_plots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "metrics_files", nargs="+",
        help="metrics JSONL files (label=path or just path)",
    )
    ap.add_argument("--out", default="plot")
    args = ap.parse_args()

    runs = {}
    for spec in args.metrics_files:
        if "=" in spec:
            label, path = spec.split("=", 1)
        else:
            label, path = os.path.splitext(os.path.basename(spec))[0], spec
        records = [r for r in load_metrics(path) if r.get("event") == "epoch"]
        runs[label] = records
    generate_comparison_plots(runs, out_dir=args.out)
    print(f"comparison plots written to {args.out}/")


if __name__ == "__main__":
    main()
