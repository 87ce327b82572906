#!/usr/bin/env python
"""BERT4Rec multi-dataset driver — equivalent of the reference's
``run_bert4rec.py``: run BERT4Rec over a list of per-dataset configs
and emit per-run plots plus a comparison."""

import argparse
import os

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.drivers import run_experiment
from datamining_recblr_tpu.eval.evaluator import format_result
from datamining_recblr_tpu.utils.plotting import generate_comparison_plots

DEFAULT_CONFIGS = [
    "configs/config_amazon_beauty.yaml",
    "configs/config_amazon_apps.yaml",
    "configs/config_yelp.yaml",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", action="append", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    files = args.config or [f for f in DEFAULT_CONFIGS if os.path.exists(f)]
    if not files:
        raise SystemExit("no config files found; pass --config")

    overrides = {"bd_lru_only": False, "disable_conv1d": False, "disable_ffn": False}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs

    runs = {}
    for path in files:
        cfg = Config(model="BERT4Rec", config_file_list=[path], config_dict=overrides)
        name = cfg.get("dataset") or os.path.basename(path)
        result = run_experiment(cfg, plot_prefix=f"BERT4Rec_{name}")
        runs[name] = result["metrics"].epoch_records()
        print(f"[{name}] test:", format_result(result["test_result"]))
    generate_comparison_plots(runs, prefix="bert4rec")


if __name__ == "__main__":
    main()
