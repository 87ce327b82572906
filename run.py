#!/usr/bin/env python
"""Single-model experiment CLI — equivalent of the reference's
``run.py`` driver (reference ``run.py:25-117``): pick a model with
``--model {B,R,S}`` (BERT4Rec / RecBLR / SASRec), layer yaml configs,
train with per-epoch validation + early stopping, test with the best
checkpoint, emit metrics CSV and plots."""

import argparse

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.drivers import run_experiment
from datamining_recblr_tpu.eval.evaluator import format_result

MODEL_NAMES = {"B": "BERT4Rec", "R": "RecBLR", "S": "SASRec"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model", "-m", default="R",
        help="B (BERT4Rec), R (RecBLR), S (SASRec), or a full model name",
    )
    ap.add_argument(
        "--config", "-c", action="append", default=None,
        help="yaml config file(s); defaults to config.yaml if present",
    )
    ap.add_argument("--dataset", "-d", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--plot_prefix", default=None)
    args = ap.parse_args()

    model_name = MODEL_NAMES.get(args.model, args.model)
    import os

    files = args.config
    if files is None:
        files = ["config.yaml"] if os.path.exists("config.yaml") else []

    overrides = {}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    # non-RecBLR models don't take the ablation flags (reference run.py:42-45)
    if model_name != "RecBLR":
        overrides.update(
            bd_lru_only=False, disable_conv1d=False, disable_ffn=False
        )

    config = Config(
        model=model_name,
        dataset=args.dataset,
        config_file_list=files,
        config_dict=overrides,
    )
    result = run_experiment(config, plot_prefix=args.plot_prefix)
    print("best valid:", format_result(result["best_valid_result"]))
    print("test:", format_result(result["test_result"]))


if __name__ == "__main__":
    main()
