#!/usr/bin/env python
"""Experiment sweep orchestrator — equivalent of the reference's
``full_exp.py`` but in-process: instead of rewriting ``config.yaml``
from a template and shelling out a fresh interpreter per run
(reference ``full_exp.py:14-77`` — a file-system-mediated process
boundary), each variant is an in-memory Config and runs in this
process, sharing the loaded dataset.

Experiments (parity with reference ``full_exp.py:79-116``):
  --exp model   RecBLR ablations: default / 1layer / bdlru / noconv / noff
  --exp comp    model comparison: RecBLR / BERT4Rec / SASRec
  --exp unseen  cold-start pipeline, modes none / pre
"""

import argparse

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.dataset import build_dataset
from datamining_recblr_tpu.drivers import run_experiment
from datamining_recblr_tpu.eval.evaluator import format_result
from datamining_recblr_tpu.utils.plotting import generate_comparison_plots

ABLATIONS = {
    "default": {},
    "1layer": {"num_layers": 1},
    "bdlru": {"bd_lru_only": True},
    "noconv": {"disable_conv1d": True},
    "noff": {"disable_ffn": True},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", choices=["model", "comp", "unseen"], default="model")
    ap.add_argument("--mode", default="all", help="ablation/unseen mode or 'all'")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--config", action="append", default=None)
    args = ap.parse_args()

    import os

    files = args.config
    if files is None:
        files = ["config.yaml"] if os.path.exists("config.yaml") else []

    base_overrides = {}
    if args.epochs is not None:
        base_overrides["epochs"] = args.epochs

    if args.exp == "unseen":
        from run_with_unseen import run_unseen_experiment

        modes = ["none", "pre"] if args.mode == "all" else [args.mode]
        for mode in modes:
            run_unseen_experiment(
                mode=mode, dataset=args.dataset, config_files=files,
                epochs=args.epochs,
            )
        return

    if args.exp == "model":
        variants = (
            list(ABLATIONS) if args.mode == "all" else [args.mode]
        )
        runs = {}
        data = None
        for name in variants:
            cfg = Config(
                model="RecBLR",
                dataset=args.dataset,
                config_file_list=files,
                config_dict={**base_overrides, **ABLATIONS[name]},
            )
            result = run_experiment(
                cfg, data=data, plot_prefix=f"RecBLR_{name}"
            )
            data = result["data"]  # share across variants
            runs[name] = result["metrics"].epoch_records()
            print(f"[{name}] test:", format_result(result["test_result"]))
        generate_comparison_plots(runs, prefix="ablation")
        return

    # --exp comp: cross-model comparison
    models = ["RecBLR", "BERT4Rec", "SASRec"]
    runs = {}
    data = None
    for model_name in models:
        cfg = Config(
            model=model_name,
            dataset=args.dataset,
            config_file_list=files,
            config_dict={
                **base_overrides,
                **(
                    {}
                    if model_name == "RecBLR"
                    else dict(bd_lru_only=False, disable_conv1d=False, disable_ffn=False)
                ),
            },
        )
        result = run_experiment(cfg, data=data, plot_prefix=model_name)
        data = result["data"]
        runs[model_name] = result["metrics"].epoch_records()
        print(f"[{model_name}] test:", format_result(result["test_result"]))
    generate_comparison_plots(runs, prefix="comparison")


if __name__ == "__main__":
    main()
