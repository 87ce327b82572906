#!/usr/bin/env python
"""Experiment sweep orchestrator — equivalent of the reference's
``full_exp.py`` but in-process: instead of rewriting ``config.yaml``
from a template and shelling out a fresh interpreter per run
(reference ``full_exp.py:14-77`` — a file-system-mediated process
boundary), each variant is an in-memory Config and runs in this
process, sharing the loaded dataset.

Experiments (parity with reference ``full_exp.py:118-160``):
  --exp comp    ablations of one --model: default / 1layer / bdlru / noconv / noff / all
  --exp model   model comparison: RecBLR / BERT4Rec / SASRec
  --exp unseen  cold-start pipeline, modes none / pre (default: both)
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
    ap.add_argument(
        "--model", choices=["r", "b", "s", "R", "B", "S"], default="r",
        help="model for --exp comp ablations (r=RecBLR, b=BERT4Rec, s=SASRec)",
    )
    ap.add_argument("--exp", choices=["comp", "model", "unseen"], required=True)
    ap.add_argument("--mode", default=None, help="ablation/unseen mode or 'all'")
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

        # reference full_exp.py:149-156: no --mode runs both none and pre
        modes = (
            ["none", "pre"]
            if args.mode in (None, "all")
            else [args.mode]
        )
        for mode in modes:
            run_unseen_experiment(
                mode=mode, dataset=args.dataset, config_files=files,
                epochs=args.epochs,
            )
        return

    if args.exp == "comp":
        # ablations of one model (reference full_exp.py:127-143)
        if args.mode is None:
            ap.error(
                "--exp comp needs --mode: default, 1layer, bdlru, noconv, noff, all"
            )
        model_name = {"r": "RecBLR", "b": "BERT4Rec", "s": "SASRec"}[
            args.model.lower()
        ]
        variants = list(ABLATIONS) if args.mode == "all" else [args.mode]
        runs = {}
        data = None
        for name in variants:
            # ablation flags only act on RecBLR; the reference's run.py:42-45
            # force-resets them for B/S, which we mirror here
            flags = ABLATIONS[name] if model_name == "RecBLR" else {}
            cfg = Config(
                model=model_name,
                dataset=args.dataset,
                config_file_list=files,
                config_dict={**base_overrides, **flags},
            )
            result = run_experiment(
                cfg, data=data, plot_prefix=f"{model_name}_{name}"
            )
            data = result["data"]  # share across variants
            runs[name] = result["metrics"].epoch_records()
            print(f"[{name}] test:", format_result(result["test_result"]))
        generate_comparison_plots(runs, prefix="ablation")
        return

    # --exp model: cross-model comparison (reference full_exp.py:106-112)
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
