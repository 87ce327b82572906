#!/usr/bin/env python
"""Quality-parity experiment: full reference protocol on statistics-
matched synthetic datasets.

The reference's real datasets are stripped from this environment
(/root/reference/.MISSING_LARGE_BLOBS), so the strongest attainable
quality proxy is: generate a dataset whose *post-filter statistics
exactly match* the reference's logged stats (users/items/interactions,
5-core floors, popularity shape), then run the reference's exact
training protocol (reference ``config.yaml``: Adam 1e-3, batch 2048,
CE over the full catalog, T=200, early stop 10 on valid NDCG@10, eval
batch 4096, topk [10,20]) end-to-end on the TPU and record full-sort
metrics + per-epoch timings side by side with the reference's logged
GPU numbers.  Results land in ``artifacts/parity/``.

Usage:
  python parity_exp.py --dataset beauty-synth --model R
  python parity_exp.py --dataset ml1m-synth --model all
  python parity_exp.py --dataset beauty-synth --model R --markov 0.12 --tag w12
"""

import argparse
import json
import os

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.synthetic import STAT_PRESETS, write_stat_matched_dataset
from datamining_recblr_tpu.drivers import run_experiment
from datamining_recblr_tpu.eval.evaluator import format_result

MODELS = {"R": "RecBLR", "S": "SASRec", "B": "BERT4Rec"}


def ensure_dataset(data_path, name, markov=None, clusters=None, within=None,
                   seed=2020, tag="", pref=None, pref_k=None):
    """Generate (or reuse) the stat-matched dataset.  Any deviation
    from the canonical preset — generator overrides OR a non-default
    seed — writes to a suffixed dataset dir, so the canonical
    ``<name>/`` data can never be silently produced or replaced by a
    non-canonical run."""
    overrides = {}
    if markov is not None:
        overrides["markov_weight"] = markov
    if clusters is not None:
        overrides["n_clusters"] = clusters
    if within is not None:
        overrides["within_cluster"] = within
    if pref is not None:
        overrides["pref_weight"] = pref
    if pref_k is not None:
        overrides["pref_k"] = pref_k
    ds_name = name
    if overrides:
        suffix = tag or "_".join(
            f"{k[0]}{v}" for k, v in sorted(overrides.items())
        ).replace(".", "p")
        ds_name = f"{name}_{suffix}"
    if seed != 2020 and not tag:
        ds_name = f"{ds_name}_s{seed}"
    path = os.path.join(data_path, ds_name, f"{ds_name}.inter")
    if overrides or not os.path.exists(path):
        write_stat_matched_dataset(
            data_path, name, seed=seed, out_name=ds_name, **overrides
        )
    return ds_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="beauty-synth", choices=sorted(STAT_PRESETS))
    ap.add_argument("--model", default="R", help="R, S, B, or 'all'")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--markov", type=float, default=None,
                    help="override the preset's markov_weight (regenerates)")
    ap.add_argument("--clusters", type=int, default=None,
                    help="override the preset's n_clusters (regenerates)")
    ap.add_argument("--within", default=None, choices=["pop", "uniform", "sqrt"],
                    help="override the preset's within_cluster mode")
    ap.add_argument("--pref", type=float, default=None,
                    help="override the preset's pref_weight (user-preference "
                    "mixing weight; regenerates)")
    ap.add_argument("--pref_k", type=int, default=None,
                    help="override the preset's pref_k (preferred clusters "
                    "per user; regenerates)")
    ap.add_argument("--tag", default="", help="suffix for artifact names")
    ap.add_argument("--gen_seed", type=int, default=2020,
                    help="generator seed (the calibration protocol in "
                    "BASELINE.md calibrates at one seed and reports at "
                    "a different one)")
    ap.add_argument("--out", default="artifacts/parity")
    ap.add_argument("--data_path", default="dataset")
    ap.add_argument(
        "--config", default="config.yaml",
        help="base config yaml (e.g. configs/paper/config_xlong_paper.yaml "
        "for the XLong quality protocol)",
    )
    ap.add_argument(
        "--override", action="append", default=[], metavar="KEY=VALUE",
        help="extra config override(s), e.g. --override mask_ratio=0.6 "
        "--override MAX_ITEM_LIST_LENGTH=50 (numbers auto-parsed); used "
        "by the BERT4Rec-beauty protocol diagnosis (BASELINE.md anchors)",
    )
    args = ap.parse_args()

    ds_name = ensure_dataset(
        args.data_path, args.dataset, args.markov, args.clusters,
        args.within, seed=args.gen_seed, tag=args.tag,
        pref=args.pref, pref_k=args.pref_k,
    )
    os.makedirs(args.out, exist_ok=True)
    model_keys = list(MODELS) if args.model == "all" else [args.model]

    # the exact generating parameters, for the artifact record
    resolved = dict(STAT_PRESETS[args.dataset])
    if args.markov is not None:
        resolved["markov_weight"] = args.markov
    if args.clusters is not None:
        resolved["n_clusters"] = args.clusters
    if args.within is not None:
        resolved["within_cluster"] = args.within
    if args.pref is not None:
        resolved["pref_weight"] = args.pref
    if args.pref_k is not None:
        resolved["pref_k"] = args.pref_k

    for key in model_keys:
        name = MODELS.get(key, key)
        # --tag always lands in the artifact names, even when the
        # dataset name didn't absorb it (no generator overrides) — a
        # tagged re-run must never clobber the canonical artifacts
        tag = f"{name}_{ds_name}"
        if args.tag and args.tag not in ds_name:
            tag = f"{tag}_{args.tag}"
        overrides = {
            "data_path": args.data_path,
            "metrics_file": f"{args.out}/{tag}.jsonl",
            "checkpoint_dir": "saved",
            "log_dir": "log",
        }
        if args.epochs is not None:
            overrides["epochs"] = args.epochs
        for kv in args.override:
            k, _, v = kv.partition("=")
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
            overrides[k] = v
        if name != "RecBLR":
            overrides.update(bd_lru_only=False, disable_conv1d=False,
                             disable_ffn=False)
        config = Config(
            model=name, dataset=ds_name,
            config_file_list=[args.config], config_dict=overrides,
        )
        result = run_experiment(config, plot_prefix=tag, plot_dir=args.out)
        summary = {
            "model": name,
            "dataset": ds_name,
            "preset": args.dataset,
            "gen_seed": args.gen_seed,
            "generator_params": resolved,
            "config_overrides": dict(
                kv.partition("=")[::2] for kv in args.override
            ),
            "best_valid": result["best_valid_result"],
            "test": result["test_result"],
            "wall_time_s": round(result["wall_time"], 1),
        }
        with open(f"{args.out}/{tag}.summary.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[{tag}] best valid: {format_result(result['best_valid_result'])}")
        print(f"[{tag}] test:       {format_result(result['test_result'])}")


if __name__ == "__main__":
    main()
