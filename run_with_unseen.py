#!/usr/bin/env python
"""Cold-start experiment CLI — equivalent of the reference's
``run_with_unseen.py``: 90/10 user split, train RecBLR on the 90%,
evaluate seen-user test normally, then evaluate held-out users with
``--mode none`` (raw tokens, OOV users skipped) or ``--mode pre``
(unseen items mapped to most-similar seen items via TF-IDF/SVD)."""

import argparse

from datamining_recblr_tpu.unseen.pipeline import run_unseen_experiment


def main():
    ap = argparse.ArgumentParser(description="RecBLR with unseen-item handling")
    ap.add_argument("--mode", choices=["none", "pre"], default="none")
    ap.add_argument("--n_components", type=int, default=16,
                    help="SVD components for similarity (default: 16)")
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--config", action="append", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    import os

    files = args.config
    if files is None:
        files = ["config.yaml"] if os.path.exists("config.yaml") else []

    out = run_unseen_experiment(
        mode=args.mode,
        dataset=args.dataset,
        config_files=files,
        epochs=args.epochs,
        n_components=args.n_components,
    )
    print("seen-user test:", out["seen_result"])
    print(f"unseen-user test (mode={out['mode']}):", out["unseen_result"])


if __name__ == "__main__":
    main()
