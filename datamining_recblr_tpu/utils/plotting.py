"""Training-curve plots and CSV export.

Produces the same five per-run plots and the cross-model comparison
plots as the reference's ``plot_utils.py`` (``generate_plots``
``:85-153``, ``generate_comparison_plots`` ``:155-206``) — but from
structured metrics records (``MetricsLogger``), not regex-scraped logs.
"""

from __future__ import annotations

import os

import pandas as pd


def records_to_dataframe(epoch_records: list[dict]) -> pd.DataFrame:
    """Per-epoch DataFrame equivalent to the reference's
    ``parse_log_text`` output (plot_utils.py:14-83)."""
    rows = []
    for r in epoch_records:
        row = {
            "epoch": r.get("epoch"),
            "train_loss": r.get("train_loss"),
            "valid_score": r.get("valid_score"),
            "train_time": r.get("train_time"),
            "eval_time": r.get("eval_time"),
            "device_mem_gb": r.get("device_mem_gb"),
        }
        for k, v in r.items():
            if k.startswith("valid_") and k != "valid_score":
                row[k.removeprefix("valid_")] = v
        rows.append(row)
    return pd.DataFrame(rows)


def _plot_series(df, columns, title, ylabel, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for col in columns:
        if col in df.columns and df[col].notna().any():
            ax.plot(df["epoch"], df[col], marker="o", markersize=3, label=col)
    ax.set_xlabel("epoch")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def generate_plots(epoch_records: list[dict], prefix: str, out_dir: str = "plot"):
    """Five per-run plots + metrics CSV (reference plot_utils.py:85-153
    naming: <prefix>train_loss_plot.png etc.)."""
    os.makedirs(out_dir, exist_ok=True)
    df = records_to_dataframe(epoch_records)
    if df.empty:
        return df
    df.to_csv(os.path.join(out_dir, f"{prefix}_training_metrics.csv"), index=False)
    join = lambda name: os.path.join(out_dir, f"{prefix}{name}")
    _plot_series(df, ["train_loss"], "Training loss", "loss", join("train_loss_plot.png"))
    _plot_series(df, ["valid_score"], "Validation score", "score", join("valid_score_plot.png"))
    _plot_series(
        df, [c for c in df.columns if c.startswith("hit@")],
        "Hit rate", "hit", join("hit_rate_plot.png"),
    )
    _plot_series(
        df, [c for c in df.columns if c.startswith("ndcg@")],
        "NDCG", "ndcg", join("ndcg_plot.png"),
    )
    _plot_series(
        df, [c for c in df.columns if c.startswith("mrr@")],
        "MRR", "mrr", join("mrr_plot.png"),
    )
    return df


def generate_comparison_plots(
    runs: dict[str, list[dict]], out_dir: str = "plot", prefix: str = "comparison"
):
    """Cross-model comparison (reference plot_utils.py:155-206): mean
    train time/epoch and mean eval time bars."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    frames = {name: records_to_dataframe(recs) for name, recs in runs.items()}
    for metric, fname, agg in [
        ("train_time", f"{prefix}_train_time.png", "mean"),
        ("eval_time", f"{prefix}_eval_time.png", "mean"),
        # reference plot_utils.py:155-206 also bars peak GPU memory
        ("device_mem_gb", f"{prefix}_device_mem.png", "max"),
    ]:
        names, vals = [], []
        for name, df in frames.items():
            if metric in df.columns and df[metric].notna().any():
                names.append(name)
                vals.append(float(getattr(df[metric], agg)()))
        if not names:
            continue
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.bar(names, vals)
        unit = "GB" if metric.endswith("_gb") else "s"
        ax.set_ylabel(f"{agg} {metric} ({unit})")
        ax.set_title(metric)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, fname), dpi=110)
        plt.close(fig)
    return frames
