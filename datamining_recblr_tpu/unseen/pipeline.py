"""Cold-start (unseen-user/unseen-item) experiment pipeline.

Native rebuild of the reference's ``run_with_unseen.py`` driver:

1. 90/10 *user*-level split with a fixed seed (reference ``:82``:
   sklearn ``train_test_split(test_size=0.1, random_state=42)``),
   persisted as ``<ds>_train.inter`` / ``<ds>_test.inter`` and reused
   idempotently (``:53-62``).  Unlike the reference, the original
   ``.inter`` is never renamed/overwritten (``:299-312`` mutates the
   dataset dir); the train split feeds the dataset builder in-process.
2. Standard training + seen-user test on the train-user split.
3. Held-out-user evaluation: per-user time-sorted sequences; input is
   the sequence minus its last item, target is the last item
   (``:378-400``).  ``mode='pre'`` maps history items unseen in
   training to their most-similar seen item via TF-IDF/SVD cosine
   similarity (``:170-193``); ``mode='none'`` keeps raw tokens — users
   whose history contains any out-of-vocabulary token are skipped,
   matching the reference's token2id KeyError skip (``:212-215``).
   Users whose *target* is out-of-vocabulary are excluded from metrics
   in both modes (``:232-237``).

Deviation (by design): evaluation is **batched** through the jitted
full-sort scorer instead of the reference's one-user-at-a-time Python
loop — the slowest code in the reference repo (SURVEY §3.3: ~4-6 min
for ~1.9k users vs 0.75 s for 18k through the batched path).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import jax.numpy as jnp

from datamining_recblr_tpu.data.atomic import read_atomic_file, write_atomic_inter
from datamining_recblr_tpu.data.dataset import SplitArrays, build_from_dataframe
from datamining_recblr_tpu.eval.evaluator import Evaluator
from datamining_recblr_tpu.unseen.features import (
    load_item_text_features,
    synthesize_item_features,
)
from datamining_recblr_tpu.unseen.similarity import ItemSimilarity
from datamining_recblr_tpu.utils.logging import init_logger


def prepare_data_split(config, test_size: float = 0.1, seed: int = 42):
    """Split users 90/10; write/reuse ``<ds>_train.inter`` /
    ``<ds>_test.inter``.  Returns (train_df, test_df)."""
    name = config["dataset"]
    ddir = os.path.join(config["data_path"], name)
    inter_file = os.path.join(ddir, f"{name}.inter")
    train_file = os.path.join(ddir, f"{name}_train.inter")
    test_file = os.path.join(ddir, f"{name}_test.inter")

    ufield, ifield, tfield = (
        config["USER_ID_FIELD"], config["ITEM_ID_FIELD"], config["TIME_FIELD"],
    )
    if os.path.exists(train_file) and os.path.exists(test_file):
        return (
            read_atomic_file(train_file),
            read_atomic_file(test_file),
        )

    df = read_atomic_file(inter_file, columns=[ufield, ifield, tfield])
    users = np.asarray(df[ufield].unique(), dtype=object)
    rng = np.random.RandomState(seed)
    shuffled = users.copy()
    rng.shuffle(shuffled)
    n_test = max(1, int(round(len(users) * test_size)))
    test_users = set(shuffled[:n_test])
    test_df = df[df[ufield].isin(test_users)]
    train_df = df[~df[ufield].isin(test_users)]
    write_atomic_inter(train_df, train_file, ufield, ifield, tfield)
    write_atomic_inter(test_df, test_file, ufield, ifield, tfield)
    return train_df, test_df


def build_unseen_split(
    test_df: pd.DataFrame,
    data,
    mode: str,
    similarity: ItemSimilarity | None,
    user_field: str,
    item_field: str,
    time_field: str,
) -> tuple[SplitArrays, int, int]:
    """Per held-out user: input = sequence[:-1] (mapped per mode),
    target = last item.  Returns (arrays, n_total_users, n_evaluated)."""
    valid_set = set(data.item_token2id)
    seqs = (
        test_df.sort_values([user_field, time_field], kind="stable")
        .groupby(user_field)[item_field]
        .agg(list)
    )
    rows = []
    n_total = len(seqs)
    for user, seq in seqs.items():
        if len(seq) < 2:
            continue
        target = seq[-1]
        if target not in valid_set:
            continue  # unmappable ground truth (reference :232-237)
        history = seq[:-1]
        if mode == "pre" and similarity is not None:
            history = similarity.map_sequence(history, valid_set)
            if not history:
                continue
        else:
            if any(t not in valid_set for t in history):
                continue  # token2id KeyError skip (reference :212-215)
        ids = [data.item_token2id[t] for t in history][-data.max_seq_len :]
        rows.append((ids, data.item_token2id[target]))

    n = len(rows)
    seq_arr = np.zeros((n, data.max_seq_len), np.int32)
    len_arr = np.zeros((n,), np.int32)
    tgt_arr = np.zeros((n,), np.int32)
    for j, (ids, tgt) in enumerate(rows):
        seq_arr[j, : len(ids)] = ids
        len_arr[j] = len(ids)
        tgt_arr[j] = tgt
    return (
        SplitArrays(seq_arr, len_arr, tgt_arr, np.zeros((n,), np.int32)),
        n_total,
        n,
    )


def run_unseen_experiment(
    mode: str = "none",
    dataset: str | None = None,
    config_files: list[str] | None = None,
    epochs: int | None = None,
    n_components: int = 16,
    test_size: float = 0.1,
    config=None,
    train_df: pd.DataFrame | None = None,
    test_df: pd.DataFrame | None = None,
    plot_dir: str = "plot",
) -> dict:
    """Full cold-start experiment; returns dict with seen/unseen results."""
    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.drivers.experiment import run_experiment

    logger = init_logger()
    if config is None:
        overrides = {}
        if epochs is not None:
            overrides["epochs"] = epochs
        config = Config(
            model="RecBLR",
            dataset=dataset,
            config_file_list=config_files or [],
            config_dict=overrides,
        )

    if train_df is None or test_df is None:
        train_df, test_df = prepare_data_split(config, test_size=test_size)

    data = build_from_dataframe(
        train_df,
        max_seq_len=config["MAX_ITEM_LIST_LENGTH"],
        user_field=config["USER_ID_FIELD"],
        item_field=config["ITEM_ID_FIELD"],
        time_field=config["TIME_FIELD"],
        user_interval=config["user_inter_num_interval"],
        item_interval=config["item_inter_num_interval"],
    )

    result = run_experiment(
        config,
        data=data,
        plot_prefix=f"RecBLR_config_{mode}",
        plot_dir=plot_dir,
        make_plots=True,
    )
    seen_result = result["test_result"]
    logger.info(f"seen-user test: {seen_result}")

    similarity = None
    effective_mode = mode
    if mode == "pre":
        feats = load_item_text_features(config["dataset"] or "", config["data_path"])
        if feats is None:
            # synthesize from the train interactions (covers only seen
            # items) + test interactions so unseen items get rows too
            all_df = pd.concat([train_df, test_df], ignore_index=True)
            feats = synthesize_item_features(
                all_df, config["ITEM_ID_FIELD"], config["USER_ID_FIELD"]
            )
        valid_tokens = [t for t in data.item_token2id]
        similarity = ItemSimilarity(
            feats, valid_tokens, n_components=n_components, seed=int(config["seed"])
        )

    unseen_split, n_total, n_eval = build_unseen_split(
        test_df, data, effective_mode, similarity,
        config["USER_ID_FIELD"], config["ITEM_ID_FIELD"], config["TIME_FIELD"],
    )
    logger.info(
        f"unseen-user eval (mode={effective_mode}): {n_eval}/{n_total} users evaluable"
    )
    eval_cfg_metrics = ["hit", "ndcg"]
    evaluator = Evaluator(
        result["model"],
        _EvalCfg(config, metrics=eval_cfg_metrics, topk=[10]),
    )
    params = result["trainer"].params
    unseen_result = (
        evaluator.evaluate(params, unseen_split) if n_eval else {"hit@10": 0.0, "ndcg@10": 0.0}
    )
    logger.info(f"unseen-user test (mode={effective_mode}): {unseen_result}")
    result["metrics"].log("unseen_test", mode=effective_mode, **unseen_result)

    return {
        "mode": effective_mode,
        "seen_result": seen_result,
        "unseen_result": unseen_result,
        "n_unseen_users": n_total,
        "n_evaluated": n_eval,
        "experiment": result,
    }


class _EvalCfg:
    """Config view overriding metrics/topk for the unseen evaluator."""

    def __init__(self, config, metrics, topk):
        self._config = config
        self._over = {"metrics": metrics, "topk": topk}

    def __getitem__(self, key):
        if key in self._over:
            return self._over[key]
        return self._config[key]

    def get(self, key, default=None):
        if key in self._over:
            return self._over[key]
        return self._config.get(key, default)
