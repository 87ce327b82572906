"""Optimizer construction (optax).

Parity targets: the reference trains with RecBole's Adam at lr 1e-3 and
weight_decay 0 (reference ``config.yaml:32-33,42``).  Torch Adam's
``weight_decay`` is L2-added-to-gradient *before* the moment updates,
which is ``optax.add_decayed_weights`` chained before ``scale_by_adam``
(not decoupled AdamW)."""

from __future__ import annotations

import optax


def build_optimizer(config) -> optax.GradientTransformation:
    learner = str(config.get("learner", "adam")).lower()
    lr = float(config["learning_rate"])
    wd = float(config.get("weight_decay", 0.0) or 0.0)

    if learner == "adam":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.extend([optax.scale_by_adam(eps=1e-8), optax.scale(-lr)])
        return optax.chain(*parts)
    if learner == "adamw":
        return optax.adamw(lr, weight_decay=wd)
    if learner == "sgd":
        return optax.sgd(lr)
    if learner == "adagrad":
        return optax.adagrad(lr)
    if learner == "rmsprop":
        return optax.rmsprop(lr)
    raise ValueError(f"unknown learner {learner!r}")
