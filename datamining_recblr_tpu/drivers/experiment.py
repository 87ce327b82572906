"""Single-experiment driver: config -> data -> model -> fit -> test.

The native equivalent of the reference's main entry (reference
``run.py:25-117``): seeded init, dataset build + split, model, FLOPs
count, ``Trainer.fit`` with per-epoch validation, best-checkpoint test
evaluation, environment report, and plots/CSV — minus the reference's
self-log-scraping (structured metrics are first-class here)."""

from __future__ import annotations

import time

import jax

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.data.dataset import SeqData, build_dataset
from datamining_recblr_tpu.eval.evaluator import format_result
from datamining_recblr_tpu.models import get_model
from datamining_recblr_tpu.train import Trainer
from datamining_recblr_tpu.utils.env import environment_report, format_environment
from datamining_recblr_tpu.utils.flops import forward_flops
from datamining_recblr_tpu.utils.logging import MetricsLogger, init_logger
from datamining_recblr_tpu.utils.plotting import generate_plots


def run_experiment(
    config: Config,
    data: SeqData | None = None,
    plot_prefix: str | None = None,
    plot_dir: str = "plot",
    make_plots: bool = True,
) -> dict:
    if config.get("multihost"):
        # must run before the first backend touch: registers this
        # process's devices into the global (cross-host) device set so
        # mesh_shape can span processes (SURVEY §7 step 7)
        from datamining_recblr_tpu.parallel.mesh import multihost_initialize

        multihost_initialize(**(config.get("multihost_args") or {}))

    log_file = None
    if config.get("log_dir"):
        # per-run log file, like the reference's log/<Model>/<run>.log
        stamp = time.strftime("%b-%d-%Y_%H-%M-%S")
        log_file = (
            f"{config['log_dir']}/{config['model']}/"
            f"{config['model']}-{config.get('dataset') or 'data'}-{stamp}.log"
        )
    logger = init_logger(log_file=log_file)
    t_start = time.time()

    if data is None:
        data = build_dataset(config)
    logger.info(f"dataset [{config['dataset']}]: {data.summary()}")

    model_cls = get_model(config["model"])
    model = model_cls(config, n_items=data.n_items, max_seq_len=data.max_seq_len)

    rng = jax.random.PRNGKey(int(config["seed"]))
    metrics = MetricsLogger(config.get("metrics_file"))
    trainer = Trainer(config, model, rng=rng, metrics_logger=metrics)

    # FLOPs of one forward at train batch size (reference run.py:77-78)
    bs = min(int(config["train_batch_size"]), max(len(data.train), 1))
    if len(data.train):
        import numpy as _np
        ex_seq = jax.numpy.asarray(
            data.train.windows(_np.arange(min(bs, len(data.train))))
        )
        ex_len = jax.numpy.asarray(data.train.item_seq_len[:bs])
        flops = forward_flops(
            lambda s, l: model.forward(trainer.params, s, l), ex_seq, ex_len
        )
        if flops:
            logger.info(f"forward FLOPs (XLA cost analysis): {flops:,.0f}")
            metrics.log("flops", flops=flops)

    best_score, best_result = trainer.fit(data)
    logger.info(
        f"best valid: {format_result(best_result)}" if best_result else "no validation"
    )
    test_result = trainer.evaluate(data.test, load_best=True)

    env = environment_report()
    logger.info(format_environment(env))

    if make_plots:
        prefix = plot_prefix or f"{config['model']}_{config.get('dataset') or 'data'}"
        generate_plots(metrics.epoch_records(), prefix, plot_dir)

    return {
        "config": config,
        "data": data,
        "model": model,
        "trainer": trainer,
        "best_valid_score": best_score,
        "best_valid_result": best_result,
        "test_result": test_result,
        "metrics": metrics,
        "environment": env,
        "wall_time": time.time() - t_start,
    }
