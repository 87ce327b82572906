"""Sharded (multi-chip) train and eval steps.

One jitted function per step, compiled over a ``Mesh`` with GSPMD.
"Computation follows data": params are pre-placed with the row-sharded
embedding layout (``sharding.shard_params``), batches are
``data``-sharded, and jit propagates those shardings — XLA inserts the
collectives (gradient psum over ``data``; logsumexp / rank-count psum
over ``model``), riding ICI.  The [B, V] logits matrix only ever
exists sharded over both axes (SURVEY §7 "hard part 3")."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from datamining_recblr_tpu.eval.metrics import mask_scores, rank_metrics, target_ranks
from datamining_recblr_tpu.parallel.sharding import named, param_pspecs


def init_sharded_state(model, optimizer, mesh, rng):
    """Initialize params and optimizer state directly with their target
    shardings (no unsharded materialization)."""
    param_sh = named(mesh, param_pspecs(jax.eval_shape(model.init_params, rng), mesh))
    params = jax.jit(model.init_params, out_shardings=param_sh)(rng)
    opt_state = jax.jit(optimizer.init)(params)  # follows param shardings
    return params, opt_state


def make_sharded_train_step(model, optimizer, base_rng):
    """Jitted ``step(params, opt_state, batch, step_idx) -> (params,
    opt_state, loss)``; shardings propagate from the inputs."""

    def step(params, opt_state, batch, step_idx):
        step_rng = jax.random.fold_in(base_rng, step_idx)

        def loss_fn(p):
            return model.calculate_loss(p, batch, step_rng)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_sharded_eval_step(model, mesh, metrics, topk):
    """Jitted eval step: metric accumulators come back replicated."""
    repl = NamedSharding(mesh, P())

    def step(params, item_seq, item_seq_len, pos_item, weight):
        scores = model.full_sort_scores(params, item_seq, item_seq_len)
        scores = mask_scores(scores, pad_value=-jnp.inf)
        ranks = target_ranks(scores, pos_item)
        return rank_metrics(ranks, metrics, topk, weight)

    return jax.jit(step, out_shardings=repl)
