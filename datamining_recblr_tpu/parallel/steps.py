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


def opt_state_pspecs(opt_template, param_template, mesh, mode="auto"):
    """PartitionSpec tree for an optimizer state: any leaf whose tree
    path ends with a param's path (optax moment trees mirror the param
    tree, e.g. ``[0].mu['item_embedding']``) inherits that param's
    spec; everything else (step counts) replicates.  Matching by path
    suffix + shape keeps this optimizer-agnostic."""
    pspecs = param_pspecs(param_template, mesh, mode)
    param_leaves = {
        tuple(str(k) for k in path): (leaf.shape, spec)
        for (path, leaf), spec in zip(
            jax.tree_util.tree_leaves_with_path(param_template),
            jax.tree.leaves(pspecs, is_leaf=lambda s: isinstance(s, P)),
        )
    }

    def spec_for(path, leaf):
        keys = tuple(str(k) for k in path)
        for ppath, (shape, spec) in param_leaves.items():
            if (
                len(keys) >= len(ppath)
                and keys[len(keys) - len(ppath):] == ppath
                and getattr(leaf, "shape", None) == shape
            ):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, opt_template)


def init_sharded_state(model, optimizer, mesh, rng):
    """Initialize params and optimizer state directly with their target
    shardings (no unsharded materialization).  The optimizer state gets
    EXPLICIT out_shardings — without them jit leaves small leaves
    uncommitted on the default device, which works for live training
    (jit reshards uncommitted arrays freely) but poisons checkpoint
    restore: Orbax commits each leaf to its template sharding, and a
    committed single-device step-count alongside mesh-committed params
    fails the next jitted step."""
    mode = model.config.get("vocab_row_shard", "auto") or "auto"
    param_tmpl = jax.eval_shape(model.init_params, rng)
    param_sh = named(mesh, param_pspecs(param_tmpl, mesh, mode))
    params = jax.jit(model.init_params, out_shardings=param_sh)(rng)
    opt_tmpl = jax.eval_shape(optimizer.init, param_tmpl)
    opt_sh = named(mesh, opt_state_pspecs(opt_tmpl, param_tmpl, mesh, mode))
    opt_state = jax.jit(optimizer.init, out_shardings=opt_sh)(params)
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
