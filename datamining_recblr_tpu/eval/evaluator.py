"""Batched full-sort evaluator.

Replaces RecBole's ``Trainer.evaluate`` full-catalog ranking loop (the
reference's eval path, SURVEY §3.2): for each eval batch, one jitted
step computes the sequence representation, the [B, V] catalog scores
(MXU matmul), the target ranks, and the metric accumulators — nothing
but two scalars per metric leaves the device per batch.

History masking: RecBole's sequential full-sort mode masks only the PAD
item, not training history (SURVEY §7 open question — resolved: for
sequential datasets RecBole's ``history_index`` is None).  The
``mask_history`` config therefore defaults False, but the capability
exists: pass a ``history_fn`` mapping user ids to a [B, V] boolean
mask and those items score -inf."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from datamining_recblr_tpu.data.batching import iter_batches
from datamining_recblr_tpu.eval.metrics import mask_scores, rank_metrics, target_ranks


def history_fn_from_data(data):
    """Build a history_fn from SeqData.user_train_items: batch of user
    ids -> [B, n_items] bool mask of items seen in training."""

    def fn(user_ids: np.ndarray) -> np.ndarray:
        mask = np.zeros((len(user_ids), data.n_items), bool)
        for j, u in enumerate(user_ids):
            items = data.user_train_items[int(u)]
            if len(items):
                mask[j, items] = True
        return mask

    return fn


class Evaluator:
    def __init__(self, model, config, mesh=None):
        self.model = model
        self.metrics = [m.lower() for m in config["metrics"]]
        self.topk = [int(k) for k in config["topk"]]
        self.batch_size = int(config["eval_batch_size"])
        self.mesh = mesh
        self.seed = int(config.get("seed", 0) or 0)
        # RecBole eval_args.mode: 'full' (whole catalog) or 'uniN'
        # (N uniform sampled negatives + the target)
        eval_args = config.get("eval_args") or {}
        mode = str(eval_args.get("mode", "full"))
        self.n_negatives = None
        self.pop_sampling = False
        if mode.startswith("uni"):
            self.n_negatives = int(mode[3:])
        elif mode.startswith("pop"):
            # popularity-proportional negative sampling (RecBole popN);
            # requires item counts via set_item_popularity()
            self.n_negatives = int(mode[3:])
            self.pop_sampling = True
        elif mode != "full":
            raise ValueError(f"unsupported eval mode {mode!r} (full / uniN / popN)")
        self._pop_probs = None
        if mesh is not None:
            data_size = mesh.shape.get("data", 1)
            assert self.batch_size % data_size == 0, (
                f"eval_batch_size {self.batch_size} must divide by the data"
                f" mesh axis ({data_size})"
            )

        # under a mesh the metric accumulators come back replicated so
        # the host-side running sums never hold partial per-shard values
        # (parallel/steps.py make_sharded_eval_step design)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            jit = lambda f: jax.jit(  # noqa: E731
                f, out_shardings=NamedSharding(mesh, PartitionSpec())
            )
        else:
            jit = jax.jit

        @jit
        def _eval_step(params, item_seq, item_seq_len, pos_item, weight):
            scores = self.model.full_sort_scores(params, item_seq, item_seq_len)
            scores = mask_scores(scores)
            ranks = target_ranks(scores, pos_item)
            return rank_metrics(ranks, self.metrics, self.topk, weight)

        @jit
        def _eval_step_hist(params, item_seq, item_seq_len, pos_item, weight, history):
            scores = self.model.full_sort_scores(params, item_seq, item_seq_len)
            scores = mask_scores(scores, history=history)
            ranks = target_ranks(scores, pos_item)
            return rank_metrics(ranks, self.metrics, self.topk, weight)

        @jit
        def _eval_step_sampled(params, item_seq, item_seq_len, candidates, weight):
            """candidates: [B, 1+N] item ids with the target at index 0;
            rank computed among the candidate set (ties favor the
            target, like torch.topk's index order with the positive
            listed first)."""
            seq_output = self.model.forward(
                params, item_seq, item_seq_len, deterministic=True
            )
            emb = params["item_embedding"][candidates].astype(seq_output.dtype)
            scores = jnp.einsum(
                "bh,bnh->bn", seq_output, emb, preferred_element_type=jnp.float32
            )
            if hasattr(self.model, "mask_token"):  # BERT4Rec output bias
                scores = scores + params["output_bias"][candidates]
            ranks = target_ranks(scores, jnp.zeros(scores.shape[0], jnp.int32))
            return rank_metrics(ranks, self.metrics, self.topk, weight)

        self._eval_step = _eval_step
        self._eval_step_hist = _eval_step_hist
        self._eval_step_sampled = _eval_step_sampled
        self._jit = jit
        # device-resident split cache for the full-sort mode: the valid
        # split is re-evaluated every epoch, so its arrays live on
        # device once and the whole multi-batch evaluation runs as ONE
        # jitted lax.map — no per-batch host->device upload and no
        # per-batch dispatch round-trip (expensive on a remote TPU)
        self._resident_cache = {}

    def _resident_eval(self, split):
        """(device_data, jitted whole-eval fn) for a split, cached.

        The entry holds a strong reference to the split object, so its
        id() can never be recycled onto a different split while the
        cache entry lives; the cache is capped (FIFO) so one-off splits
        don't pin device memory forever."""
        key = id(split)
        ent = self._resident_cache.get(key)
        if ent is not None and ent[0] is split:
            return ent[1], ent[2]
        if len(self._resident_cache) >= 4:
            self._resident_cache.pop(next(iter(self._resident_cache)))
        batches = list(iter_batches(split, self.batch_size))
        data = {
            k: np.concatenate([b[k] for b in batches])
            for k in ("item_seq", "item_seq_len", "pos_item", "weight")
        }
        nb = len(batches)
        bs = self.batch_size
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            dsh = NamedSharding(self.mesh, P("data"))
            data = {k: jax.device_put(jnp.asarray(v), repl) for k, v in data.items()}
        else:
            data = {k: jnp.asarray(v) for k, v in data.items()}

        def one_batch(params, data, i):
            b = {
                k: jax.lax.dynamic_slice_in_dim(v, i * bs, bs, axis=0)
                for k, v in data.items()
            }
            if self.mesh is not None:
                b = {k: jax.lax.with_sharding_constraint(v, dsh) for k, v in b.items()}
            scores = self.model.full_sort_scores(
                params, b["item_seq"], b["item_seq_len"]
            )
            scores = mask_scores(scores)
            ranks = target_ranks(scores, b["pos_item"])
            return rank_metrics(ranks, self.metrics, self.topk, b["weight"])

        @self._jit
        def eval_all(params, data):
            accs = jax.lax.map(
                lambda i: one_batch(params, data, i), jnp.arange(nb)
            )
            return jax.tree.map(lambda a: jnp.sum(a, axis=0), accs)

        self._resident_cache[key] = (split, data, eval_all)
        return data, eval_all

    def set_item_popularity(self, counts):
        """counts: array of per-item interaction counts indexed by item
        id (PAD at 0) — enables the popN sampling distribution."""
        import numpy as np

        c = np.zeros(self.model.n_items, np.float64)
        c[: len(counts)] = np.asarray(counts, np.float64)[: self.model.n_items]
        c[0] = 0.0
        total = c.sum()
        self._pop_probs = c / total if total else None

    def evaluate(self, params, split, history_fn=None) -> dict[str, float]:
        """Returns {"metric@k": value} averaged over real rows."""
        import numpy as np

        if self.n_negatives is None and history_fn is None and len(split):
            data, eval_all = self._resident_eval(split)
            # one host transfer for ALL accumulators: per-scalar float()
            # fetches cost a full round-trip each on a remote TPU
            sums = jax.device_get(eval_all(params, data))
            out = {}
            for k, (sv, wv) in sums.items():
                w = float(wv)
                out[k] = float(sv) / w if w else 0.0
            return out

        sums = {}
        neg_rng = (
            np.random.default_rng(self.seed) if self.n_negatives is not None else None
        )
        for batch in iter_batches(split, self.batch_size):
            if self.n_negatives is not None:
                b = len(batch["pos_item"])
                if self.pop_sampling:
                    assert self._pop_probs is not None, (
                        "popN eval mode requires set_item_popularity(counts)"
                    )
                    neg = neg_rng.choice(
                        self.model.n_items, size=(b, self.n_negatives),
                        p=self._pop_probs,
                    ).astype(np.int32)
                else:
                    neg = neg_rng.integers(
                        1, self.model.n_items, size=(b, self.n_negatives)
                    ).astype(np.int32)
                # resample collisions with the target
                for _ in range(4):
                    coll = neg == batch["pos_item"][:, None]
                    if not coll.any():
                        break
                    n_coll = int(coll.sum())
                    if self.pop_sampling:
                        neg[coll] = neg_rng.choice(
                            self.model.n_items, size=n_coll, p=self._pop_probs
                        )
                    else:
                        neg[coll] = neg_rng.integers(1, self.model.n_items, n_coll)
                cands = np.concatenate([batch["pos_item"][:, None], neg], axis=1)
                sampled_in = {
                    "item_seq": batch["item_seq"],
                    "item_seq_len": batch["item_seq_len"],
                    "cands": cands,
                    "weight": batch["weight"],
                }
                if self.mesh is not None:
                    from datamining_recblr_tpu.parallel.sharding import shard_batch

                    sampled_in = shard_batch(sampled_in, self.mesh)
                else:
                    sampled_in = jax.tree.map(jnp.asarray, sampled_in)
                acc = self._eval_step_sampled(
                    params,
                    sampled_in["item_seq"],
                    sampled_in["item_seq_len"],
                    sampled_in["cands"],
                    sampled_in["weight"],
                )
                for key, (sv, wv) in acc.items():
                    cur = sums.get(key)
                    sums[key] = (sv, wv) if cur is None else (cur[0] + sv, cur[1] + wv)
                continue
            if self.mesh is not None:
                from datamining_recblr_tpu.parallel.sharding import shard_batch

                sharded = shard_batch(
                    {k: batch[k] for k in ("item_seq", "item_seq_len", "pos_item", "weight")},
                    self.mesh,
                )
                args = [
                    params,
                    sharded["item_seq"],
                    sharded["item_seq_len"],
                    sharded["pos_item"],
                    sharded["weight"],
                ]
            else:
                args = [
                    params,
                    jnp.asarray(batch["item_seq"]),
                    jnp.asarray(batch["item_seq_len"]),
                    jnp.asarray(batch["pos_item"]),
                    jnp.asarray(batch["weight"]),
                ]
            if history_fn is not None:
                hist = history_fn(batch["user_id"])
                acc = self._eval_step_hist(*args, jnp.asarray(hist))
            else:
                acc = self._eval_step(*args)
            # accumulate ON DEVICE: a float() here would force a full
            # host round-trip per batch (expensive on a remote/tunneled
            # TPU) and stop batch upload from overlapping with compute
            for key, (sv, wv) in acc.items():
                cur = sums.get(key)
                sums[key] = (sv, wv) if cur is None else (cur[0] + sv, cur[1] + wv)
        sums = jax.device_get(sums)  # one transfer for all accumulators
        out = {}
        for k, (sv, wv) in sums.items():
            w = float(wv)
            out[k] = float(sv) / w if w else 0.0
        return out


def format_result(result: dict[str, float]) -> str:
    """4-decimal reporting, like the reference logs (log:313,327)."""
    return "  ".join(f"{k}: {v:.4f}" for k, v in sorted(result.items()))
