"""Training loop: jit-compiled steps, per-epoch validation, early
stopping, best-checkpoint retention, resume, profiling.

Rebuilds the RecBole ``Trainer.fit``/``evaluate`` capabilities the
reference delegates to (SURVEY §2.3: Adam, CE without negative
sampling, eval every ``eval_step`` epochs, early stop after
``stopping_step`` non-improving evals on ``valid_metric``, best
checkpoint reloaded before test), TPU-first:

* the whole training split lives in device memory; each step is one
  jitted call that *gathers its batch on device* from a host-supplied
  index vector (tiny transfer), runs fwd+bwd+Adam, and returns the
  scalar loss;
* all batches have one static shape -> exactly one XLA compilation;
* per-epoch train loss is the sum of per-batch mean losses, matching
  the reference's logged quantity;
* beyond the reference: mid-training resume (``resume_from``) and
  ``jax.profiler`` trace capture (``profile_dir`` config), SURVEY §5's
  noted gaps.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from datamining_recblr_tpu.data.batching import batch_count
from datamining_recblr_tpu.eval.evaluator import (
    Evaluator,
    format_result,
    history_fn_from_data,
)
from datamining_recblr_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from datamining_recblr_tpu.train.optim import build_optimizer
from datamining_recblr_tpu.utils.logging import MetricsLogger, init_logger


# Device-resident training-split budget: above this the unmeshed
# trainer streams host batches instead (v5e HBM is 16 GB and the split
# shares it with params, optimizer state, and the step's temps).
_RESIDENT_SPLIT_BUDGET = 4 * 1024**3

# Streamed-input runahead bound: sync every N steps so staged host->
# device transfers cannot pile up (~2 MB/batch x thousands of steps).
_STREAM_DRAIN_EVERY = 64

# Streamed-input dispatch batching: upload K batches as ONE [K, B, T]
# array and lax.scan over them on device.  The remote-TPU client
# retains ~1.3 MB per dispatch even after a true sync (round-4 note:
# ~10 GB/epoch of host RSS on XLong with per-step uploads), so K-fold
# fewer dispatches cut the retention K-fold; the upload itself stays
# a modest block.  K is sized to this many bytes per block.
_STREAM_BLOCK_BYTES = 64 * 1024 * 1024
_STREAM_BLOCK_MAX_STEPS = 64

# Resident epoch-scan super-step: K train steps per dispatch (lax.scan
# over K slices of the device-resident permutation).  Bounded because a
# single scan over a FULL XLong epoch (7,647 steps) crashed the TPU
# worker process (measured; k=512 runs fine at ~33 ms/step) — 256 keeps
# a 2x margin while the per-epoch dispatch count stays ~30 (vs 7,647
# per-step dispatches whose ~50 ms tunnel latency dominated the epoch).
_EPOCH_SCAN_STEPS = 256


class Trainer:
    def __init__(self, config, model, params=None, rng=None, metrics_logger=None):
        self.config = config
        self.model = model
        self.logger = init_logger()
        self.metrics = metrics_logger or MetricsLogger(config.get("metrics_file"))
        self.optimizer = build_optimizer(config)

        # multi-chip: a mesh_shape config (e.g. {data: 4, model: 2})
        # builds the Mesh; params init row-sharded, batches data-sharded
        self.mesh = None
        mesh_shape = config.get("mesh_shape")
        if mesh_shape:
            from datamining_recblr_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(dict(mesh_shape))
            model.mesh = self.mesh  # lets kernels shard_map over 'data'
        self.evaluator = Evaluator(model, config, mesh=self.mesh)

        if rng is None:
            # rbg keys generate dropout masks far faster than threefry
            # on TPU; both are deterministic given the seed
            rng = jax.random.key(
                int(config["seed"]), impl=config.get("prng_impl", "rbg")
            )
        self.base_rng, init_rng = jax.random.split(rng)
        if self.mesh is not None and params is None:
            from datamining_recblr_tpu.parallel.steps import init_sharded_state

            self.params, self.opt_state = init_sharded_state(
                model, self.optimizer, self.mesh, init_rng
            )
        else:
            self.params = params if params is not None else model.init_params(init_rng)
            self.opt_state = self.optimizer.init(self.params)

        self.batch_size = int(config["train_batch_size"])
        self.valid_metric = str(config["valid_metric"]).lower()
        self.bigger = bool(config.get("valid_metric_bigger", True))
        self.stopping_step = int(config["stopping_step"])
        self.eval_step = int(config.get("eval_step", 1))
        self.epochs = int(config["epochs"])
        self.profile_dir = config.get("profile_dir")
        self.ckpt_path = None
        self.start_epoch = 0
        self.best_score = -np.inf if self.bigger else np.inf
        self.best_epoch = -1
        self.best_result: dict = {}

        use_bpr = model.loss_type == "BPR"
        if self.mesh is not None:
            data_size = self.mesh.shape.get("data", 1)
            assert self.batch_size % data_size == 0, (
                f"train_batch_size {self.batch_size} must divide by the"
                f" data mesh axis ({data_size})"
            )

        def train_step(params, opt_state, data, idx, weight, neg, step):
            # device-resident split: gather batch rows on device from the
            # index vector.  Under a mesh the split is replicated and idx
            # arrives data-sharded, so the gather is shard-local (no
            # collectives) and the batch comes out data-sharded.
            if "flat_items" in data:
                # COMPACT split (SplitArrays compact form): samples are
                # windows into the concatenated per-user item streams;
                # assemble the [B, T] batch ON DEVICE with one gather —
                # XLong's 16 GB dense split never exists anywhere, and
                # per-step host->device traffic is one index vector
                t = int(self.model.max_seq_len)
                start = data["flat_start"][idx]
                lens = data["item_seq_len"][idx]
                valid = jnp.arange(t, dtype=jnp.int32)[None, :] < lens[:, None]
                if "flat_wide" in data and t % 8 == 0:
                    # 8-wide ROW gather: XLA's elementwise 1-D gather of
                    # the [B, T] window ids measured 3.7 ms/step at the
                    # XLong shape (524k scalar fetches), while row
                    # gathers run byte-bound — fetching the same window
                    # as T/8 rows of the precomputed sliding-window view
                    # flat_wide[i] = flat[i:i+8] is 8x fewer, 8x wider
                    # descriptors (~0.4 ms).  flat_wide is built once
                    # per fit (host sliding_window_view, ~32 B/stream
                    # element).
                    wide = data["flat_wide"]
                    rows = start[:, None] + 8 * jnp.arange(
                        t // 8, dtype=start.dtype
                    )[None, :]
                    seq8 = wide[jnp.minimum(rows, wide.shape[0] - 1)]
                    seq = jnp.where(valid, seq8.reshape(seq8.shape[0], t), 0)
                else:
                    flat = data["flat_items"]
                    cols = (
                        start[:, None]
                        + jnp.arange(t, dtype=start.dtype)[None, :]
                    )
                    seq = jnp.where(
                        valid, flat[jnp.minimum(cols, flat.shape[0] - 1)], 0
                    )
                batch = {
                    "item_seq": seq,
                    "item_seq_len": lens,
                    "pos_item": data["pos_item"][idx],
                    "weight": weight,
                }
            else:
                batch = {
                    "item_seq": data["item_seq"][idx],
                    "item_seq_len": data["item_seq_len"][idx],
                    "pos_item": data["pos_item"][idx],
                    "weight": weight,
                }
            if use_bpr:
                batch["neg_item"] = neg
            step_rng = jax.random.fold_in(self.base_rng, step)

            def loss_fn(p):
                return self.model.calculate_loss(p, batch, step_rng)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
            return params, opt_state, loss

        def train_step_batch(params, opt_state, batch, step):
            step_rng = jax.random.fold_in(self.base_rng, step)

            def loss_fn(p):
                return self.model.calculate_loss(p, batch, step_rng)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
            return params, opt_state, loss

        def train_epoch_scan(params, opt_state, data, perm_pad, n_valid, step0):
            """A FULL epoch as one dispatch: lax.scan of train_step over
            batch-sized slices of the (device-resident) permutation.
            Removes every per-step host round-trip — on the remote-TPU
            tunnel the per-step dispatch+upload latency (~50 ms) costs
            more than the device step itself (XLong: 682 s/epoch with
            per-step dispatches vs ~3x less scanned).  perm_pad is the
            epoch permutation padded to steps*B with index 0; padded
            rows get weight 0 (identical math to the per-step path)."""
            b = self.batch_size
            k = perm_pad.shape[0] // b
            zero_neg = jnp.zeros((1,), jnp.int32)

            def body(carry, s):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice(perm_pad, (s * b,), (b,))
                weight = ((s * b + jnp.arange(b)) < n_valid).astype(
                    jnp.float32
                )
                params, opt_state, loss = train_step(
                    params, opt_state, data, idx, weight, zero_neg, step0 + s
                )
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(k)
            )
            return params, opt_state, losses

        def train_steps_scan(params, opt_state, batches, step0):
            """K steps over stacked batches ([K, B, ...] leaves) in one
            dispatch: a lax.scan whose body is exactly train_step_batch
            (same fold_in(step) seeding -> trajectory-identical to K
            separate dispatches)."""
            k = batches["item_seq"].shape[0]

            def body(carry, xs):
                params, opt_state = carry
                batch, i = xs
                params, opt_state, loss = train_step_batch(
                    params, opt_state, batch, step0 + i
                )
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (batches, jnp.arange(k))
            )
            return params, opt_state, losses

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._train_step_batch = jax.jit(train_step_batch, donate_argnums=(0, 1))
        self._train_steps_scan = jax.jit(train_steps_scan, donate_argnums=(0, 1))
        self._train_epoch_scan = jax.jit(train_epoch_scan, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def _is_better(self, score):
        return score > self.best_score if self.bigger else score < self.best_score

    def _checkpoint_state(self, epoch):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": epoch,
            "best_score": float(self.best_score),
            "best_epoch": self.best_epoch,
        }

    @staticmethod
    def _place_like(restored, template):
        """Re-place restored leaves onto the template's shardings.
        Orbax restores sharded arrays in place (their shardings come
        from the abstract target), but small/scalar leaves can come
        back committed to one device — under a mesh that poisons the
        jitted step with mixed device sets.  Equal shardings pass
        through untouched; mismatches bounce through the host (such
        leaves are always process-local) onto the target sharding."""
        import numpy as np

        def leaf(r, t):
            if isinstance(t, jax.Array):
                if isinstance(r, jax.Array) and r.sharding == t.sharding:
                    return r
                host = np.asarray(r) if isinstance(r, jax.Array) else r
                return jax.device_put(host, t.sharding)
            return jnp.asarray(r) if hasattr(r, "shape") else r

        return jax.tree.map(leaf, restored, template)

    def resume_from(self, path):
        """Restore params/optimizer/progress from a checkpoint and
        continue training at the following epoch."""
        template = self._checkpoint_state(0)
        state = restore_checkpoint(path, template)
        self.params = self._place_like(state["params"], template["params"])
        self.opt_state = self._place_like(
            state["opt_state"], template["opt_state"]
        )
        self.start_epoch = int(state["epoch"]) + 1
        self.best_score = float(state["best_score"])
        self.best_epoch = int(state["best_epoch"])
        self.ckpt_path = path
        self.logger.info(f"resumed from {path} at epoch {self.start_epoch}")

    def fit(self, data, valid_split=None, checkpoint_path=None):
        """data: SeqData (train on data.train, validate on data.valid
        unless valid_split given).  Returns (best_score, best_result)."""
        train = data.train
        valid = valid_split if valid_split is not None else data.valid
        history_fn = (
            history_fn_from_data(data) if self.config.get("mask_history") else None
        )
        if getattr(self.evaluator, "pop_sampling", False) and (
            self.evaluator._pop_probs is None
        ):
            self.evaluator.set_item_popularity(data.item_popularity())
        n = len(train)
        steps_per_epoch = batch_count(n, self.batch_size)
        seed = int(self.config["seed"])
        use_bpr = self.model.loss_type == "BPR"

        # 'resident' (default) keeps the whole split in device memory and
        # ships only index vectors per step; 'stream' uploads host batches
        # every step (for splits too big to replicate in HBM — the only
        # mesh mode in round 1, now the fallback)
        mesh_input = str(self.config.get("mesh_input", "resident"))
        if train.compact:
            # compact split: ~L times smaller than dense, so it is
            # always resident (XLong: ~63 MB on device vs a 16 GB/epoch
            # host->device batch stream over a ~20 MB/s remote tunnel)
            host_data = {
                "flat_items": train.flat_items,
                "flat_start": train.flat_start,
                "item_seq_len": train.item_seq_len,
                "pos_item": train.pos_item,
            }
            if int(train.max_seq_len) % 8 == 0:
                # 8-wide sliding-window view for the row-gather batch
                # assembly (see train_step): 32 B per stream element,
                # one host build + upload per fit
                flat_pad = np.concatenate(
                    [train.flat_items, np.zeros(7, np.int32)]
                )
                host_data["flat_wide"] = np.ascontiguousarray(
                    np.lib.stride_tricks.sliding_window_view(flat_pad, 8)
                )
        else:
            host_data = {
                "item_seq": train.item_seq,
                "item_seq_len": train.item_seq_len,
                "pos_item": train.pos_item,
            }
        # unmeshed: the split lives in HBM and steps ship only index
        # vectors — unless it does not fit (XLong-scale: 3.9M x 1024
        # int32 = 16 GB > v5e's 16 GB HBM), in which case host batches
        # stream per step (~2 MB each, hidden under the 20+ ms step)
        resident_bytes = sum(
            int(np.asarray(v).nbytes) for v in host_data.values()
        )
        stream_unmeshed = (
            self.mesh is None and resident_bytes > _RESIDENT_SPLIT_BUDGET
        )
        dev_data = None
        if self.mesh is None and not stream_unmeshed:
            dev_data = jax.tree.map(jnp.asarray, host_data)
        elif self.mesh is not None and mesh_input == "resident":
            from datamining_recblr_tpu.parallel.input import replicate_global

            dev_data = replicate_global(host_data, self.mesh)
        elif self.mesh is not None and mesh_input != "stream":
            raise ValueError(f"mesh_input must be resident|stream, got {mesh_input!r}")
        if checkpoint_path is None:
            checkpoint_path = (
                f"{self.config['checkpoint_dir']}/"
                f"{self.config['model']}-{self.config.get('dataset') or 'data'}"
            )

        global_step = self.start_epoch * steps_per_epoch
        cur_step = 0
        if stream_unmeshed:
            # dispatch-batched streaming: K steps per upload (see
            # _STREAM_BLOCK_BYTES); the tail under K reuses the
            # per-step compile
            row_bytes = 4 * (train.seq_len + 3)
            k_block = max(
                1,
                min(
                    _STREAM_BLOCK_MAX_STEPS,
                    _STREAM_BLOCK_BYTES // max(1, self.batch_size * row_bytes),
                ),
            )
            drain_blocks = max(1, _STREAM_DRAIN_EVERY // k_block)
        for epoch in range(self.start_epoch, self.epochs):
            t0 = time.time()
            # per-epoch generator keyed on (seed, epoch): a resumed run
            # draws the same permutations/negatives as the uninterrupted
            # run — trajectory-deterministic resume
            host_rng = np.random.default_rng((seed, epoch))
            perm = host_rng.permutation(n)
            profiling = self.profile_dir and epoch == self.start_epoch + 1
            if profiling:
                os.makedirs(self.profile_dir, exist_ok=True)
                jax.profiler.start_trace(self.profile_dir)
            losses = []
            stream_block = []
            stream_dispatches = 0
            # resident unmeshed CE: the whole epoch runs as ONE scanned
            # dispatch (per-step host round-trips cost more than the
            # device step on a remote tunnel); BPR keeps the per-step
            # path (host-side negative resampling parity), meshes keep
            # theirs (per-process idx sharding)
            use_epoch_scan = (
                dev_data is not None
                and self.mesh is None
                and not use_bpr
                and bool(self.config.get("epoch_scan", True))
            )
            if use_epoch_scan:
                pad = (-n) % self.batch_size
                perm_pad = (
                    np.concatenate([perm, np.zeros(pad, np.int64)])
                    if pad else perm
                ).astype(np.int32)
                b = self.batch_size
                for s0 in range(0, steps_per_epoch, _EPOCH_SCAN_STEPS):
                    k = min(_EPOCH_SCAN_STEPS, steps_per_epoch - s0)
                    self.params, self.opt_state, ep_losses = (
                        self._train_epoch_scan(
                            self.params, self.opt_state, dev_data,
                            jnp.asarray(perm_pad[s0 * b : (s0 + k) * b]),
                            jnp.int32(max(n - s0 * b, 0)),
                            global_step + s0,
                        )
                    )
                    losses.append(ep_losses)
                global_step += steps_per_epoch
                # true sync: honest train_time and no client runahead
                float(ep_losses[-1])
            for s in range(steps_per_epoch) if not use_epoch_scan else ():
                chunk = perm[s * self.batch_size : (s + 1) * self.batch_size]
                pad = self.batch_size - len(chunk)
                weight = np.ones(self.batch_size, np.float32)
                if pad:
                    chunk = np.concatenate([chunk, np.zeros(pad, np.int64)])
                    weight[self.batch_size - pad :] = 0.0
                if use_bpr:
                    neg = host_rng.integers(
                        1, self.model.n_items, size=self.batch_size
                    ).astype(np.int32)
                    # uniform-sampler parity: resample collisions with
                    # the positive item
                    pos = train.pos_item[chunk]
                    for _ in range(4):
                        coll = neg == pos
                        if not coll.any():
                            break
                        neg[coll] = host_rng.integers(
                            1, self.model.n_items, int(coll.sum())
                        )
                else:
                    neg = np.zeros(1, np.int32)
                if self.mesh is not None and mesh_input == "stream":
                    from datamining_recblr_tpu.parallel.input import (
                        process_local_rows,
                        shard_host_batch,
                    )

                    # every process computes the same global batch (the
                    # rng derives from (seed, epoch)) and feeds only its
                    # local row range — deterministic for any host count
                    lo, hi = process_local_rows(self.batch_size, self.mesh)
                    batch = {
                        "item_seq": train.windows(chunk[lo:hi]),
                        "item_seq_len": train.item_seq_len[chunk[lo:hi]],
                        "pos_item": train.pos_item[chunk[lo:hi]],
                        "weight": weight[lo:hi],
                    }
                    if use_bpr:
                        batch["neg_item"] = neg[lo:hi]
                    self.params, self.opt_state, loss = self._train_step_batch(
                        self.params,
                        self.opt_state,
                        shard_host_batch(batch, self.mesh),
                        global_step,
                    )
                elif stream_unmeshed:
                    if not stream_block:
                        stream_step0 = global_step
                    nb = {
                        "item_seq": train.windows(chunk),
                        "item_seq_len": train.item_seq_len[chunk],
                        "pos_item": train.pos_item[chunk],
                        "weight": weight,
                    }
                    if use_bpr:
                        nb["neg_item"] = neg
                    stream_block.append(nb)
                    loss = None
                    if len(stream_block) == k_block:
                        # ONE [K, B, ...] upload + one scan dispatch:
                        # K-fold fewer dispatches (the remote client
                        # retains ~1.3 MB per dispatch even after a
                        # sync — round-4 host-leak note)
                        stacked = {
                            key: jnp.asarray(
                                np.stack([b[key] for b in stream_block])
                            )
                            for key in stream_block[0]
                        }
                        self.params, self.opt_state, loss = (
                            self._train_steps_scan(
                                self.params, self.opt_state, stacked,
                                stream_step0,
                            )
                        )
                        losses.append(loss)
                    elif s == steps_per_epoch - 1:
                        # short tail: per-step path, no extra compile
                        for j, b in enumerate(stream_block):
                            self.params, self.opt_state, loss = (
                                self._train_step_batch(
                                    self.params, self.opt_state,
                                    jax.tree.map(jnp.asarray, b),
                                    stream_step0 + j,
                                )
                            )
                            losses.append(loss)
                    if loss is not None:
                        stream_block = []
                        stream_dispatches += 1
                        if stream_dispatches % drain_blocks == 0:
                            # true host-device sync (a float() fetch —
                            # under the remote backend
                            # block_until_ready returns early): bounds
                            # the host's upload runahead to
                            # drain_blocks staged blocks
                            float(jnp.max(loss))
                else:
                    idx = np.asarray(chunk, np.int32)
                    if self.mesh is not None:
                        from datamining_recblr_tpu.parallel.input import (
                            process_local_rows,
                            shard_host_batch,
                        )

                        # only [B]-sized vectors cross host->device here;
                        # each process feeds its local row range
                        lo, hi = process_local_rows(self.batch_size, self.mesh)
                        put = {"idx": idx[lo:hi], "weight": weight[lo:hi]}
                        if use_bpr:
                            put["neg"] = neg[lo:hi]
                        put = shard_host_batch(put, self.mesh)
                        idx, weight = put["idx"], put["weight"]
                        neg = put["neg"] if use_bpr else jnp.asarray(neg)
                    else:
                        idx, weight, neg = map(jnp.asarray, (idx, weight, neg))
                    self.params, self.opt_state, loss = self._train_step(
                        self.params,
                        self.opt_state,
                        dev_data,
                        idx,
                        weight,
                        neg,
                        global_step,
                    )
                if not stream_unmeshed:
                    losses.append(loss)
                global_step += 1
            # per-epoch loss = sum of per-batch mean losses (reference's
            # logged quantity); stream mode appends [K] loss vectors
            epoch_loss = float(sum(jnp.sum(l) for l in losses))
            if profiling:
                jax.profiler.stop_trace()
                self.logger.info(f"profiler trace written to {self.profile_dir}")
            train_time = time.time() - t0

            record = {
                "epoch": epoch,
                "train_loss": epoch_loss,
                "train_time": train_time,
            }
            try:  # device memory column, like the reference's GPU GB logs
                stats = jax.local_devices()[0].memory_stats() or {}
                peak = stats.get("peak_bytes_in_use")
                if peak:
                    record["device_mem_gb"] = round(peak / 2**30, 3)
            except Exception:
                pass
            try:  # host RSS column: tracks the remote-client retention
                # (round-4 leak note); long streamed runs watch this
                with open("/proc/self/status") as f:
                    for ln in f:
                        if ln.startswith("VmRSS:"):
                            record["host_rss_gb"] = round(
                                int(ln.split()[1]) / 2**20, 2
                            )
                            break
            except Exception:
                pass
            line = f"epoch {epoch} training [time: {train_time:.2f}s, train loss: {epoch_loss:.4f}]"

            if valid is not None and len(valid) and (epoch + 1) % self.eval_step == 0:
                t1 = time.time()
                result = self.evaluator.evaluate(self.params, valid, history_fn)
                eval_time = time.time() - t1
                score = result.get(self.valid_metric, 0.0)
                record.update(
                    valid_score=score, eval_time=eval_time,
                    **{f"valid_{k}": v for k, v in result.items()},
                )
                line += (
                    f" | valid [time: {eval_time:.2f}s, {self.valid_metric}:"
                    f" {score:.4f}]"
                )
                if self._is_better(score):
                    self.best_score = score
                    self.best_epoch = epoch
                    self.best_result = result
                    cur_step = 0
                    self.ckpt_path = save_checkpoint(
                        checkpoint_path, self._checkpoint_state(epoch)
                    )
                    line += " *best*"
                else:
                    cur_step += 1
            self.logger.info(line)
            self.metrics.log("epoch", **record)

            if valid is not None and len(valid) and cur_step > self.stopping_step:
                self.logger.info(
                    f"early stop at epoch {epoch} (best {self.valid_metric}="
                    f"{self.best_score:.4f} @ epoch {self.best_epoch})"
                )
                break

        if valid is None or not len(valid):
            # no validation: keep final params as "best"
            self.ckpt_path = save_checkpoint(
                checkpoint_path, self._checkpoint_state(self.epochs - 1)
            )
        self.metrics.log(
            "fit_done",
            best_epoch=self.best_epoch,
            best_score=float(self.best_score) if np.isfinite(self.best_score) else None,
            **{f"best_{k}": v for k, v in self.best_result.items()},
        )
        return self.best_score, self.best_result

    # ------------------------------------------------------------------
    def evaluate(self, split, load_best=True, history_fn=None):
        """Full-sort evaluation; reloads the best checkpoint first, like
        the reference (log:312 'Loading model structure and parameters
        from saved/...')."""
        params = self.params
        if load_best and self.ckpt_path:
            template = self._checkpoint_state(0)
            state = restore_checkpoint(self.ckpt_path, template)
            params = self._place_like(state["params"], template["params"])
        result = self.evaluator.evaluate(params, split, history_fn)
        self.logger.info("test result: " + format_result(result))
        self.metrics.log("test", **result)
        return result
