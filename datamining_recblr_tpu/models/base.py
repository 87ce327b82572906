"""Sequential-recommender model contract and shared losses.

Behavioral contract mirrors the RecBole model interface the reference
implements (reference ``RecBLR.py:75-122``): ``forward(item_seq,
item_seq_len) -> [B, H]`` sequence representation, ``calculate_loss``
(CE over the full catalog or BPR with sampled negatives),
``predict`` (score given items) and ``full_sort_predict`` (score the
whole catalog) — but as pure functions over parameter pytrees, so that
``jax.jit`` / ``pjit`` compile the whole train and eval step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BPR_GAMMA = 1e-10  # RecBole BPRLoss gamma (loss = -log(gamma + sigmoid(pos-neg)))


def ce_loss(logits, targets, weights=None):
    """Full-catalog softmax cross-entropy, mean over (weighted) rows.

    Matches torch ``nn.CrossEntropyLoss`` with mean reduction
    (reference ``RecBLR.py:100-102``): logits over *all* item ids
    including PAD=0; targets are positive item ids (never 0 in train).
    """
    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    nll = logz - tgt
    if weights is None:
        return jnp.mean(nll)
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def bpr_loss(pos_score, neg_score, weights=None):
    """RecBole BPRLoss parity: ``-log(1e-10 + sigmoid(pos - neg))`` mean."""
    loss = -jnp.log(BPR_GAMMA + jax.nn.sigmoid(pos_score - neg_score))
    if weights is None:
        return jnp.mean(loss)
    w = weights.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


class SequentialModel:
    """Base class: holds static hyperparams; params live in a pytree.

    Subclasses implement ``init_params(rng)``, ``forward(params,
    item_seq, item_seq_len, *, deterministic, rng)`` and may override
    the loss/score methods.
    """

    def __init__(self, config, n_items: int, max_seq_len: int):
        self.config = config
        self.n_items = int(n_items)  # includes PAD=0, like RecBole's n_items
        self.max_seq_len = int(max_seq_len)
        self.loss_type = config["loss_type"]
        self.compute_dtype = jnp.dtype(config.get("compute_dtype", "float32"))
        self.param_dtype = jnp.dtype(config.get("param_dtype", "float32"))
        # vocab padding so the row-sharded embedding divides the model
        # mesh axis; padded item columns are masked to -inf in scoring
        mesh_shape = config.get("mesh_shape") or {}
        self._vocab_mult = int(
            config.get("vocab_multiple") or mesh_shape.get("model", 1) or 1
        )
        # huge catalogs (beyond the VMEM-resident CE cap) additionally
        # pad to the chunked-CE vocab-block width: the table rows then
        # divide the kernel grid, so the per-step pad/slice of the
        # 84 MB table disappears from the train step (XLong:
        # 329,722 -> 329,728, six masked rows)
        hidden = int(config.get("hidden_size", 64) or 64)
        from datamining_recblr_tpu.ops import fused_ce

        if not fused_ce.supports(self.n_items, hidden):
            import math

            self._vocab_mult = math.lcm(self._vocab_mult, fused_ce._BV)
        self.n_items_padded = self.pad_vocab_rows(self.n_items)
        # set by the Trainer when running over a Mesh; lets kernels wrap
        # themselves in shard_map over the data axis
        self.mesh = None

    def pad_vocab_rows(self, n: int) -> int:
        """Round a vocab-leading row count up to the mesh model-axis
        multiple so the replicate-vs-row-shard choice is made by the
        policy in ``parallel/sharding.py`` (want_row_shard), never by
        divisibility accidents (e.g. BERT4Rec's n_items+1 table)."""
        m = self._vocab_mult
        return -(-n // m) * m

    # -- to implement ------------------------------------------------------
    def init_params(self, rng):
        raise NotImplementedError

    def forward(self, params, item_seq, item_seq_len, *, deterministic=True, rng=None):
        raise NotImplementedError

    def embed(self, params, ids):
        """Item-embedding lookup.  Under bf16 compute on TPU the
        gradient uses chunked one-hot matmuls instead of XLA's serial
        scatter-add (ops/embedding.py — ~2x faster, bf16-rounded
        accumulation); fp32 parity mode keeps the exact scatter.
        Multi-device meshes keep the plain gather: GSPMD partitions it
        (and its scatter-add grad) over the row-sharded table, while
        the custom VJP's large-vocab Pallas branch has no partitioning
        rule."""
        if (
            self.compute_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and (self.mesh is None or self.mesh.size == 1)
        ):
            from datamining_recblr_tpu.ops.embedding import embedding_lookup

            return embedding_lookup(params["item_embedding"], ids)
        return params["item_embedding"][ids]

    # -- shared scoring / losses ------------------------------------------
    def item_scores(self, params, seq_output, item_ids):
        """Dot-product score of seq_output[b] with given item ids [B]."""
        emb = params["item_embedding"][item_ids].astype(seq_output.dtype)
        return jnp.sum(seq_output * emb, axis=-1)

    def _mask_padded_vocab(self, logits, value=-jnp.inf):
        if self.n_items_padded == self.n_items:
            return logits
        idx = jnp.arange(logits.shape[-1])[None, :]
        return jnp.where(idx < self.n_items, logits, value)

    def _use_fused_ce(self, v, d, rows, table_rows=None, bias_rows=None):
        """Fused softmax-CE kernel gate: TPU only, the [V, D] table must
        fit VMEM, and the loss must have enough rows — measured on v5e
        (benchmarks/ce_ab.py, B=2048 T=200 V=3417): at 2048 rows XLA CE
        wins (RecBLR 160.5k vs 154.5k ex/s, SASRec 143.6k vs 137.3k),
        at 81,920 cloze rows the streaming kernel wins big (BERT4Rec
        111.3k vs 86.0k).  Under a mesh the kernel runs per-shard over
        ``data`` via shard_map, so it additionally needs the table
        replicated (a row-sharded table takes the GSPMD vocab-parallel
        XLA CE instead) and the per-shard row count above the
        crossover."""
        from datamining_recblr_tpu.ops import fused_ce

        if jax.default_backend() != "tpu":
            return False
        resident = fused_ce.supports(v, d)
        if not resident and not fused_ce.supports_chunked(v, d):
            return False

        def enough(rows_here):
            # resident kernel: the row-count crossover vs XLA's fused CE;
            # chunked kernel (table beyond VMEM): worth it once the XLA
            # fallback's [rows, V] f32 logits materialization is large
            # (XLong [512, 330k] = 676 MB; measured benchmarks/ce_ab.py)
            if resident:
                return rows_here >= fused_ce.MIN_ROWS
            return rows_here * v * 4 >= fused_ce.CHUNK_MIN_LOGITS_BYTES

        if self.mesh is None:
            return enough(rows)
        from datamining_recblr_tpu.parallel.mesh import DATA_AXIS
        from datamining_recblr_tpu.parallel.sharding import rows_sharded

        if DATA_AXIS not in self.mesh.shape:
            return False
        mode = self.config.get("vocab_row_shard", "auto") or "auto"
        if rows_sharded(
            table_rows if table_rows is not None else v, self.mesh, d, mode
        ):
            return False
        # a vocab-sharded bias (BERT4Rec's output_bias is sharded
        # independently of the n_items+1 table) would be all-gathered
        # into the shard_map every step — keep the GSPMD path instead
        if bias_rows is not None and rows_sharded(
            bias_rows, self.mesh, d, mode
        ):
            return False
        return enough(rows // self.mesh.shape[DATA_AXIS])

    def full_sort_scores(self, params, item_seq, item_seq_len):
        """[B, n_items_padded] scores vs the whole catalog (reference
        RecBLR.py:114-122); padded vocab columns are -inf."""
        seq_output = self.forward(params, item_seq, item_seq_len, deterministic=True)
        table = params["item_embedding"].astype(seq_output.dtype)
        logits = jnp.dot(seq_output, table.T, preferred_element_type=jnp.float32)
        return self._mask_padded_vocab(logits)

    def calculate_loss(self, params, batch, rng):
        """batch: dict with item_seq [B,T], item_seq_len [B], pos_item [B],
        optional neg_item [B] (BPR) and weight [B] (0 for padded rows)."""
        seq_output = self.forward(
            params,
            batch["item_seq"],
            batch["item_seq_len"],
            deterministic=False,
            rng=rng,
        )
        weights = batch.get("weight")
        if self.loss_type == "BPR":
            pos = self.item_scores(params, seq_output, batch["pos_item"])
            neg = self.item_scores(params, seq_output, batch["neg_item"])
            return bpr_loss(pos, neg, weights)
        table = params["item_embedding"]
        if self._use_fused_ce(*table.shape, rows=seq_output.shape[0]):
            from datamining_recblr_tpu.ops.fused_ce import fused_softmax_ce

            nll = fused_softmax_ce(
                seq_output, table, batch["pos_item"],
                valid_v=self.n_items,
                mm_bf16=self.compute_dtype == jnp.bfloat16,
                mesh=self.mesh,
            )
            if weights is None:
                return jnp.mean(nll)
            w = weights.astype(jnp.float32)
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
        table = table.astype(seq_output.dtype)
        logits = jnp.dot(seq_output, table.T, preferred_element_type=jnp.float32)
        logits = self._mask_padded_vocab(logits, value=-1e30)
        return ce_loss(logits, batch["pos_item"], weights)


def get_model(name: str):
    """Registry lookup, accepting full names or the driver's one-letter
    aliases (reference ``run.py:26-34``: B/R/S)."""
    from datamining_recblr_tpu.models.recblr import RecBLR
    from datamining_recblr_tpu.models.sasrec import SASRec
    from datamining_recblr_tpu.models.bert4rec import BERT4Rec

    registry = {
        "RecBLR": RecBLR,
        "R": RecBLR,
        "SASRec": SASRec,
        "S": SASRec,
        "BERT4Rec": BERT4Rec,
        "B": BERT4Rec,
    }
    if name not in registry:
        raise KeyError(f"Unknown model {name!r}; known: {sorted(registry)}")
    return registry[name]
