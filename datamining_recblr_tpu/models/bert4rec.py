"""BERT4Rec baseline: bidirectional transformer with cloze training.

Behavioral parity with the reference wrapper (reference
``bert4rec.py``): mask token id = ``n_items`` with an ``n_items + 1``
embedding table (``bert4rec.py:60-66``); bidirectional attention mask
(``:132``); output head FFN + GELU + LayerNorm + per-item bias
(``:83-86,136-139``); masked-position-only CE/BPR normalized by the
number of real masks (``:200-213``); test protocol appends the mask
token after the sequence and shifts left one step
(``reconstruct_test_data``, ``:109-120``), scoring against the table
without the mask row (``:236-238``).

TPU-first deviation (math-equivalent): the reference's RecBole MLM
transform draws the cloze mask host-side per epoch; here it is drawn
on device inside the jitted train step.  The fixed
``mask_ratio * max_len`` position budget and the masked-position
gather match the reference's multi-hot scheme (``bert4rec.py:141-181``)
so logits stay O(B * mask_len * |V|).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from datamining_recblr_tpu.models import layers as L
from datamining_recblr_tpu.models.base import BPR_GAMMA, SequentialModel


class BERT4Rec(SequentialModel):
    def __init__(self, config, n_items, max_seq_len):
        super().__init__(config, n_items, max_seq_len)
        self.n_layers = config["n_layers"]
        self.n_heads = config["n_heads"]
        self.hidden_size = config["hidden_size"]
        self.inner_size = config["inner_size"]
        self.hidden_dropout_prob = config["hidden_dropout_prob"]
        self.attn_dropout_prob = config["attn_dropout_prob"]
        self.hidden_act = config["hidden_act"]
        self.mask_ratio = float(config["mask_ratio"])
        self.mask_token = self.n_items  # reference bert4rec.py:60

    def init_params(self, rng):
        k_item, k_pos, k_trm, k_ffn = jax.random.split(rng, 4)
        d = self.hidden_size
        dt = self.param_dtype
        return {
            # +1 row for the mask token (reference bert4rec.py:64-66),
            # then padded to the mesh model-axis multiple so the
            # replicate-vs-row-shard POLICY (parallel/sharding.py)
            # decides the layout, not divisibility of n_items+1
            "item_embedding": L.normal_init(
                k_item, (self.pad_vocab_rows(self.n_items + 1), d), dtype=dt
            )
            .at[0]
            .set(0.0),
            "position_embedding": L.normal_init(k_pos, (self.max_seq_len, d), dtype=dt),
            "input_ln": L.layer_norm_init(d, dt),
            "encoder": L.transformer_encoder_init(
                k_trm, self.n_layers, self.n_heads, d, self.inner_size, dt
            ),
            "output_ffn": L.dense_init(k_ffn, d, d, dtype=dt),
            "output_ln": L.layer_norm_init(d, dt),
            "output_bias": jnp.zeros((self.pad_vocab_rows(self.n_items),), dt),
        }

    # ------------------------------------------------------------------
    def encode(self, params, item_seq, *, deterministic=True, rng=None,
               last_only=False, select=None):
        """[B, T] -> hidden states through embedding, bidirectional
        encoder, and the GELU output head.  Returns ``(out, selected)``:
        with ``last_only``/``select`` on the fused path the top encoder
        layer computes only the consumed positions ([B, H] / [B, S, H],
        ``selected=True``); otherwise full [B, T, H] states come back
        and the caller gathers.  The output head is positionwise, so
        applying it after selection is math-identical to the
        reference's head-over-all-positions (bert4rec.py:83-86)."""
        t = item_seq.shape[1]
        if select is not None and select.shape[1] >= t:
            # S == T makes "did the fused path select?" ambiguous from
            # shapes (and saves nothing) — use the full path
            select = None
        x = self.embed(params, item_seq).astype(self.compute_dtype)
        # the positional-embedding add is fused into the prologue kernel
        x, rng = L.prologue_ln_dropout(
            params["input_ln"], x, self.hidden_dropout_prob, deterministic, rng,
            mesh=self.mesh, pos=params["position_embedding"][:t],
        )
        mask = L.attention_mask(item_seq, bidirectional=True)
        lens = jnp.sum((item_seq != 0).astype(jnp.int32), axis=1)
        x = L.transformer_encoder_apply(
            params["encoder"],
            x,
            mask,
            n_heads=self.n_heads,
            hidden_dropout=self.hidden_dropout_prob,
            attn_dropout=self.attn_dropout_prob,
            hidden_act=self.hidden_act,
            deterministic=deterministic,
            rng=rng,
            lens=lens,
            causal=False,
            last_only=last_only,
            select=select,
            mesh=self.mesh,
        )
        # with select < T enforced above, the fused path is the only way
        # the sequence axis can shrink
        selected = x.ndim == 2 or (select is not None and x.shape[1] != t)
        x = jax.nn.gelu(L.dense(params["output_ffn"], x))
        return L.layer_norm(params["output_ln"], x), selected

    def reconstruct_test_seq(self, item_seq, item_seq_len):
        """Append the mask token at the end position and shift left one
        step (reference bert4rec.py:109-120)."""
        b, t = item_seq.shape
        padded = jnp.concatenate([item_seq, jnp.zeros((b, 1), item_seq.dtype)], axis=1)
        padded = padded.at[jnp.arange(b), item_seq_len].set(self.mask_token)
        return padded[:, 1:]

    def forward(self, params, item_seq, item_seq_len, *, deterministic=True, rng=None):
        seq = self.reconstruct_test_seq(item_seq, item_seq_len)
        out, selected = self.encode(
            params, seq, deterministic=deterministic, rng=rng, last_only=True
        )
        if selected:
            return out
        return L.gather_last(out, item_seq_len)

    # ------------------------------------------------------------------
    def item_scores(self, params, seq_output, item_ids):
        emb = params["item_embedding"][item_ids].astype(seq_output.dtype)
        return jnp.sum(seq_output * emb, axis=-1) + params["output_bias"][item_ids]

    def full_sort_scores(self, params, item_seq, item_seq_len):
        seq_output = self.forward(params, item_seq, item_seq_len, deterministic=True)
        table = params["item_embedding"][: self.n_items].astype(seq_output.dtype)
        return (
            jnp.dot(seq_output, table.T, preferred_element_type=jnp.float32)
            + params["output_bias"][: self.n_items].astype(jnp.float32)
        )

    # ------------------------------------------------------------------
    def calculate_loss(self, params, batch, rng):
        """Cloze loss with the reference's fixed mask budget
        (``mask_item_length = mask_ratio * max_len``, bert4rec.py:61):
        positions are masked with prob ``mask_ratio`` (capped at the
        budget), the masked hidden states are gathered to a
        [B, mask_len, H] block, and CE/BPR runs only there — logits
        never materialize beyond O(B * mask_len * |V|), matching the
        memory shape of the reference's multi-hot bmm
        (bert4rec.py:141-181)."""
        item_seq = batch["item_seq"]
        row_w = batch.get("weight")
        b, t = item_seq.shape
        mask_len = max(1, int(self.mask_ratio * self.max_seq_length_eff(t)))
        rng, k_mask, k_fwd, k_neg = jax.random.split(rng, 4)

        real = item_seq != 0
        if self.config.get("cloze_last_only"):
            # DIAGNOSTIC protocol (BASELINE.md BERT4Rec-beauty anomaly):
            # mask only each row's last real position, making the train
            # task identical to the mask-append eval task.  Separates
            # "cloze doesn't transfer to end-prediction on this data"
            # from implementation bugs.
            pos = jnp.arange(t, dtype=jnp.int32)[None, :]
            want = jnp.logical_and(
                pos == (batch["item_seq_len"].astype(jnp.int32) - 1)[:, None],
                real,
            )
        else:
            want = jnp.logical_and(
                jax.random.bernoulli(k_mask, self.mask_ratio, item_seq.shape),
                real,
            )
        # cap the number of masked positions at the budget
        rank = jnp.cumsum(want, axis=1)  # 1-based rank among masked
        cloze = jnp.logical_and(want, rank <= mask_len)
        masked_seq = jnp.where(cloze, self.mask_token, item_seq)

        # compaction of the masked positions to the front WITHOUT
        # argsort/gather (slow on TPU: ~1.7 ms at [2048,200]): the
        # one-hot W[b,j,t] = (rank[b,t]==j+1 & cloze[b,t]) reduces
        # positions/targets with compare+sum only
        j1 = jnp.arange(1, mask_len + 1, dtype=rank.dtype)[None, :, None]
        w_sel = jnp.logical_and(rank[:, None, :] == j1, cloze[:, None, :])
        wf = w_sel.astype(jnp.int32)                                    # [B,L_m,T]
        pos = jnp.arange(t, dtype=jnp.int32)[None, None, :]
        order = jnp.sum(wf * pos, axis=2)                               # [B, L_m]
        sel_tgt = jnp.sum(wf * item_seq[:, None, :], axis=2)            # [B, L_m]
        n_masked = jnp.sum(cloze.astype(jnp.int32), axis=1)
        sel_valid = jnp.arange(mask_len, dtype=jnp.int32)[None, :] < n_masked[:, None]

        # on the fused path the top layer computes only the selected
        # positions (queries [L_m, T] instead of [T, T])
        out, selected = self.encode(
            params, masked_seq, deterministic=False, rng=k_fwd,
            select=order if mask_len < t else None,
        )
        if selected:
            sel_out = out                                               # [B, L_m, H]
        else:
            sel_out = jnp.take_along_axis(out, order[..., None], axis=1)

        w = sel_valid.astype(jnp.float32)
        if row_w is not None:
            w = w * row_w[:, None]
        denom = jnp.maximum(jnp.sum(w), 1.0)

        if self.loss_type == "BPR":
            neg = jax.random.randint(k_neg, sel_tgt.shape, 1, self.n_items)
            pos_emb = params["item_embedding"][sel_tgt].astype(sel_out.dtype)
            neg_emb = params["item_embedding"][neg].astype(sel_out.dtype)
            pos_score = jnp.sum(sel_out * pos_emb, -1) + params["output_bias"][sel_tgt]
            neg_score = jnp.sum(sel_out * neg_emb, -1) + params["output_bias"][neg]
            # reference bert4rec.py:194-197: -sum(log(1e-14 + sigmoid(diff)))/count
            loss = -jnp.log(1e-14 + jax.nn.sigmoid(pos_score - neg_score))
            return jnp.sum(loss * w) / denom

        h = sel_out.shape[-1]
        if self._use_fused_ce(
            self.n_items, h, rows=b * mask_len,
            table_rows=self.pad_vocab_rows(self.n_items + 1),
            bias_rows=self.pad_vocab_rows(self.n_items),
        ):
            from datamining_recblr_tpu.ops.fused_ce import fused_softmax_ce

            nll = fused_softmax_ce(
                sel_out.reshape(-1, h),
                params["item_embedding"][: self.n_items],
                jnp.maximum(sel_tgt, 0).reshape(-1),
                bias=params["output_bias"][: self.n_items],
                mm_bf16=self.compute_dtype == jnp.bfloat16,
                mesh=self.mesh,
            ).reshape(sel_tgt.shape)
            return jnp.sum(nll * w) / denom
        table = params["item_embedding"][: self.n_items].astype(sel_out.dtype)
        logits = (
            jnp.einsum(
                "bmh,vh->bmv", sel_out, table, preferred_element_type=jnp.float32
            )
            + params["output_bias"][: self.n_items].astype(jnp.float32)
        )
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(
            logits, jnp.maximum(sel_tgt, 0)[..., None], axis=-1
        )[..., 0]
        nll = logz - tgt
        return jnp.sum(nll * w) / denom

    def max_seq_length_eff(self, t):
        return self.max_seq_len if self.max_seq_len else t
