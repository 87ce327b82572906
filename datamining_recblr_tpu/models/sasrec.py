"""SASRec baseline: unidirectional self-attention tower.

Behavioral parity with the reference wrapper (reference ``sasrec.py``)
and the RecBole ``TransformerEncoder`` it delegates to: item embedding
+ learned positional embedding -> LayerNorm -> dropout -> causal
transformer stack (additive -10000 mask over padding and future
positions, post-LN residual blocks) -> last-position gather, with the
same CE/BPR loss trio as RecBLR (``sasrec.py:116-150``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from datamining_recblr_tpu.models import layers as L
from datamining_recblr_tpu.models.base import SequentialModel


class SASRec(SequentialModel):
    def __init__(self, config, n_items, max_seq_len):
        super().__init__(config, n_items, max_seq_len)
        self.n_layers = config["n_layers"]
        self.n_heads = config["n_heads"]
        self.hidden_size = config["hidden_size"]
        self.inner_size = config["inner_size"]
        self.hidden_dropout_prob = config["hidden_dropout_prob"]
        self.attn_dropout_prob = config["attn_dropout_prob"]
        self.hidden_act = config["hidden_act"]

    def init_params(self, rng):
        k_item, k_pos, k_trm = jax.random.split(rng, 3)
        d = self.hidden_size
        dt = self.param_dtype
        return {
            "item_embedding": L.normal_init(k_item, (self.n_items_padded, d), dtype=dt)
            .at[0]
            .set(0.0),
            "position_embedding": L.normal_init(k_pos, (self.max_seq_len, d), dtype=dt),
            "input_ln": L.layer_norm_init(d, dt),
            "encoder": L.transformer_encoder_init(
                k_trm, self.n_layers, self.n_heads, d, self.inner_size, dt
            ),
        }

    def forward(self, params, item_seq, item_seq_len, *, deterministic=True, rng=None):
        t = item_seq.shape[1]
        x = self.embed(params, item_seq).astype(self.compute_dtype)
        # LN then dropout (reference sasrec.py:104-105 order); the
        # positional-embedding add is fused into the prologue kernel
        x, rng = L.prologue_ln_dropout(
            params["input_ln"], x, self.hidden_dropout_prob, deterministic, rng,
            mesh=self.mesh, pos=params["position_embedding"][:t],
        )
        mask = L.attention_mask(item_seq, bidirectional=False)
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
            causal=True,
            # the head consumes only the last position (sasrec.py:109-114);
            # on the fused path the top layer runs the last-query kernel
            # and returns [B, D] directly
            last_only=True,
            mesh=self.mesh,
        )
        if x.ndim == 2:
            return x
        return L.gather_last(x, item_seq_len)
