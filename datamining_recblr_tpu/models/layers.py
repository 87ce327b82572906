"""Shared functional NN building blocks (plain pytree params, no framework).

Parameters are plain nested dicts of ``jnp.ndarray``; every layer is a
pure function ``(params, inputs, ...) -> outputs``.  This keeps the
whole model a jit-friendly pytree that `pjit`/GSPMD can shard with
simple ``NamedSharding`` annotations, with no module framework in the
compute path.

Initialization parity: linear / embedding weights ~ N(0, 0.02), biases
zero, LayerNorm weight 1 / bias 0 — matching the reference's
``_init_weights`` (reference ``RecBLR.py:66-73``, ``sasrec.py:83-93``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-12  # reference RecBLR.py:41 (and RecBole layer_norm_eps default)
INIT_STD = 0.02  # reference RecBLR.py:68 / initializer_range


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def normal_init(rng, shape, std=INIT_STD, dtype=jnp.float32):
    return (std * jax.random.normal(rng, shape)).astype(dtype)


def dense_init(rng, d_in, d_out, bias=True, dtype=jnp.float32):
    p = {"w": normal_init(rng, (d_in, d_out), dtype=dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# forward helpers
# ---------------------------------------------------------------------------

def dense(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def layer_norm(p, x, eps=LN_EPS):
    # Normalize in fp32 for stability regardless of compute dtype.
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def dropout(rng, x, rate, deterministic):
    """Inverted dropout (torch semantics: scale kept units by 1/(1-p))."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


_ACTIVATIONS = {
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def activation(name):
    return _ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# Transformer encoder (behavioral parity with RecBole's TransformerEncoder,
# which both attention baselines delegate to — reference sasrec.py:59-68,
# bert4rec.py:70-79).  Post-LN blocks, additive -10000 attention mask.
# ---------------------------------------------------------------------------

def transformer_encoder_init(
    rng, n_layers, n_heads, hidden_size, inner_size, dtype=jnp.float32
):
    del n_heads  # head count only affects the forward reshape
    layers = []
    for _ in range(n_layers):
        rngs = jax.random.split(rng, 8)
        rng = rngs[0]
        layers.append(
            {
                "q": dense_init(rngs[1], hidden_size, hidden_size, dtype=dtype),
                "k": dense_init(rngs[2], hidden_size, hidden_size, dtype=dtype),
                "v": dense_init(rngs[3], hidden_size, hidden_size, dtype=dtype),
                "attn_out": dense_init(rngs[4], hidden_size, hidden_size, dtype=dtype),
                "attn_ln": layer_norm_init(hidden_size, dtype),
                "ffn_1": dense_init(rngs[5], hidden_size, inner_size, dtype=dtype),
                "ffn_2": dense_init(rngs[6], inner_size, hidden_size, dtype=dtype),
                "ffn_ln": layer_norm_init(hidden_size, dtype),
            }
        )
    return layers


FORCE_FUSED_ATTENTION = None  # tests may force True/False; None = TPU backend


def _use_fused_attention():
    if FORCE_FUSED_ATTENTION is not None:
        return bool(FORCE_FUSED_ATTENTION)
    import jax as _jax

    return _jax.default_backend() == "tpu"


def _data_shard_map(mesh, n_batch, fn):
    """Wrap a fused-kernel call in shard_map over the mesh ``data`` axis
    (pallas_call has no GSPMD partitioning rule, so under a mesh each
    kernel runs per-shard).  ``fn`` takes ``(*batch_arrays, seed,
    params)``: the first ``n_batch`` args are data-sharded on their
    leading axis, the per-step dropout seed is offset by the device
    index so shards draw independent masks, and the trailing args
    (params) stay replicated — same scheme as the shard_map wrappers in
    ``models/recblr.py`` (their grad correctness vs single-device is
    pinned by tests/test_mesh_fused.py and the 2-process bitwise
    trajectory test)."""
    if mesh is None:
        return fn
    from datamining_recblr_tpu.parallel.mesh import DATA_AXIS

    if DATA_AXIS not in mesh.shape:
        return fn
    import functools

    from jax.sharding import PartitionSpec as P

    def call(*args):
        n_rep = len(args) - n_batch

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=tuple([P(DATA_AXIS)] * n_batch + [P()] * n_rep),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
        def _inner(*a):
            seed = (
                a[n_batch]
                + jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) * 1000003
            )
            return fn(*a[:n_batch], seed, *a[n_batch + 1 :])

        return _inner(*args)

    return call


def prologue_ln_dropout(ln_params, x, dropout_p, deterministic, rng, mesh=None,
                        pos=None):
    """dropout(LN(x + pos)) — the attention baselines' embedding
    prologue (reference sasrec.py:102-105 order; ``pos`` is the [T, D]
    positional-embedding table, added in the same pass).  On the TPU it
    runs as one Pallas kernel with in-kernel PRNG
    (ops/fused_layer.fused_ln_dropout — XLA's composition materializes
    the pos-add round-trip, rng bits, keep mask and f32 stats in HBM);
    elsewhere the plain composition.  Returns (x, rng)."""
    if _use_fused_attention() and x.shape[-1] <= 512:
        from datamining_recblr_tpu.ops.fused_layer import fused_ln_dropout

        training = rng is not None and not deterministic
        p = float(dropout_p) if training else 0.0
        if training:
            rng, k_seed = jax.random.split(rng)
            seed = jax.random.randint(k_seed, (1,), 0, 2**31 - 1, dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        if pos is None:
            pos = jnp.zeros((x.shape[1], x.shape[2]), jnp.float32)
        x = _data_shard_map(
            mesh, 1,
            lambda xs, s, p_, scale, bias: fused_ln_dropout(
                xs, p_, s, scale, bias, p
            ),
        )(
            x, seed,
            pos.astype(jnp.float32),
            ln_params["scale"].astype(jnp.float32),
            ln_params["bias"].astype(jnp.float32),
        )
        return x, rng
    if pos is not None:
        x = x + pos.astype(x.dtype)
    x = layer_norm(ln_params, x)
    if rng is not None:
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, dropout_p, deterministic)
    return x, rng


def _multi_head_attention(
    p, x, attn_mask, n_heads, *, hidden_dropout, attn_dropout, deterministic, rng,
    lens=None, causal=None, mesh=None,
):
    b, t, h = x.shape
    d_head = h // n_heads

    def split_heads(y):
        return y.reshape(b, t, n_heads, d_head).transpose(0, 2, 1, 3)

    q = split_heads(dense(p["q"], x))
    k = split_heads(dense(p["k"], x))
    v = split_heads(dense(p["v"], x))

    if lens is not None and causal is not None and _use_fused_attention():
        # fused Pallas attention: the [B,H,T,T] probabilities stay in
        # VMEM (ops/attention.py); probs dropout runs in-kernel
        from datamining_recblr_tpu.ops.attention import fused_attention

        training = rng is not None and not deterministic
        p_attn = float(attn_dropout) if training else 0.0
        if training:
            rng, k_seed = jax.random.split(rng)
            seed = jax.random.randint(k_seed, (1,), 0, 2**31 - 1, dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        ctx = _data_shard_map(
            mesh, 4,
            lambda qs, ks, vs, ls, s: fused_attention(
                qs, ks, vs, ls, s, bool(causal), p_attn
            ),
        )(q, k, v, lens, seed)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(d_head, jnp.float32))
        scores = scores + attn_mask  # additive mask: 0 keep / -10000 drop
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            probs = dropout(sub, probs, attn_dropout, deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t, h)
    out = dense(p["attn_out"], ctx)
    if rng is not None:
        rng, sub = jax.random.split(rng)
        out = dropout(sub, out, hidden_dropout, deterministic)
    return layer_norm(p["attn_ln"], out + x)


def transformer_encoder_apply(
    layers,
    x,
    attn_mask,
    *,
    n_heads,
    hidden_dropout,
    attn_dropout,
    hidden_act="gelu",
    deterministic=True,
    rng=None,
    lens=None,
    causal=None,
    last_only=False,
    select=None,
    mesh=None,
):
    """Apply the post-LN transformer stack; returns final hidden states.

    When ``lens``/``causal`` are given and a TPU backend is active, each
    whole encoder layer runs as one fused Pallas kernel per direction
    (ops/fused_block.py: QKV projections, per-head masked softmax
    attention, output projection, both residual LayerNorms and the FFN,
    with in-kernel PRNG dropout) — the [B,H,T,dh] head-split tensors
    and [B,H,T,T] probabilities never touch HBM.  Unsupported shapes
    fall back to the per-op composition below (which still uses the
    fused attention kernel for the softmax block when it can).

    With ``last_only=True`` (fused path only) the FINAL layer runs the
    last-query kernel and the return value is the gathered [B, D]
    last-position output instead of [B, T, D] — the caller must then
    skip its own gather.  With ``select`` (int [B, S] position indices;
    fused path only) the FINAL layer runs the selected-positions kernel
    and returns [B, S, D] — the caller must skip its own
    take_along_axis.  On the fallback path full states come back and
    the caller gathers as usual."""
    if lens is not None and causal is not None and _use_fused_attention():
        from datamining_recblr_tpu.ops import fused_block as FB

        b, t, h = x.shape
        inner = layers[0]["ffn_1"]["w"].shape[1]
        if FB.supports(h, n_heads, inner, t, hidden_act):
            training = rng is not None and not deterministic
            p_hidden = float(hidden_dropout) if training else 0.0
            p_attn = float(attn_dropout) if training else 0.0
            mm_bf16 = x.dtype == jnp.bfloat16
            for li, p in enumerate(layers):
                if training:
                    rng, k_seed = jax.random.split(rng)
                    seed = jax.random.randint(
                        k_seed, (1,), 0, 2**31 - 1, dtype=jnp.int32
                    )
                else:
                    seed = jnp.zeros((1,), jnp.int32)
                fp = {
                    "w_q": p["q"]["w"], "b_q": p["q"]["b"],
                    "w_k": p["k"]["w"], "b_k": p["k"]["b"],
                    "w_v": p["v"]["w"], "b_v": p["v"]["b"],
                    "w_o": p["attn_out"]["w"], "b_o": p["attn_out"]["b"],
                    "ln1_s": p["attn_ln"]["scale"], "ln1_b": p["attn_ln"]["bias"],
                    "w1": p["ffn_1"]["w"], "b1": p["ffn_1"]["b"],
                    "w2": p["ffn_2"]["w"], "b2": p["ffn_2"]["b"],
                    "ln2_s": p["ffn_ln"]["scale"], "ln2_b": p["ffn_ln"]["bias"],
                }
                fp = {k: v.astype(jnp.float32) for k, v in fp.items()}
                if last_only and li == len(layers) - 1:
                    # top layer: only the last position is consumed.
                    # Valid causal (padding mask == causal mask on the
                    # last row) and bidirectional (padding-only mask).
                    return _data_shard_map(
                        mesh, 2,
                        lambda xs, ls, s, p_: FB.fused_transformer_layer_last(
                            xs, ls, s, p_, n_heads,
                            p_hidden, p_attn, hidden_act, mm_bf16,
                        ),
                    )(x, lens, seed, fp)
                if select is not None and li == len(layers) - 1:
                    # top layer: only S selected positions are consumed
                    # (bidirectional cloze loss).  The sel kernel's mask
                    # is key-padding only — a causal stack would silently
                    # leak future positions through it.
                    if causal:
                        raise ValueError(
                            "select= requires a bidirectional stack; the "
                            "selected-positions kernel has no causal mask"
                        )
                    return _data_shard_map(
                        mesh, 3,
                        lambda xs, ls, sel, s, p_: FB.fused_transformer_layer_sel(
                            xs, ls, sel, s, p_, n_heads,
                            p_hidden, p_attn, hidden_act, mm_bf16,
                        ),
                    )(x, lens, select, seed, fp)
                x = _data_shard_map(
                    mesh, 2,
                    lambda xs, ls, s, p_: FB.fused_transformer_layer(
                        xs, ls, s, p_, bool(causal), n_heads,
                        p_hidden, p_attn, hidden_act, mm_bf16,
                    ),
                )(x, lens, seed, fp)
            return x

    act = activation(hidden_act)
    for p in layers:
        if rng is not None:
            rng, sub1, sub2 = jax.random.split(rng, 3)
        else:
            sub1 = sub2 = None
        x = _multi_head_attention(
            p,
            x,
            attn_mask,
            n_heads,
            hidden_dropout=hidden_dropout,
            attn_dropout=attn_dropout,
            deterministic=deterministic,
            rng=sub1,
            lens=lens,
            causal=causal,
            mesh=mesh,
        )
        y = act(dense(p["ffn_1"], x))
        y = dense(p["ffn_2"], y)
        if sub2 is not None:
            y = dropout(sub2, y, hidden_dropout, deterministic)
        x = layer_norm(p["ffn_ln"], y + x)
    return x


def attention_mask(item_seq, bidirectional=False):
    """Additive attention mask [B, 1, T, T]: 0 for attend, -10000 for masked.

    Parity with RecBole's ``get_attention_mask``: key-padding mask
    (item != 0) combined with a lower-triangular causal mask unless
    bidirectional (used by BERT4Rec — reference ``bert4rec.py:132``).
    """
    t = item_seq.shape[1]
    pad = (item_seq != 0)[:, None, None, :]  # [B,1,1,T] key padding
    if not bidirectional:
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        keep = jnp.logical_and(pad, causal)
    else:
        keep = jnp.broadcast_to(pad, (item_seq.shape[0], 1, t, t))
    return jnp.where(keep, 0.0, -10000.0).astype(jnp.float32)


def gather_last(x, seq_len):
    """x: [B, T, H], seq_len: [B] -> [B, H] at position len-1.

    Parity with RecBole's ``gather_indexes`` (used at reference
    ``RecBLR.py:83``, ``sasrec.py:113``).
    """
    idx = jnp.clip(seq_len - 1, 0, x.shape[1] - 1)
    return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
