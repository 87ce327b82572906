"""RecBLR: Behavior-Dependent Linear Recurrent Unit recommender, TPU-native.

Re-implements the behavior of the reference model (reference
``RecBLR.py``) — item embedding -> dropout -> LayerNorm -> N x
(gated BD-LRU recurrent block [+ FFN]) -> last-position gather ->
dot-product scoring — with a TPU-first design:

* Static shapes everywhere: sequences are always [B, T] at the padded
  max length, so the reference's dynamic power-of-two "embedding
  padding" around the scan (``RecBLR.py:177-179,203-204``, paper §3.3)
  is unnecessary — under jit there is exactly one compiled shape and
  the scan kernel tiles it directly.
* The hot scan runs via ``ops.linear_scan`` — ``lax.associative_scan``
  (XLA) or the chunked Pallas kernel — instead of the Triton kernel
  (``parallel_scan.py``); layout is [B, T, C] with C=128 on the lane
  axis rather than the reference's [B, C, T].
* The causal depthwise conv is K shifted multiply-adds fused by XLA
  (see ``ops/conv.py``) instead of the cuDNN/causal-conv1d path
  (``RecBLR.py:182-193``).
* Scan gates/tokens are computed and scanned in fp32 even under bf16
  compute, mirroring the reference's fp32-only Triton scan
  (``parallel_scan.py:19-28``).

Ablation flags match the reference exactly: ``bd_lru_only`` forces
``disable_conv1d`` and ``disable_ffn`` (``RecBLR.py:33-35``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from datamining_recblr_tpu.models import layers as L
from datamining_recblr_tpu.models.base import SequentialModel
from datamining_recblr_tpu.ops.conv import causal_depthwise_conv
from datamining_recblr_tpu.ops.scan import linear_scan


def _softplus_inverse(x: float) -> float:
    return math.log(math.exp(x) - 1.0)


def lambda_init(hidden: int, r_min: float = 0.9, r_max: float = 0.999):
    """Decay-rate parameter init (reference ``RecBLR.py:153-166``):
    linspace in softplus-inverse space so that ``exp(-softplus(Lambda))``
    spans [r_min, r_max] across channels."""
    lo = _softplus_inverse(-math.log(r_min))
    hi = _softplus_inverse(-math.log(r_max))
    return jnp.linspace(lo, hi, hidden, dtype=jnp.float32)


class RecBLR(SequentialModel):
    def __init__(self, config, n_items, max_seq_len):
        super().__init__(config, n_items, max_seq_len)
        self.hidden_size = config["hidden_size"]
        self.num_layers = config["num_layers"]
        self.dropout_prob = config["dropout_prob"]
        self.expand = config["expand"]
        self.d_conv = config["d_conv"]
        self.bd_lru_only = bool(config["bd_lru_only"])
        self.disable_conv1d = bool(config["disable_conv1d"]) or self.bd_lru_only
        self.disable_ffn = bool(config["disable_ffn"]) or self.bd_lru_only
        self.inner_hidden = int(self.hidden_size * self.expand)
        self.scan_impl = {"auto": "auto", "always": "pallas", "never": "xla"}[
            str(config.get("use_pallas_scan", "auto"))
        ]

    # ------------------------------------------------------------------
    def init_params(self, rng):
        d, h, k = self.hidden_size, self.inner_hidden, self.d_conv
        dt = self.param_dtype
        keys = iter(jax.random.split(rng, 8 + 8 * self.num_layers))
        params = {
            "item_embedding": L.normal_init(next(keys), (self.n_items_padded, d), dtype=dt)
            .at[0]
            .set(0.0),  # padding_idx=0 zeroed (reference RecBLR.py:37-39)
            "input_ln": L.layer_norm_init(d, dt),
            "layers": [],
        }
        # Conv1d keeps torch's default kaiming-uniform init (the reference's
        # _init_weights only touches Linear/Embedding/LayerNorm): for a
        # depthwise conv, fan_in = kernel_size, bound = 1/sqrt(fan_in).
        conv_bound = 1.0 / math.sqrt(k)
        for _ in range(self.num_layers):
            grl = {
                "w_in": L.normal_init(next(keys), (d, 2 * h), dtype=dt),
                "conv_w": jax.random.uniform(
                    next(keys), (k, h), dt, -conv_bound, conv_bound
                ),
                "conv_b": jax.random.uniform(
                    next(keys), (h,), dt, -conv_bound, conv_bound
                ),
                "w_gates": L.normal_init(next(keys), (h, 2 * h), dtype=dt),
                "b_gates": jnp.zeros((2 * h,), dt),
                "Lambda": lambda_init(h),
                "w_out": L.normal_init(next(keys), (h, d), dtype=dt),
            }
            layer = {"grl": grl, "ln": L.layer_norm_init(d, dt)}
            if not self.disable_ffn:
                layer["ffn"] = {
                    "w1": L.dense_init(next(keys), d, 4 * d, dtype=dt),
                    "w2": L.dense_init(next(keys), 4 * d, d, dtype=dt),
                    "ln": L.layer_norm_init(d, dt),
                }
            params["layers"].append(layer)
        return params

    # ------------------------------------------------------------------
    def _gated_recurrent(self, p, x, *, deterministic, rng, lens=None):
        """Gated BD-LRU block (reference ``RecBLR.py:170-207``, paper Alg. 1).

        With ``lens`` (top layer of the unfused path) the output
        projection runs only at each row's last position -> [B, 1, D]:
        everything after the scan is dead code elsewhere because the
        model head consumes gather_last alone (RecBLR.py:83,86-122)."""
        del deterministic, rng  # no dropout inside the block
        xz = x @ p["w_in"].astype(x.dtype)
        xb, z = jnp.split(xz, 2, axis=-1)

        use_fused = (
            self.scan_impl != "xla"
            and self.inner_hidden <= 128
            and self._seq_shards() == 1
            and (self.scan_impl == "pallas" or jax.default_backend() == "tpu")
        )
        if use_fused:
            # fused Pallas kernel: causal conv + SiLU + gates matmul +
            # decay math + scan, all in VMEM, fp32 internally
            # (ops/fused_bdlru.py)
            from datamining_recblr_tpu.ops.fused_bdlru import fused_bdlru

            h = fused_bdlru(
                xb,
                p["conv_w"].astype(jnp.float32),
                p["conv_b"].astype(jnp.float32),
                p["w_gates"].astype(jnp.float32),
                p["b_gates"].astype(jnp.float32),
                p["Lambda"].astype(jnp.float32),
                not self.disable_conv1d,
                self._mm_bf16(),
            )
        else:
            if not self.disable_conv1d:
                xb = jax.nn.silu(
                    causal_depthwise_conv(
                        xb, p["conv_w"].astype(xb.dtype), p["conv_b"].astype(xb.dtype)
                    )
                )
            # Gates and scan in fp32 (parity with the fp32 Triton scan).
            xb32 = xb.astype(jnp.float32)
            g = xb32 @ p["w_gates"].astype(jnp.float32) + p["b_gates"].astype(
                jnp.float32
            )
            rec, inp = jnp.split(g, 2, axis=-1)
            # alpha = exp(-softplus(Lambda) * sigmoid(rec));
            # beta = sqrt(1 - alpha^2 + 1e-8) * sigmoid(inp)  (RecBLR.py:196-199)
            alpha = jnp.exp(-jax.nn.softplus(p["Lambda"]) * jax.nn.sigmoid(rec))
            beta = jnp.sqrt(1.0 - jnp.square(alpha) + 1e-8) * jax.nn.sigmoid(inp)
            if self._seq_shards() > 1:
                # sequence parallelism: the recurrence crosses device
                # boundaries via the carry combine in seq_parallel_scan;
                # gate math per chunk is unchanged (RecBLR.py:196-200)
                from datamining_recblr_tpu.ops.seq_parallel_scan import (
                    seq_parallel_scan,
                )

                batch_axis = "data" if "data" in self.mesh.shape else None
                h = seq_parallel_scan(
                    alpha, beta * xb32, self.mesh, "seq",
                    batch_axis=batch_axis, impl=self.scan_impl,
                )
            else:
                h = linear_scan(alpha, beta * xb32, impl=self.scan_impl)
            h = h.astype(x.dtype)

        if lens is not None:
            idx = (lens - 1)[:, None, None]
            h = jnp.take_along_axis(h, idx, axis=1)  # [B, 1, C]
            z = jnp.take_along_axis(z, idx, axis=1)
        return (jax.nn.silu(z) * h) @ p["w_out"].astype(x.dtype)

    def _ffn(self, p, x, *, deterministic, rng):
        """SiLU point-wise FFN with residual + LN (reference ``RecBLR.py:210-227``)."""
        if rng is not None:
            rng, k1, k2 = jax.random.split(rng, 3)
        else:
            k1 = k2 = None
        y = jax.nn.silu(L.dense(p["w1"], x))
        y = L.dropout(k1, y, self.dropout_prob, deterministic) if k1 is not None else y
        y = L.dense(p["w2"], y)
        y = L.dropout(k2, y, self.dropout_prob, deterministic) if k2 is not None else y
        return L.layer_norm(p["ln"], y + x)

    def _mm_bf16(self):
        # Measured on v5e (B=2048, T=200): explicit bf16 matmul operands
        # make the fused kernels ~4% SLOWER — Mosaic already executes
        # f32 dots at single-bf16-pass speed, so the casts are pure VPU
        # overhead.  Keep the kernel option for experimentation but
        # never enable it from the model.
        return False

    def _use_fused_layer(self):
        # whole-layer fusion holds its fp32 working set in VMEM; beyond
        # T=512 (measured v5e limit) the sequence-chunked variant
        # (_use_chunked_layer) takes over
        return (
            self.scan_impl != "xla"
            and self.hidden_size <= 128
            and self.inner_hidden <= 128
            and self.max_seq_len <= 512
            and self._seq_shards() == 1
            and (self.scan_impl == "pallas" or jax.default_backend() == "tpu")
        )

    def _use_chunked_layer(self):
        # long-context path: whole-layer fusion with the sequence tiled
        # into chunks and the recurrence carried across them
        # (ops/fused_layer_chunked.py) — keeps XLong-scale T on the
        # fused path instead of the partially-fused fallback.  Under a
        # data mesh the same shard_map wrappers as the <=512 kernels
        # apply; a seq axis routes to ops/seq_parallel_scan instead.
        # pick_chunk()==0 (no divisor of T in [8, 128], e.g. prime T)
        # or d_conv > 8 fall back to the partially-fused path.
        from datamining_recblr_tpu.ops.fused_layer_chunked import pick_chunk

        return (
            self.scan_impl != "xla"
            and self.hidden_size <= 128
            and self.inner_hidden <= 128
            and self.max_seq_len > 512
            and self._seq_shards() == 1
            and pick_chunk(self.max_seq_len) >= max(8, self.d_conv)
            and self.d_conv <= 8
            and (self.scan_impl == "pallas" or jax.default_backend() == "tpu")
        )

    def _seq_shards(self):
        """Size of the mesh ``seq`` axis (sequence parallelism): >1
        shards the time axis across devices and dispatches the
        recurrence through ops/seq_parallel_scan."""
        return self.mesh.shape.get("seq", 1) if self.mesh is not None else 1

    @staticmethod
    def _flat_layer_params(layer, use_ffn):
        grl = layer["grl"]
        f32 = lambda a: a.astype(jnp.float32)
        flat = {
            "w_in": f32(grl["w_in"]),
            "wc": f32(grl["conv_w"]),
            "bc": f32(grl["conv_b"]),
            "wg": f32(grl["w_gates"]),
            "bg": f32(grl["b_gates"]),
            "lam": f32(grl["Lambda"]),
            "w_out": f32(grl["w_out"]),
            "ln1_s": f32(layer["ln"]["scale"]),
            "ln1_b": f32(layer["ln"]["bias"]),
        }
        if use_ffn:
            ffn = layer["ffn"]
            flat.update(
                w1=f32(ffn["w1"]["w"]), b1=f32(ffn["w1"]["b"]),
                w2=f32(ffn["w2"]["w"]), b2=f32(ffn["w2"]["b"]),
                ln2_s=f32(ffn["ln"]["scale"]), ln2_b=f32(ffn["ln"]["bias"]),
            )
        return flat

    def forward(self, params, item_seq, item_seq_len, *, deterministic=True, rng=None):
        training = rng is not None and not deterministic
        use_fused = self._use_fused_layer()
        use_chunked = not use_fused and self._use_chunked_layer()
        x = self.embed(params, item_seq).astype(self.compute_dtype)

        if not (use_fused or use_chunked):
            if rng is not None:
                rng, sub = jax.random.split(rng)
                x = L.dropout(sub, x, self.dropout_prob, deterministic)
            x = L.layer_norm(params["input_ln"], x)
        if use_fused or use_chunked:
            # whole-layer fused kernels (ops/fused_layer.py; beyond
            # T=512 the sequence-chunked variant,
            # ops/fused_layer_chunked.py): in-kernel dropout uses the
            # TPU PRNG with a per-step-derived seed
            from datamining_recblr_tpu.ops.fused_layer import (
                fused_dropout_ln,
                fused_recurrent_layer,
                fused_recurrent_layer_last,
            )

            if use_chunked:
                from datamining_recblr_tpu.ops.fused_layer_chunked import (
                    fused_recurrent_layer_chunked,
                )

                def fused_recurrent_layer(x, seed, flat, use_conv, use_ffn,
                                          p_drop, mm_bf16, pro=False):
                    return fused_recurrent_layer_chunked(
                        x, seed, flat, use_conv, use_ffn, p_drop, mm_bf16,
                        pro,
                    )

            p_drop = float(self.dropout_prob) if training else 0.0
            n_seeds = len(params["layers"]) + 1  # +1 for the prologue
            if training:
                rng, k_seed = jax.random.split(rng)
                seeds = jax.random.randint(
                    k_seed, (n_seeds, 1), 0, 2**31 - 1, dtype=jnp.int32
                )
            else:
                seeds = jnp.zeros((n_seeds, 1), jnp.int32)
            ln_s = params["input_ln"]["scale"].astype(jnp.float32)
            ln_b = params["input_ln"]["bias"].astype(jnp.float32)
            use_conv = not self.disable_conv1d
            use_ffn = not self.disable_ffn
            mm_bf16 = self._mm_bf16()

            # one code path for meshed and unmeshed execution:
            # L._data_shard_map wraps each kernel in shard_map over the
            # data axis (with per-device dropout-seed offsets) when a
            # data mesh is active, and passes the call through untouched
            # otherwise
            dsm = lambda n_batch, fn: L._data_shard_map(self.mesh, n_batch, fn)  # noqa: E731
            n_layers = len(params["layers"])
            # with >= 2 layers the prologue fuses into layer 0's kernel;
            # a 1-layer model keeps the standalone kernel (the
            # last-position kernel has no prologue support)
            fuse_pro = n_layers >= 2
            if not fuse_pro:
                x = dsm(
                    1, lambda xs, s, a, b: fused_dropout_ln(xs, s, a, b, p_drop)
                )(x, seeds[-1], ln_s, ln_b)
            # the last-position kernel holds full [bt, T, C] in VMEM;
            # it fits to T=1024 (measured v5e) — beyond, the top layer
            # runs the chunked kernel + gather
            last_ok = self.max_seq_len <= 1024
            for li, layer in enumerate(params["layers"]):
                flat = self._flat_layer_params(layer, use_ffn)
                if li == n_layers - 1 and last_ok:
                    # top layer: only the last position is consumed
                    return dsm(
                        2,
                        lambda xs, ls, s, f: fused_recurrent_layer_last(
                            xs, ls, s, f, use_conv, use_ffn, p_drop, mm_bf16
                        ),
                    )(x, item_seq_len, seeds[li], flat)
                pro = fuse_pro and li == 0
                if pro:
                    flat = dict(flat, pl_s=ln_s, pl_b=ln_b)
                x = dsm(
                    1,
                    lambda xs, s, f, pro=pro: fused_recurrent_layer(
                        xs, s, f, use_conv, use_ffn, p_drop, mm_bf16, pro
                    ),
                )(x, seeds[li], flat)
            return L.gather_last(x, item_seq_len)

        n_layers = len(params["layers"])
        for li, layer in enumerate(params["layers"]):
            if rng is not None:
                rng, k_grl, k_drop, k_ffn = jax.random.split(rng, 4)
            else:
                k_grl = k_drop = k_ffn = None
            last = li == n_layers - 1
            h = self._gated_recurrent(
                layer["grl"], x, deterministic=deterministic, rng=k_grl,
                lens=item_seq_len if last else None,
            )
            if last:
                # top layer: only the last position is consumed — the
                # residual/LN/FFN tail runs on [B, 1, D]
                x = jnp.take_along_axis(
                    x, (item_seq_len - 1)[:, None, None], axis=1
                )
            if k_drop is not None:
                h = L.dropout(k_drop, h, self.dropout_prob, deterministic)
            x = L.layer_norm(layer["ln"], h + x)
            if not self.disable_ffn:
                x = self._ffn(layer["ffn"], x, deterministic=deterministic, rng=k_ffn)

        return x[:, 0, :] if n_layers else L.gather_last(x, item_seq_len)
