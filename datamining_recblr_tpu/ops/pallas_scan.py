"""Pallas TPU kernel for the BD-LRU first-order linear recurrence.

TPU-native replacement for the reference's Triton Blelloch scan
(reference ``parallel_scan.py:44-80``).  Differences by design:

* **Grid**: the Triton kernel launches one program per (batch, channel)
  pair, each scanning the whole sequence scalar-by-scalar in registers
  (``parallel_scan.py:51-58``).  Here the grid tiles (batch x channel)
  into [BT, T, 128] VMEM blocks — the channel dim rides the 128-lane
  axis, the sequence rides sublanes, and each program performs a
  Hillis-Steele scan over time with `pltpu.roll` shifts: log2(T)
  fully-vectorized VPU steps over the whole block.
* **No pack64 trick**: Triton's single-value `associative_scan` forced
  the fp32 pair (x, f) into one uint64 (``parallel_scan.py:17-41``);
  the Pallas kernel just keeps two registers.
* **No power-of-two constraint**: any T works (the model therefore
  needs no "embedding padding" — SURVEY §5 long-context notes).
* **fp32 in-kernel math** (parity with ``parallel_scan.py:19-28``).

The custom VJP mirrors the reference's hand-derived backward
(``parallel_scan.py:97-114``): reverse scan of the cotangent with
gates shifted one step left and 1-padded, then
``d_gates = shift_right(h) * d_states``, ``d_tokens = d_states``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_BT = 8  # batch rows per block (scaled down for long sequences)


def _block_rows(t: int) -> int:
    return max(1, min(DEFAULT_BT, 4096 // max(t, 1)))


def _scan_body(x, f, reverse=False, return_prod=False):
    """Hillis-Steele inclusive scan along axis 1 of [BT, T, C] registers.

    ``reverse=True`` scans right-to-left (h_t = f_t * h_{t+1} + x_t),
    used by the backward pass — a native reverse avoids the expensive
    HBM `reverse` relayout ops XLA emits for jnp.flip.

    ``return_prod=True`` also returns the inclusive gate cumprod
    (prefix product of ``f`` up to and including t; for ``reverse``,
    the suffix product from t) — the sequence-chunked kernels use it
    to apply the cross-chunk carry."""
    t = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    d = 1
    while d < t:
        if reverse:
            keep = idx < t - d
            shift = (t - d) % t  # circular right by t-d == left by d
        else:
            keep = idx >= d
            shift = d
        xl = jnp.where(keep, pltpu.roll(x, shift, axis=1), 0.0)
        fl = jnp.where(keep, pltpu.roll(f, shift, axis=1), 1.0)
        x = xl * f + x
        f = fl * f
        d *= 2
    if return_prod:
        return x, f
    return x


def _scan_kernel(g_ref, x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    f = g_ref[:].astype(jnp.float32)
    o_ref[:] = _scan_body(x, f).astype(o_ref.dtype)


def _scan_kernel_rev(g_ref, x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    f = g_ref[:].astype(jnp.float32)
    o_ref[:] = _scan_body(x, f, reverse=True).astype(o_ref.dtype)


def _pad_to(x, axis, multiple, value):
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_b", "reverse"))
def _scan_fwd_pallas(gates, tokens, block_b: int = 0, reverse: bool = False):
    b, t, c = tokens.shape
    if not block_b:
        block_b = _block_rows(t)
    g = _pad_to(_pad_to(gates, 0, block_b, 1.0), 2, LANE, 1.0)
    x = _pad_to(_pad_to(tokens, 0, block_b, 0.0), 2, LANE, 0.0)
    bp, _, cp = x.shape
    grid = (bp // block_b, cp // LANE)
    spec = pl.BlockSpec(
        (block_b, t, LANE),
        lambda i, j: (i, 0, j),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _scan_kernel_rev if reverse else _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((bp, t, cp), tokens.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=jax.default_backend() != "tpu",
    )(g, x)
    return out[:b, :, :c]


@jax.custom_vjp
def linear_scan_pallas(gates, tokens):
    """h[:, t] = gates[:, t] * h[:, t-1] + tokens[:, t]; [B, T, C] layout."""
    return _scan_fwd_pallas(gates, tokens)


def _fwd(gates, tokens):
    states = _scan_fwd_pallas(gates, tokens)
    return states, (states, gates)


def _bwd(res, grad_states):
    states, gates = res
    ones = jnp.ones_like(gates[:, :1])
    shifted_gates = jnp.concatenate([gates[:, 1:], ones], axis=1)
    # native reverse scan (matches the Triton backward kernel's
    # reversed-stride loads, parallel_scan.py:70-80, without the HBM
    # reverse relayouts that jnp.flip would cost)
    d_states = _scan_fwd_pallas(shifted_gates, grad_states, reverse=True)
    zeros = jnp.zeros_like(states[:, :1])
    d_gates = jnp.concatenate([zeros, states[:, :-1]], axis=1) * d_states
    return d_gates, d_states


linear_scan_pallas.defvjp(_fwd, _bwd)
