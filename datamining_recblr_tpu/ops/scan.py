"""First-order linear recurrence (data-dependent decay) scan ops.

Computes ``h_t = gate_t * h_{t-1} + token_t`` (with ``h_0 = token_1``
at t=1) for all t, vectorized over batch and channel dims.  This is the
TPU-native equivalent of the reference's Triton Blelloch-scan kernel
(reference ``parallel_scan.py:44-60``): where Triton packs the
``(x, f)`` fp32 pair into a uint64 to scan a single value
(``parallel_scan.py:17-41``), JAX's ``lax.associative_scan`` scans
tuples natively, and the Pallas fast path (``pallas_scan.py``) carries
the pair across sequence chunks explicitly.

Layout convention is **[B, T, C]** (time on axis 1), unlike the
reference's ``[B, C, T]`` (``parallel_scan.py:86``): on TPU the channel
dim C (=128 for the default model) maps exactly onto the 128-lane VPU/
MXU layout, and T on the sublane axis lets the scan vectorize across
channels with no transpose.

The backward pass replicates the reference's hand-derived VJP
(``parallel_scan.py:97-114``): a *reverse* scan of the output gradient
with gates shifted one step left (1-padded at the end), then
``d_gates = shift_right(h, 0-pad) * d_states`` and ``d_tokens =
d_states``.  Like the reference, the forward saves the output states
for backward (O(B*T*C) memory, no recomputation —
``parallel_scan.py:94``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _combine(a, b):
    """Associative combine for the first-order recurrence.

    ``a`` is the earlier element, ``b`` the later — matching the
    operand convention of the reference combine op
    (``parallel_scan.py:35-41``: ``x = x_l*f_r + x_r; f = f_l*f_r``).
    """
    xa, fa = a
    xb, fb = b
    return xa * fb + xb, fa * fb


def linear_scan_serial(gates, tokens):
    """NumPy-style serial oracle (slow; for tests). [B, T, C] layout."""
    import numpy as np

    gates = np.asarray(gates)
    tokens = np.asarray(tokens)
    out = np.zeros_like(tokens)
    h = np.zeros_like(tokens[:, 0])
    for t in range(tokens.shape[1]):
        h = gates[:, t] * h + tokens[:, t]
        out[:, t] = h
    return out


def _scan_fwd_xla(gates, tokens):
    h, _ = jax.lax.associative_scan(_combine, (tokens, gates), axis=1)
    return h


def _scan_rev_xla(gates, tokens):
    """Reverse-direction scan: h_t = gate_t * h_{t+1} + token_t.

    Implemented as flip -> forward scan -> flip, mirroring the
    reference's reversed-stride loads (``parallel_scan.py:70-80``).
    """
    g = jnp.flip(gates, axis=1)
    x = jnp.flip(tokens, axis=1)
    h = _scan_fwd_xla(g, x)
    return jnp.flip(h, axis=1)


@jax.custom_vjp
def linear_scan_xla(gates, tokens):
    """Differentiable scan via ``lax.associative_scan`` (XLA baseline path)."""
    return _scan_fwd_xla(gates, tokens)


def _xla_fwd(gates, tokens):
    states = _scan_fwd_xla(gates, tokens)
    return states, (states, gates)


def _xla_bwd(res, grad_states):
    states, gates = res
    # gates shifted one step left along time, 1-padded at the end
    # (math of reference parallel_scan.py:107).
    ones = jnp.ones_like(gates[:, :1])
    shifted_gates = jnp.concatenate([gates[:, 1:], ones], axis=1)
    d_states = _scan_rev_xla(shifted_gates, grad_states)
    # d_gates = h_{t-1} * d_states_t, with h_0 = 0
    # (reference parallel_scan.py:110-111).
    zeros = jnp.zeros_like(states[:, :1])
    shifted_states = jnp.concatenate([zeros, states[:, :-1]], axis=1)
    d_gates = shifted_states * d_states
    return d_gates, d_states


linear_scan_xla.defvjp(_xla_fwd, _xla_bwd)


@functools.partial(jax.jit, static_argnames=("impl",))
def linear_scan(gates, tokens, impl: str = "auto"):
    """Dispatching entry point: ``h[:, t] = gates[:, t]*h[:, t-1] + tokens[:, t]``.

    Args:
      gates:  [B, T, C] decay factors in (0, 1).
      tokens: [B, T, C] inputs.
      impl:   "xla" | "pallas" | "auto" (pallas on TPU, xla elsewhere).

    Returns: [B, T, C] hidden states, same dtype as inputs.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from datamining_recblr_tpu.ops.pallas_scan import linear_scan_pallas

        return linear_scan_pallas(gates, tokens)
    return linear_scan_xla(gates, tokens)
