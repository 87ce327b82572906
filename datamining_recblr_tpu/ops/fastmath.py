"""VPU-cheap transcendental forms for in-kernel (Pallas) math.

Measured on a v5e TensorCore (``benchmarks/vpu_ops.py``, marginal cost
over a dependent add chain inside a Pallas kernel): ``jnp.exp`` costs
~2.7x ``jax.lax.exp2``, and the exp-based logistic lowering of
``jax.nn.sigmoid`` costs ~1.6x ``jnp.tanh``.  Mosaic does not
strength-reduce these itself, so the fused kernels (which are
VPU/transcendental-bound — see CLAUDE.md perf state) call these forms
directly:

    exp(x)     = exp2(x * log2(e))                     (exact rewrite)
    sigmoid(x) = 0.5 * tanh(x/2) + 0.5                 (exact identity)

Both match the originals to ~1 ulp; kernel-vs-oracle parity tests run
at >= 1e-5 tolerance.  The reference model's math (sigmoid gates, exp
decay — ``RecBLR.py:196-199``) is unchanged, only its lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG2E = 1.4426950408889634  # log2(e)


def exp(x):
    """exp(x) via the VPU's native exp2."""
    return jax.lax.exp2(x * LOG2E)


def sigmoid(x):
    """Logistic via tanh: 0.5*tanh(x/2)+0.5."""
    return 0.5 * jnp.tanh(0.5 * x) + 0.5


def silu(x):
    return x * sigmoid(x)
