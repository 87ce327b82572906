"""Causal depthwise 1-D convolution, TPU-style.

The reference uses either ``nn.Conv1d(groups=hidden, padding=K-1)`` with
a slice to drop the acausal tail, or the external fused
``causal_conv1d`` CUDA extension (reference ``RecBLR.py:182-193``,
``requirements.txt:4``).  On TPU a depthwise conv with K=4 is pure
VPU work; expressing it as K shifted multiply-accumulates lets XLA fuse
it into the surrounding elementwise ops with no im2col or conv
scheduling at all — this *is* the fused fast path.
"""

from __future__ import annotations

import jax.numpy as jnp


def causal_depthwise_conv(x, weight, bias=None):
    """y[:, t, c] = bias[c] + sum_k weight[k, c] * x[:, t - (K-1) + k, c].

    Args:
      x:      [B, T, C] inputs.
      weight: [K, C] depthwise taps, tap K-1 multiplies the current step
              (i.e. weight ordered oldest-to-newest, matching a
              cross-correlation conv with left padding K-1).
      bias:   optional [C].

    Returns [B, T, C].
    """
    k = weight.shape[0]
    y = x * weight[k - 1]
    for j in range(1, k):
        # shift x right by j along time (zero history before t=0)
        shifted = jnp.pad(x[:, : x.shape[1] - j], ((0, 0), (j, 0), (0, 0)))
        y = y + shifted * weight[k - 1 - j]
    if bias is not None:
        y = y + bias
    return y
