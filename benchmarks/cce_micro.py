#!/usr/bin/env python
"""Isolate the vocab-chunked CE cost at the XLong shape: value+grad of
the chunked kernel vs the XLA logsumexp composition, outside the train
step.  Usage: python benchmarks/cce_micro.py [V] [N] [BV ...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from datamining_recblr_tpu.ops.fused_ce import fused_softmax_ce


def _sync(out):
    # block_until_ready is a no-op under the axon remote client; fetch
    # a scalar instead (device executes in order, so this waits for all
    # queued dispatches)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.ravel()[0])


def timeit(f, *args):
    _sync(f(*args))  # compile
    _sync(f(*args))  # warm
    t0 = time.perf_counter()
    k = 20
    for _ in range(k):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / k


def main(v=329_722, n=512, bvs=(None,)):
    d = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32) * 0.1)
    table = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.integers(1, v, size=n).astype(np.int32))
    w = jnp.ones((n,), jnp.float32)

    def xla_loss(x, table):
        logits = jnp.dot(
            x, table.T.astype(x.dtype), preferred_element_type=jnp.float32
        )
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
        return jnp.sum((logz - tgt) * w)

    def make(bv):
        def loss(x, table):
            nll = fused_softmax_ce(
                x, table, targets, mm_bf16=True, vocab_block=bv
            )
            return jnp.sum(nll * w)
        return loss

    for name, loss in [("xla", xla_loss)] + [
        (f"chunk-bv{bv or 'def'}", make(bv)) for bv in bvs
    ]:
        fwd = jax.jit(loss)
        vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        tf = timeit(fwd, x, table)
        tg = timeit(vg, x, table)
        print(
            f"{name:>14}: fwd {tf*1e3:7.3f} ms   fwd+bwd {tg*1e3:7.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 329_722
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bvs = [int(a) for a in sys.argv[3:]] or [None, 4096, 8192]
    main(v, n, bvs)
