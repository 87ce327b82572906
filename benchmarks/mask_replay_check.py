"""TPU-only diagnostic: the sequence-chunked kernels' dropout replay.

The chunked backward walks chunks in REVERSE data order (flipped index
maps) and must regenerate bit-identical masks per DATA chunk via the
seed + i*nc + jd scheme.  CPU interpret stubs PRNG bits to zeros, so
this can only be validated on hardware — this script dumps the masks
from a forward-ordered and a reversed-order kernel and compares them
bitwise.  (Finite-difference grad checks through the full kernels are
NOT usable for this: fp32 loss rounding dominates — measured rel errs
up to 2x even on the known-good whole-T kernel.)

Round-3 result on v5e: bitwise equal, drop fraction 0.2 as configured.

Usage: python benchmarks/mask_replay_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datamining_recblr_tpu.ops.fused_layer import _dropout_mask

BT, TC, D, NB, NC = 8, 16, 64, 2, 4
KP = 0.8
SHAPES = [(BT, TC, D), (BT, TC, D), (BT, TC, 4 * D), (BT, TC, D)]


def _draw():
    return [_dropout_mask(s, KP) for s in SHAPES]


def fwd_kernel(seed_ref, *outs):
    i, j = pl.program_id(0), pl.program_id(1)
    nc = pl.num_programs(1)
    pltpu.prng_seed(seed_ref[0] + i * nc + j)
    for o, m in zip(outs, _draw()):
        o[:] = m


def bwd_kernel(seed_ref, *outs):
    i, j = pl.program_id(0), pl.program_id(1)
    nc = pl.num_programs(1)
    jd = nc - 1 - j  # data chunk (index maps flip the chunk axis)
    pltpu.prng_seed(seed_ref[0] + i * nc + jd)
    for o, m in zip(outs, _draw()):
        o[:] = m


def call(kernel, flip):
    idx = (lambda i, j: (i, NC - 1 - j, 0)) if flip else (lambda i, j: (i, j, 0))
    specs = tuple(
        pl.BlockSpec((BT, TC, s[2]), idx, memory_space=pltpu.VMEM)
        for s in SHAPES
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((NB * BT, NC * TC, s[2]), jnp.float32)
            for s in SHAPES
        ),
        grid=(NB, NC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(jnp.asarray([777], jnp.int32))


def main():
    assert jax.default_backend() == "tpu", "hardware-only check"
    a = call(fwd_kernel, False)
    b = call(bwd_kernel, True)
    ok = all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
    )
    dropped = float(np.mean(np.asarray(a[0]) == 0.0))
    print(f"drop fraction: {dropped:.3f} (configured {1-KP:.1f})")
    print(f"fwd vs reversed-bwd masks bitwise equal: {ok}")
    assert ok


if __name__ == "__main__":
    main()
