"""Microbenchmark: relative VPU cost of elementwise ops inside a Pallas
kernel on the TPU (the fused RecBLR kernels are VPU/transcendental-bound
— CLAUDE.md perf state), to direct algebraic strength-reduction.

Each kernel reads one [8, 512, 128] f32 block from VMEM and applies the
op REPEAT times in an unrolled chain (data-dependent, so Mosaic cannot
elide it), then writes the block back.  Reported per-op time subtracts
the `mul` baseline's overhead implicitly — compare columns.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPEAT = 64
SHAPE = (8, 512, 128)

OPS = {
    "mul": lambda x: x * 1.0000001,
    "add": lambda x: x + 1e-7,
    "exp": jnp.exp,
    "exp2": jax.lax.exp2,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "log": lambda x: jnp.log(jnp.abs(x) + 1.0),
    "sqrt": lambda x: jnp.sqrt(jnp.abs(x) + 1e-6),
    "rsqrt": lambda x: jax.lax.rsqrt(jnp.abs(x) + 1e-6),
    "div": lambda x: 1.0 / (x + 1.7),
    "recip_mul": lambda x: x * (x + 1.7),
    "softplus": jax.nn.softplus,
    "silu": lambda x: x * jax.nn.sigmoid(x),
    "where": lambda x: jnp.where(x > 0.5, x, x * 0.5),
}


def make_fn(op):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(REPEAT):
            x = op(x) * 0.9 + 0.05  # keep values bounded, chain dependent
        o_ref[:] = x

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn


def time_fn(fn, x, iters=200):
    fn(x).block_until_ready()
    # chain through the output so the axon remote queue actually drains
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y)
    float(y.sum())
    return (time.perf_counter() - t0) / iters


def main():
    x = jax.random.uniform(jax.random.PRNGKey(0), SHAPE, jnp.float32)
    n = x.size * REPEAT
    base = None
    for name, op in OPS.items():
        dt = time_fn(make_fn(op), x)
        per = dt / n * 1e12  # ps per element-op
        if name == "mul":
            base = per
        print(f"{name:>10}: {dt*1e6:8.1f} us/call  {per:6.2f} ps/elem  "
              f"{per/base:5.2f}x mul")


if __name__ == "__main__":
    main()
