"""Is bf16 VPU arithmetic actually faster than f32 on this chip?

The bf16-cull idea (PERF.md section 4) only works if the VPU executes
bf16 elementwise math at a higher rate than f32 (the Mosaic native tile
is (16, 128) vs (8, 128), which suggests packed registers). This
microbench times a fori_loop-amplified chain of elementwise sub/mul/
min/max (the slab-test op mix) in both dtypes, in XLA and in a Pallas
kernel (Mosaic's bf16 lowering may differ from XLA's). Per-call compute
is sized to ~100x the ~28 ms tunnel sync floor.

Usage: python benchmarks/bf16_probe.py   (TPU; serialize chip jobs)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 8      # chain units per fori iteration (6 vector ops each)
ITERS = 512     # fori iterations


def chain_unit(x, y):
    for _ in range(UNROLL):
        t1 = (x - y) * x
        t2 = (y - x) * y
        x = jnp.minimum(t1, t2) * 0.25 + 0.5
        y = jnp.maximum(t1, t2) * 0.25 + 0.51
    return x, y


def chain(x, y):
    x, y = jax.lax.fori_loop(0, ITERS, lambda i, c: chain_unit(*c), (x, y))
    return x + y


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def pallas_chain(dtype, n_rows):
    def kern(x_ref, y_ref, o_ref):
        o_ref[...] = chain(x_ref[...], y_ref[...])

    blk = 256

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kern,
            grid=(n_rows // blk,),
            in_specs=[pl.BlockSpec((blk, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((blk, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, 1024), dtype),
        )(x, y)

    return run


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    print("devices:", jax.devices())

    n_rows = 2048            # [2048, 1024] = 2.1M elems
    gops = n_rows * 1024 * ITERS * UNROLL * 8 / 1e9  # ~8 vec ops per unit

    key = jax.random.PRNGKey(0)
    xf = jax.random.uniform(key, (n_rows, 1024), jnp.float32) * 0.5 + 0.25
    yf = xf * 1.1

    results = {}
    for mode in ("xla", "pallas"):
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x = xf.astype(dt)
            y = yf.astype(dt)
            f = jax.jit(chain) if mode == "xla" else pallas_chain(dt, n_rows)
            dtms = timed(f, x, y) * 1e3
            results[f"{mode}_{name}"] = dtms
            print(f"{mode:6s} {name}: {dtms:8.2f} ms  "
                  f"({gops / dtms * 1e3:.0f} Gops/s)")

    print(f"\nxla    bf16 speedup: "
          f"x{results['xla_f32'] / results['xla_bf16']:.2f}")
    print(f"pallas bf16 speedup: "
          f"x{results['pallas_f32'] / results['pallas_bf16']:.2f}")


if __name__ == "__main__":
    main()
