"""Probe: does Mosaic legalize lax.cond with VECTOR results inside a
while_loop body? (Needed for the extraction-skip sweep variant: most
near-to-far schedule columns improve no ray's best hit, so the argmin +
one-hot extraction can be gated behind a real branch.)

Run on TPU. Prints OK + a timing comparison of always-extract vs
cond-gated extract on a synthetic column stream.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, n_iter, gate):
    r = x_ref.shape[1]

    def body(carry):
        i, best, aux = carry
        t = x_ref[0] + jnp.float32(i)          # [R, L] fake column
        tj = jnp.min(t, axis=1, keepdims=True)
        any_better = jnp.min(tj) < jnp.min(best) + 100.0

        def extract(args):
            best, aux = args
            j = jnp.argmin(t, axis=1, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            sel = (lane == j).astype(jnp.float32)
            uj = jnp.sum(t * sel, axis=1, keepdims=True)
            better = tj < best
            return (jnp.where(better, tj, best),
                    jnp.where(better, uj, aux))

        if gate:
            best, aux = jax.lax.cond(any_better, extract,
                                     lambda a: a, (best, aux))
        else:
            best, aux = extract((best, aux))
        return i + 1, best, aux

    _, best, aux = jax.lax.while_loop(
        lambda c: c[0] < n_iter, body,
        (jnp.int32(0), jnp.full((r, 1), 1e30, jnp.float32),
         jnp.zeros((r, 1), jnp.float32)))
    o_ref[0] = best + aux


def run(gate, n_iter=256, r=64, lanes=512):
    kern = functools.partial(_kernel, n_iter=n_iter, gate=gate)
    x = jnp.arange(r * lanes, dtype=jnp.float32).reshape(1, r, lanes) * 1e-3
    out = pl.pallas_call(
        kern,
        grid=(64,),
        in_specs=[pl.BlockSpec((1, r, lanes), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, r, 1), jnp.float32),
    )(x)
    return out


def main():
    for gate in (False, True):
        try:
            f = jax.jit(lambda x=None, g=gate: run(g))
            out = f()
            s = float(jnp.sum(out))
            t0 = time.perf_counter()
            for _ in range(5):
                s = float(jnp.sum(f()))
            dt = (time.perf_counter() - t0) / 5
            print(f"gate={gate}: OK sum={s:.1f}  {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"gate={gate}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
