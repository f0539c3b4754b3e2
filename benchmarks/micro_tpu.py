"""Microbenchmarks for the primitives the traversal loop is built from.

Answers, on real hardware: how expensive are (a) random row gathers,
(b) while_loop iterations, (c) elementwise VPU work, (d) one-hot matmul
"gathers" - the design-deciding numbers for the traversal kernel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    M, F, N = 1 << 19, 8, 1 << 16
    table = jax.random.normal(key, (M, F), jnp.float32)
    idx_rand = jax.random.randint(key, (N,), 0, M, jnp.int32)
    idx_sort = jnp.sort(idx_rand)

    @jax.jit
    def gather_rows(t, i):
        return t[i]

    dt = timed(gather_rows, table, idx_rand)
    print(f"gather random  [{N}] rows of {F} f32 from [{M}]: "
          f"{dt*1e3:.3f} ms  ({N*F*4/dt/1e9:.2f} GB/s)")
    dt = timed(gather_rows, table, idx_sort)
    print(f"gather sorted  [{N}] rows of {F} f32 from [{M}]: "
          f"{dt*1e3:.3f} ms  ({N*F*4/dt/1e9:.2f} GB/s)")

    # small-table gather (VMEM-resident size)
    Msm = 4096
    table_sm = jax.random.normal(key, (Msm, F), jnp.float32)
    idx_sm = jax.random.randint(key, (N,), 0, Msm, jnp.int32)
    dt = timed(gather_rows, table_sm, idx_sm)
    print(f"gather random  [{N}] rows of {F} f32 from [{Msm}]: "
          f"{dt*1e3:.3f} ms  ({N*F*4/dt/1e9:.2f} GB/s)")

    # scalar gather (1 f32 per index)
    vec = jax.random.normal(key, (M,), jnp.float32)
    dt = timed(gather_rows, vec, idx_rand)
    print(f"gather random  [{N}] f32 scalars from [{M}]:      "
          f"{dt*1e3:.3f} ms  ({N*4/dt/1e9:.2f} GB/s)")

    # while_loop iteration overhead: K trivial iterations on [N] f32
    K = 1000

    @jax.jit
    def loop(x):
        def body(s):
            i, x = s
            return i + 1, x * 1.0000001 + 0.5
        return jax.lax.while_loop(lambda s: s[0] < K, body, (0, x))[1]

    x = jax.random.normal(key, (N,), jnp.float32)
    dt = timed(loop, x)
    print(f"while_loop {K} trivial iters on [{N}] f32: "
          f"{dt*1e3:.3f} ms  ({dt/K*1e6:.2f} us/iter)")

    # while_loop with one gather per iteration (the traversal shape)
    @jax.jit
    def loop_gather(x, t):
        def body(s):
            i, acc = s
            ii = (acc.astype(jnp.int32) & (M - 1))
            row = t[ii]
            return i + 1, acc + row[:, 0]
        return jax.lax.while_loop(lambda s: s[0] < 100, body, (0, x))[1]

    dt = timed(loop_gather, x, table)
    print(f"while_loop 100 iters w/ [{N}]-row gather: "
          f"{dt*1e3:.3f} ms  ({dt/100*1e6:.2f} us/iter)")

    # elementwise throughput
    big = jax.random.normal(key, (1 << 22,), jnp.float32)

    @jax.jit
    def ew(x):
        for _ in range(16):
            x = x * 1.0001 + 0.1
        return x

    dt = timed(ew, big)
    print(f"elementwise 32 flops on [{1<<22}] f32: "
          f"{dt*1e3:.3f} ms  ({(1<<22)*32/dt/1e12:.3f} TFLOP/s)")

    # one-hot matmul gather: [N_s, C] @ [C, F2]
    C, F2, Ns = 1024, 128, 8192
    tbl = jax.random.normal(key, (C, F2), jnp.float32)
    idc = jax.random.randint(key, (Ns,), 0, C, jnp.int32)

    @jax.jit
    def onehot_gather(i, t):
        oh = jax.nn.one_hot(i, C, dtype=jnp.bfloat16)
        return jnp.dot(oh, t.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    dt = timed(onehot_gather, idc, tbl)
    print(f"one-hot matmul gather [{Ns}]x[{C},{F2}]: "
          f"{dt*1e3:.3f} ms  ({Ns*F2*4/dt/1e9:.2f} GB/s eq)")

    # dense triangle test throughput: [N_r, K] ray-tri-ish arithmetic
    Nr, Kt = 8192, 256
    a = jax.random.normal(key, (Nr, 3), jnp.float32)
    b = jax.random.normal(key, (Kt, 9), jnp.float32)

    @jax.jit
    def dense_tri(a, b):
        o = a[:, None, :]
        v0, e1, e2 = b[None, :, 0:3], b[None, :, 3:6], b[None, :, 6:9]
        pv = jnp.cross(o * 0 + 1.0, e2)
        det = jnp.sum(e1 * pv, -1)
        tv = o - v0
        u = jnp.sum(tv * pv, -1) / det
        qv = jnp.cross(tv, e1)
        t = jnp.sum(e2 * qv, -1) / det
        return jnp.min(jnp.where((u > 0) & (t > 0), t, jnp.inf), axis=1)

    dt = timed(dense_tri, a, b)
    ntests = Nr * Kt
    print(f"dense ray-tri [{Nr}x{Kt}]: {dt*1e3:.3f} ms  "
          f"({ntests/dt/1e9:.2f} Gtests/s)")


if __name__ == "__main__":
    main()
