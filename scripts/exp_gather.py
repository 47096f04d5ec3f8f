"""On-chip micro-experiment: formulations of the segment-reduce row
permutation (the step's #3 op — fusion.2, ~3.6 ms at 786k entries).

Each variant permutes a (E, 16) f32 array by a random permutation `inv`
and feeds a cheap consumer (sum) so XLA cannot elide it.  Times are
amortized over R dependent iterations (salted to defeat CSE).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

E = 786432
C = 16
R = 20


def timeit(name, fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:34s} {dt:7.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(E, C)).astype(np.float32))
    rows_t = jnp.asarray(np.ascontiguousarray(rows.T))
    inv = jnp.asarray(rng.permutation(E).astype(np.int32))
    rows8 = rows[:, :8]

    @jax.jit
    def v_rowgather(rows, inv):
        x = rows
        for i in range(R):
            x = x[inv] + (i * 1e-12)
        return x.sum()

    @jax.jit
    def v_lanegather(rows_t, inv):
        x = rows_t
        for i in range(R):
            x = jnp.take(x, inv, axis=1) + (i * 1e-12)
        return x.sum()

    @jax.jit
    def v_rowgather_bf16(rows, inv):
        x = rows.astype(jnp.bfloat16)
        for i in range(R):
            x = x[inv] + jnp.bfloat16(i * 1e-12)
        return x.sum()

    @jax.jit
    def v_rowgather8(rows8, inv):
        x = rows8
        for i in range(R):
            x = x[inv] + (i * 1e-12)
        return x.sum()

    @jax.jit
    def v_rowgather_flat128(rows, inv):
        # gather 8x fewer, 8x wider rows: (E/8, 128) where row j packs
        # entries 8j..8j+7 — only correct if the permutation respects
        # 8-groups (it does NOT in real use; this measures the index-count
        # hypothesis, not a usable layout)
        x = rows.reshape(E // 8, 128)
        idx = inv[::8] // 8
        for i in range(R):
            x = x[idx] + (i * 1e-12)
            idx = jnp.clip(idx, 0, E // 8 - 1)
        return x.sum()

    @jax.jit
    def v_sort_payload(rows, inv):
        # carry the 16 payload columns through one lax.sort on the keys
        x = rows
        s = inv
        for i in range(R):
            cols = tuple(x[:, j] for j in range(C))
            out = jax.lax.sort((s,) + cols, num_keys=1)
            x = jnp.stack(out[1:], axis=1) + (i * 1e-12)
        return x.sum()

    @jax.jit
    def v_scatter(rows, inv):
        x = rows
        for i in range(R):
            x = jnp.zeros_like(x).at[inv].set(x) + (i * 1e-12)
        return x.sum()

    timeit("rowgather (E,16) f32", v_rowgather, rows, inv)
    timeit("lanegather (16,E) f32", v_lanegather, rows_t, inv)
    timeit("rowgather (E,16) bf16", v_rowgather_bf16, rows, inv)
    timeit("rowgather (E,8) f32", v_rowgather8, rows8, inv)
    timeit("rowgather (E/8,128) f32", v_rowgather_flat128, rows, inv)
    timeit("scatter .at[inv].set", v_scatter, rows, inv)
    timeit("lax.sort key+16 payload", v_sort_payload, rows, inv)


if __name__ == "__main__":
    main()
