"""On-chip microbench: segment-reduce row-permutation variants.

The round-3 trace shows the expansion-order permutation of the (E,16)
gradient rows costing 2.8 ms at E=410k — the rows arrive from the backward
kernel as (16, E) row-major, i.e. (E, 16) COLUMN-major after the transpose
view, and the XLA gather over axis 0 of a column-major array touches 16
strided elements per index.  Variants measured here:

  colmajor   gather rows of (E,16){0,1} (the shipped path)
  rowmajor   pay one explicit layout copy to (E,16){1,0}, then gather
  lane       gather along axis 1 of (16,E) (lane-dim gather)
  bf16       row-major gather at half width
  payload    lax.sort with the 16 columns as payloads (no gather at all)

Also times the boundary-diff variants (two gathers vs one gather + shift).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_RTT = None


def _fetch(out):
    """Force execution: block_until_ready does NOT wait on the axon
    tunnel backend (measured round 4) — only a host fetch does."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8]))


def timeit(fn, *args, iters=50):
    global _RTT
    if _RTT is None:
        x = jnp.arange(8, dtype=jnp.float32)
        f = jax.jit(lambda v: jnp.sum(v))
        _fetch(f(x))
        t0 = time.perf_counter()
        for _ in range(10):
            _fetch(f(x))
        _RTT = (time.perf_counter() - t0) / 10 * 1e3
        print(f"(tunnel fetch RTT {_RTT:.2f} ms)")
    _fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return ((time.perf_counter() - t0) * 1e3 - _RTT) / iters


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from webdgs_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    E = 410_496
    N = 100_000
    C = 16
    rng = np.random.default_rng(0)
    rows_np = rng.normal(size=(E, C)).astype(np.float32)
    perm_np = rng.permutation(E).astype(np.int32)
    # rows as the kernel produces them: (16, E) row-major
    rows16 = jnp.asarray(rows_np.T)  # (16, E)
    inv = jnp.asarray(perm_np)
    counts_np = rng.multinomial(E, np.ones(N) / N).astype(np.int32)
    counts = jnp.asarray(counts_np)

    @jax.jit
    def colmajor(r16, idx):
        rows = r16.T  # (E, 16) col-major view
        return rows[idx]

    @jax.jit
    def rowmajor(r16, idx):
        rows = jax.lax.transpose(r16, (1, 0))  # explicit copy to row-major
        return rows[idx]

    @jax.jit
    def lane(r16, idx):
        return jnp.take(r16, idx, axis=1)

    @jax.jit
    def bf16_rm(r16, idx):
        rows = jax.lax.transpose(r16.astype(jnp.bfloat16), (1, 0))
        return rows[idx]

    @jax.jit
    def payload(r16, idx):
        cols = tuple(r16[i] for i in range(C))
        out = jax.lax.sort((idx,) + cols, num_keys=1)
        return out[1:]

    for name, fn in [("colmajor", colmajor), ("rowmajor", rowmajor),
                     ("lane", lane), ("bf16_rm", bf16_rm),
                     ("payload", payload)]:
        ms = timeit(fn, rows16, inv)
        print(f"permute {name:9s} {ms:7.3f} ms")

    # boundary diffs: two gathers vs one gather + shift
    d_exp = jnp.asarray(rows_np)

    @jax.jit
    def two_gather(d, cnts):
        cum = jnp.cumsum(d, axis=0)
        cum_counts = jnp.cumsum(cnts)
        last = jnp.clip(cum_counts - 1, 0, E - 1)
        first = cum_counts - cnts
        return cum[last] - jnp.where((first > 0)[:, None],
                                     cum[jnp.maximum(first - 1, 0)], 0.0)

    @jax.jit
    def one_gather(d, cnts):
        cum = jnp.cumsum(d, axis=0)
        cum_counts = jnp.cumsum(cnts)
        last = jnp.clip(cum_counts - 1, 0, E - 1)
        cum_l = cum[last]  # (N, C)
        prev = jnp.concatenate([jnp.zeros((1, C), cum_l.dtype),
                                cum_l[:-1]], axis=0)
        return cum_l - prev

    a = two_gather(d_exp, counts)
    b = one_gather(d_exp, counts)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"boundary two_gather {timeit(two_gather, d_exp, counts):7.3f} ms")
    print(f"boundary one_gather {timeit(one_gather, d_exp, counts):7.3f} ms"
          f"   max|diff| {err:.2e}")

    # inverse-permutation sort cost for reference
    @jax.jit
    def inv_sort(src):
        slot = jnp.arange(E, dtype=jnp.int32)
        _, out = jax.lax.sort((src, slot), num_keys=1)
        return out

    print(f"inv sort            {timeit(inv_sort, inv):7.3f} ms")
