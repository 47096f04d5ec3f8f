"""Trustworthy device-time measurement for jitted stages.

Methodology pitfalls this fixes (learned the hard way on the tunneled TPU):
  * chained anti-CSE salting must touch EVERY input leaf (including integer
    ones, via a data-dependent zero) or XLA hoists the unsalted subgraph out
    of the chain and the stage measures only a fraction of itself;
  * ``block_until_ready`` through the tunnel NO LONGER waits for execution
    (measured 2026-08-19: an 8192^3 matmul "completed" in 37 us) — the only
    hard sync is a value readback (``float()``), which itself costs ~25 ms
    of tunnel latency.  Timing therefore runs the salted chain at TWO chain
    lengths and reports the slope (t_long - t_short)/(r_long - r_short):
    the readback and dispatch constants cancel exactly.
"""

import time

import jax
import jax.numpy as jnp


def _salt_tree(tree, salt):
    """Add a data-dependent zero to every array leaf (dtype-preserving)."""
    def add(x):
        if not hasattr(x, "dtype"):
            return x
        if x.dtype == jnp.bool_:
            return x ^ (salt > jnp.float32(1e30))
        return x + (salt * 0).astype(x.dtype)
    return jax.tree.map(add, tree)


def _probe(tree):
    """A scalar data-dependent on EVERY element of every leaf, through a
    nonlinearity.  A few-element probe is not enough: XLA's algebraic
    simplifier sinks slices through linear ops (slice(dot) -> dot(slice),
    slice(gather) -> gather(slice)) and DCEs the rest of the stage — an
    8192^3 matmul "measured" 0.5 ms that way (2026-08-19).  ``abs`` blocks
    the linearity sinking at one cheap fused pass."""
    acc = jnp.float32(0)
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype"):
            acc = acc + jnp.sum(jnp.abs(x.astype(jnp.float32)))
    return acc


def measure(stage, args, r=32, reps=2):
    """Best per-iteration ms of ``stage(*salted_args)`` chained inside one
    jit, as the slope between an ``r``-long and an ``r//4``-long chain (the
    tunnel's readback/dispatch constants cancel; see module docstring).
    ``stage`` takes the (salted) args tuple."""

    def chain(n):
        @jax.jit
        def run(args):
            acc = jnp.float32(0)
            for _ in range(n):
                out = stage(*_salt_tree(args, acc * 1e-30))
                acc = acc + _probe(out)
            return acc
        return run

    r_short = max(r // 4, 1)
    long_run, short_run = chain(r), chain(r_short)

    def timed(run):
        t0 = time.perf_counter()
        float(run(args))  # value readback: the only hard sync on the tunnel
        return time.perf_counter() - t0

    timed(long_run)  # compile + warm
    timed(short_run)
    times = []
    for _ in range(reps):
        times.append((timed(long_run) - timed(short_run))
                     / (r - r_short) * 1e3)
    return min(times)
