"""Trustworthy device-time measurement for jitted stages.

Methodology pitfalls this fixes (learned the hard way on the tunneled TPU):
  * a synchronous scalar readback costs ~25 ms through the tunnel — timing
    must use block_until_ready on a device value, never float();
  * chained anti-CSE salting must touch EVERY input leaf (including integer
    ones, via a data-dependent zero) or XLA hoists the unsalted subgraph out
    of the chain and the stage measures only a fraction of itself.
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
    """A tiny scalar data-dependent on (a few elements of) every leaf."""
    acc = jnp.float32(0)
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype"):
            acc = acc + jnp.sum(x.ravel()[:2].astype(jnp.float32))
    return acc


def measure(stage, args, r=32, reps=2):
    """Median per-iteration ms of ``stage(*salted_args)`` chained r times
    inside one jit.  ``stage`` takes the (salted) args tuple."""

    @jax.jit
    def run(args):
        acc = jnp.float32(0)
        for _ in range(r):
            out = stage(*_salt_tree(args, acc * 1e-30))
            acc = acc + _probe(out)
        return acc

    out = run(args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(args))
        times.append((time.perf_counter() - t0) / r * 1e3)
    return min(times)
