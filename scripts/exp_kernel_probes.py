"""On-chip probes for the round-4 kernel work.

1. transpose: can Mosaic transpose small (P,1)/(4,P) blocks in-kernel on
   hardware, and at what cost (lax.transpose vs identity-matmul)?
2. bf16 VPU rate: is packed bf16 elementwise arithmetic ~2x f32 on a v5e
   VPU, or promoted to f32 (no win)?  Decides the kernels' compute dtype.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=50):
    import jax
    import jax.numpy as jnp
    leaf = lambda o: jax.tree.leaves(o)[0]
    _ = float(jnp.sum(leaf(fn(*args)).ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(leaf(out).ravel()[:8]))
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from webdgs_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    P, K = 512, 128
    REP = 500  # kernel-internal repetitions to swamp dispatch

    # --- probe 1: in-kernel transposes -------------------------------
    def t_kernel(x_ref, o_ref):
        def body(i, carry):
            a = x_ref[...]  # (P, 4)
            at = jax.lax.transpose(a, (1, 0))  # (4, P)
            v = jnp.sum(at, axis=0, keepdims=True)  # (1, P)
            vt = jax.lax.transpose(v, (1, 0))  # (P, 1)
            return carry + jnp.sum(vt)
        acc = jax.lax.fori_loop(0, REP, body, 0.0)
        o_ref[0, 0] = acc

    x = jnp.asarray(np.random.default_rng(0).normal(size=(P, 4)),
                    dtype=jnp.float32)
    try:
        f = jax.jit(lambda x: pl.pallas_call(
            t_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x))
        ms = timeit(f, x)
        print(f"transpose probe: {ms:.3f} ms / {REP} reps "
              f"-> {ms/REP*1e3:.2f} us per (P,4)->(4,P)+(1,P)->(P,1) pair")
    except Exception as e:
        print(f"transpose probe FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- probe 2: VPU elementwise rate f32 vs bf16 --------------------
    def chain_kernel(x_ref, y_ref, o_ref, *, n_ops: int):
        def body(i, acc):
            a = x_ref[...]
            b = y_ref[...]
            for _ in range(n_ops // 2):
                a = a * b + acc
            return a
        o_ref[...] = jax.lax.fori_loop(
            0, REP, body, jnp.zeros_like(x_ref))

    for dt, name in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
        xx = jnp.ones((P, K), dt)
        yy = jnp.full((P, K), 1.0001, dt)
        try:
            f = jax.jit(lambda a, b: pl.pallas_call(
                functools.partial(chain_kernel, n_ops=32),
                out_shape=jax.ShapeDtypeStruct((P, K), dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b))
            ms = timeit(f, xx, yy)
            ops = REP * 16 * 2 * P * K  # fma = 2 ops
            print(f"vpu chain {name}: {ms:.3f} ms "
                  f"-> {ops/ms/1e9:.2f} Gop/ms ({ops/(ms*1e-3)/1e12:.2f} Tops)")
        except Exception as e:
            print(f"vpu chain {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")

    # --- probe 3: transcendental rate f32 vs bf16 ---------------------
    def exp_kernel(x_ref, o_ref):
        def body(i, a):
            return jnp.exp(a * 1e-6)
        o_ref[...] = jax.lax.fori_loop(0, REP, body, x_ref[...])

    for dt, name in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
        xx = jnp.ones((P, K), dt)
        try:
            f = jax.jit(lambda a: pl.pallas_call(
                exp_kernel,
                out_shape=jax.ShapeDtypeStruct((P, K), dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a))
            ms = timeit(f, xx)
            n = REP * P * K
            print(f"exp chain {name}: {ms:.3f} ms -> "
                  f"{n/(ms*1e-3)/1e9:.2f} Gexp/s")
        except Exception as e:
            print(f"exp chain {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
