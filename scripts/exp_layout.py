"""On-chip micro-experiment: rasterizer kernel IO layout.

The kernels' (T, P, 8) buffers have an 8-wide minor dim that XLA
tile-pads to 128 lanes (16x physical bytes: f32[950,512,8]{2,1,0:T(8,128)}
is ~250 MB).  Channel-major (T, 8, P) is dense but needs per-tile
(P,1)<->(1,P) relayouts inside the kernels.  This measures:

  1. a write-side prototype: fake per-tile math, then store to
     (g,p,8) vs (g,8,p) blocks — isolates store+DMA+relayout cost;
  2. a read-side prototype: load (g,p,8) vs (g,8,p) blocks and reduce
     — isolates the bwd kernel's operand DMA cost;
  3. the XLA-side transposes: _rowplanar_tiles from (T,P,8) vs (T,8,P).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T, P, C = 950, 512, 8
G = int(os.environ.get("EXP_G", "1"))  # tiles per grid step (must divide T)
R = 30


def timeit(name, fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:38s} {dt:7.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fake_math(x_ref, i):
        # a few (P, K)-class ops so stores aren't the whole kernel
        v = x_ref[0] * 1.0001 + 0.1
        v = v * v
        acc = v[:, 0:4]          # (P, 4)
        tfin = jnp.sum(v[:, 0:1], axis=1, keepdims=True)  # (P, 1)
        return acc, tfin

    def k_pm(x_ref, o_ref):  # pixel-major stores: (g, p, 8)
        def body(i, _):
            acc, tfin = fake_math(x_ref, i)
            o_ref[i, :, 0:4] = acc
            o_ref[i, :, 4:5] = tfin
            o_ref[i, :, 5:8] = jnp.zeros((P, 3), jnp.float32)
            return 0
        jax.lax.fori_loop(0, G, body, 0)

    def k_cm(x_ref, o_ref):  # channel-major stores: (g, 8, p)
        def body(i, _):
            acc, tfin = fake_math(x_ref, i)
            o_ref[i, 0:4, :] = acc.T
            o_ref[i, 4:5, :] = tfin.reshape(1, P)
            o_ref[i, 5:8, :] = jnp.zeros((3, P), jnp.float32)
            return 0
        jax.lax.fori_loop(0, G, body, 0)

    def k_cm_dot(x_ref, o_ref):  # channel-major via MXU transpose
        ident = jnp.eye(P, dtype=jnp.bfloat16)

        def body(i, _):
            acc, tfin = fake_math(x_ref, i)
            both = jnp.concatenate([acc, tfin], axis=1)  # (P, 5)
            bt = jax.lax.dot_general(
                both.astype(jnp.bfloat16), ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (5, P)
            o_ref[i, 0:5, :] = bt
            o_ref[i, 5:8, :] = jnp.zeros((3, P), jnp.float32)
            return 0
        jax.lax.fori_loop(0, G, body, 0)

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, P, 128)).astype(np.float32))

    def run_write(kern, oshape, oblock):
        f = pl.pallas_call(
            kern, grid=(T // G,),
            in_specs=[pl.BlockSpec((1, P, 128), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec(oblock, lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32))

        @jax.jit
        def loop(x):
            s = 0.0
            for i in range(R):
                s = s + f(x + i * 1e-9).sum()
            return s
        return loop

    timeit("write (g,p,8) pixel-major", run_write(k_pm, (T, P, C), (G, P, C)), x)
    timeit("write (g,8,p) channel-major .T", run_write(k_cm, (T, C, P), (G, C, P)), x)
    timeit("write (g,8,p) channel-major MXU", run_write(k_cm_dot, (T, C, P), (G, C, P)), x)

    # ---- read-side: DMA cost of (g,p,8) vs (g,8,p) operand blocks ----
    def kr_pm(a_ref, b_ref, o_ref):
        s = jnp.zeros((1, 128), jnp.float32)
        def body(i, s):
            return s + jnp.sum(a_ref[i], axis=0).reshape(1, C)[:, 0:1] \
                     + jnp.sum(b_ref[i], axis=0).reshape(1, C)[:, 0:1]
        s = jax.lax.fori_loop(0, G, body, s, unroll=False)
        o_ref[0:1, 0:1] = s[:, 0:1]

    def kr_cm(a_ref, b_ref, o_ref):
        s = jnp.zeros((1, 1), jnp.float32)
        def body(i, s):
            return s + jnp.sum(a_ref[i]).reshape(1, 1) \
                     + jnp.sum(b_ref[i]).reshape(1, 1)
        s = jax.lax.fori_loop(0, G, body, s, unroll=False)
        o_ref[0:1, 0:1] = s

    def run_read(kern, ashape, ablock):
        f = pl.pallas_call(
            kern, grid=(T // G,),
            in_specs=[pl.BlockSpec(ablock, lambda i: (i, 0, 0)),
                      pl.BlockSpec(ablock, lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))

        @jax.jit
        def loop(a, b):
            s = 0.0
            for i in range(R):
                s = s + f(a + i * 1e-9, b).sum()
            return s
        return loop

    a_pm = jnp.zeros((T, P, C), jnp.float32) + 1.0
    b_pm = jnp.zeros((T, P, C), jnp.float32) + 2.0
    a_cm = jnp.zeros((T, C, P), jnp.float32) + 1.0
    b_cm = jnp.zeros((T, C, P), jnp.float32) + 2.0
    timeit("read 2x(g,p,8) pixel-major", run_read(kr_pm, (T, P, C), (G, P, C)),
           a_pm, b_pm)
    timeit("read 2x(g,8,p) channel-major", run_read(kr_cm, (T, C, P), (G, C, P)),
           a_cm, b_cm)

    # ---- XLA-side rowplanar transposes ----
    ntx, th, tw = 25, 16, 32
    rows = T // ntx

    @jax.jit
    def rowplanar_pm(o):
        s = 0.0
        for i in range(R):
            t5 = (o + i * 1e-9).reshape(rows, ntx, th, tw, C)
            s = s + t5.transpose(0, 4, 2, 1, 3).reshape(rows, C, th,
                                                        ntx * tw).sum()
        return s

    @jax.jit
    def rowplanar_cm(o):
        s = 0.0
        for i in range(R):
            t5 = (o + i * 1e-9).reshape(rows, ntx, C, th, tw)
            s = s + t5.transpose(0, 2, 3, 1, 4).reshape(rows, C, th,
                                                        ntx * tw).sum()
        return s

    timeit("rowplanar from (T,P,8)", rowplanar_pm, a_pm)
    timeit("rowplanar from (T,8,P)", rowplanar_cm, a_cm)


if __name__ == "__main__":
    main()
