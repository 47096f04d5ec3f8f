"""Per-Gaussian gradient accumulation as a Pallas block-matmul kernel.

Replaces the XLA tail of ``segment_reduce_entries`` (ops/rasterize.py): the
f16->f32 convert, the (E, 16) cumsum, and the boundary-difference gathers.
The round-5 timeline trace (onchip_r5/trace_timeline.txt) put that chain at
~2.3 ms of the 16.7 ms step — every (E, 16) materialization on TPU is
lane-padded 16 -> 128 (8x phantom HBM traffic), and the cumsum pays it
again per pass.

Formulation: entries in expansion order are grouped by Gaussian, and
Gaussian ids are MONOTONE along the entry axis.  Split the Gaussians into
fixed blocks of B: block b owns ids [bB, bB+B) and its entries are exactly
the contiguous range [cum_counts[bB-1], cum_counts[bB+B-1]).  For each
entry chunk of that range, a one-hot matmul

    acc (16, B) += rows (16, K) @ onehot(ids - bB) (K, B)

accumulates per-Gaussian sums on the MXU.  Monotonicity makes masking
free: lanes belonging to a neighboring block have ids outside [bB, bB+B)
and hit an all-zero one-hot column; invalid tail slots carry zero rows
(zeroed by entry_valid before the expansion-order gather).  Output blocks
never overlap, so there is no read-modify-write anywhere.

The kernel consumes the gathered rows in (16, E) channel-major layout —
compact on TPU (E on the lane axis) — and writes (16, N_pad) f32, whose
transpose back to (N, 16) is a free bitcast for the projection VJP.

Precision: rows arrive f32 (the default tier) or f16 (the opt-in
speed tier, grad_rows_f16); each chunk hi/lo-splits into bf16, so the
two MXU passes carry 16+ mantissa bits — exact for f16 inputs and
~2^-16-relative for f32, strictly more accurate than the
prefix-sum-difference this replaces (no long-prefix cancellation).
Accumulation is f32.  segsum_kernel=False restores the XLA path.

The reference accumulates the same sums with 1e-6 fixed-point atomics
(src/shaders/common.wgsl:110-121); per-Gaussian sums here are exact f32
reductions in a deterministic order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webdgs_tpu.config import use_interpret_mode

BLOCK_GAUSS = 512  # Gaussians per output block (B)
CHUNK = 512  # entry lanes per DMA chunk (K)
BLOCKS_PER_STEP = 4  # blocks per sequential grid step (amortizes overhead)


def _segsum_kernel(starts_ref, rows_ref, ids_ref, out_ref, scr, iscr, sem,
                   isem, *, e_len: int, n_rows: int, pre_split: bool):
    b = BLOCK_GAUSS
    k = CHUNK
    pid = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, k), 0)

    def block_body(i, _):
        gb = pid * BLOCKS_PER_STEP + i
        e0 = starts_ref[gb]
        e1 = starts_ref[gb + 1]
        c0 = (e0 // k) * k
        nch = jnp.where(e1 > e0, (e1 - c0 + k - 1) // k, 0)

        def chunk_start(c):
            # clamp so the window never reads past the entry buffer; the
            # chunk mask below excludes the re-read overhang lanes
            return jnp.minimum(c0 + c * k, e_len - k)

        def chunk_dma(c, slot):
            cs = pl.multiple_of(chunk_start(c), 128)
            return (pltpu.make_async_copy(
                        rows_ref.at[:, pl.ds(cs, k)], scr.at[slot],
                        sem.at[slot]),
                    pltpu.make_async_copy(
                        ids_ref.at[:, pl.ds(cs, k)], iscr.at[slot],
                        isem.at[slot]))

        @pl.when(nch > 0)
        def _():
            for d in chunk_dma(0, 0):
                d.start()

        def body(carry):
            c, acc = carry
            slot = c % 2

            @pl.when(c + 1 < nch)
            def _():
                for d in chunk_dma(c + 1, (c + 1) % 2):
                    d.start()

            for d in chunk_dma(c, slot):
                d.wait()

            # a clamped window's leading lanes repeat entries a previous
            # chunk already summed — mask them out (ids alone cannot: the
            # repeats belong to THIS block's range)
            fresh = (chunk_start(c) + lane) >= (c0 + c * k)  # (1, k)
            local = jnp.where(fresh, iscr[slot] - gb * b, -1)  # (1, k)
            # one-hot in bf16 (0/1 exact); ids outside [0, b) hit no column
            oh = (col_iota == local).astype(jnp.bfloat16)  # (b, k)
            if pre_split:
                # rows arrive as (2C, k) bf16 hi/lo halves, gathered at
                # half width each on the XLA side (the f32-width
                # permutation gather measured 2.8 ms/step; two bf16
                # gathers halve it at identical precision — this split
                # is exactly what the f32 path computes in-kernel)
                both = scr[slot]
            else:
                rows = scr[slot]  # (16, k) f32
                r_hi = rows.astype(jnp.bfloat16)
                r_lo = (rows - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                both = jnp.concatenate([r_hi, r_lo], axis=0)
            # one (2C, k) pass for hi+lo halves, split on the output rows
            s = jax.lax.dot_general(
                both, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (2C, b)
            return c + 1, acc + s[:n_rows] + s[n_rows:]

        _, acc = jax.lax.while_loop(
            lambda carry: carry[0] < nch, body,
            (jnp.int32(0), jnp.zeros((n_rows, b), jnp.float32)))
        out_ref[:, pl.ds(i * b, b)] = acc
        return 0

    jax.lax.fori_loop(0, BLOCKS_PER_STEP, block_body, 0)


def segment_sum_rows(rows_cm: jax.Array, ids: jax.Array,
                     gauss_counts: jax.Array) -> jax.Array:
    """Per-Gaussian sums of expansion-ordered entry rows.

    rows_cm: (C, E) channel-major entry rows in expansion order, invalid
    slots zero.  f16 input is converted to f32 HERE, in the compact
    channel-major layout (~26 MB at the bench shape, one cheap pass) —
    the Mosaic TPU backend has no f16 vector type, so the kernel refs
    must be f32 (found on real hardware; interpret mode AND the
    jax.export lowering gate both accept f16, so only an actual Mosaic
    compile catches it).  ids: (E,) i32 monotone Gaussian id per entry
    slot (padding slots may repeat the last id — their rows are zero).
    gauss_counts: (N,) i32 entries per Gaussian.

    bf16 input means PRE-SPLIT rows: (2C, E) hi/lo bf16 halves (see the
    kernel's pre_split branch) — the sums are then bit-identical to the
    f32 input path.

    Returns (N, C) f32 sums.
    """
    pre_split = rows_cm.dtype == jnp.bfloat16
    if not pre_split:
        rows_cm = rows_cm.astype(jnp.float32)
    in_rows, e_len = rows_cm.shape
    n_rows = in_rows // 2 if pre_split else in_rows
    n = gauss_counts.shape[0]
    b = BLOCK_GAUSS
    step_g = b * BLOCKS_PER_STEP
    n_pad = -(-n // step_g) * step_g
    nb = n_pad // b
    if e_len < CHUNK:  # tiny scenes: the clamp trick needs one full chunk
        pad = CHUNK - e_len
        rows_cm = jnp.pad(rows_cm, ((0, 0), (0, pad)))
        ids = jnp.pad(ids, (0, pad), constant_values=n_pad + 1)
        e_len = CHUNK
    cum = jnp.cumsum(gauss_counts.astype(jnp.int32))
    # block-edge entry offsets: starts[j] = entries before gaussian j*B
    edges = jnp.minimum(jnp.arange(1, nb + 1) * b, n) - 1
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              cum[edges].astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // BLOCKS_PER_STEP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((n_rows, step_g), lambda i, offs: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, in_rows, CHUNK), rows_cm.dtype),
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_segsum_kernel, e_len=e_len, n_rows=n_rows,
                               pre_split=pre_split)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_pad), jnp.float32),
        interpret=use_interpret_mode(),
    )(starts, rows_cm, ids.reshape(1, -1))
    return out[:, :n].T
