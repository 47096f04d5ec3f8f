"""Ragged per-Gaussian expansion as a Pallas kernel: counts -> per-entry
ids + binning words, in compact channel-major layout.

Replaces three XLA stages of ``expand_entries`` (ops/binning.py) whose
round-5 timeline cost ~2.5 ms of the step at the bench shape:

  * ``_repeat_ids``'s 100k-index scatter + cummax (entry -> gaussian id);
  * the (E, 5) row-gather of per-Gaussian binning words — lane-padded
    16 -> 128 on TPU (8x phantom HBM bytes);
  * the padded RE-reads of that array by the key-build and slot fusions.

Formulation (the inverse of ops/segsum.py, same block skeleton): fixed
blocks of B Gaussians own the contiguous entry range
[cum[bB-1], cum[bB+B-1]).  For each entry chunk, the per-lane one-hot
membership comes straight from the count cumsum —

    onehot[j, k] = cum_prev[j] <= e_k < cum_incl[j]

— and the per-entry words are matmul-selected from the block's per-
Gaussian words on the MXU.  Integer exactness: the words are pre-split
into BYTE planes (0..255 is exact in bf16, so a single-pass bf16 matmul
select is exact), recombined with integer shifts in-kernel; the entry
ids ride the same matmul as two extra iota byte planes.

Output chunks land in compact (C, E) channel-major buffers via per-chunk
DMA.  A block's first chunk may be shared with the previous block's last
chunk; each block writes zeros on foreign lanes and ADDS into the shared
chunk (disjoint lane support makes the add a union) — the same
sequential-grid read-modify-write the backward rasterizer uses for its
shared boundary chunks (ops/rasterize.py:_bwd_kernel).  Slots past the
last covered chunk are never written (callers mask by their validity
predicate, exactly as they do for the sort's sentinel keys).

The reference's counterpart is the emit_main pass + its prefix-sum
offsets (src/shaders/tiled-forward.wgsl:298-354, src/prefix/
prefix_sum.wgsl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webdgs_tpu.config import use_interpret_mode

BLOCK_GAUSS = 512  # Gaussians per block (B)
CHUNK = 512  # entry lanes per chunk (K)
BLOCKS_PER_STEP = 4
NWORDS = 5  # per-Gaussian binning words selected per entry
# byte planes: 4 per word + 3 gaussian-id iota bytes (N up to 2^24)
NPLANES = 4 * NWORDS + 3
# output channels: words + ids, PADDED to 8 — Mosaic requires
# sublane-dimension memref slices aligned to the (8,128) tiling
# (found on real hardware: 'Slice shape along dimension 0 must
# be aligned to tiling (8), but is 6')
NOUT = 8


def _expand_kernel(starts_ref, packed_ref, out_ref, wscr, oscr, rscr, sem,
                   osem, rsem, *, e_len: int):
    b = BLOCK_GAUSS
    k = CHUNK
    pid = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def block_body(i, _):
        gb = pid * BLOCKS_PER_STEP + i
        e0 = starts_ref[gb]
        e1 = starts_ref[gb + 1]
        c0 = (e0 // k) * k

        # per-block data (tiny, synchronous): byte planes + cum window
        pdma = pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(gb * b, b)], wscr, sem)
        pdma.start()
        pdma.wait()
        planes = wscr[0:NPLANES, :].astype(jnp.bfloat16)  # (NPLANES, b)
        cum_incl = wscr[NPLANES:NPLANES + 1, :].astype(jnp.int32)  # (1, b)
        cum_prev = jnp.concatenate(
            [jnp.full((1, 1), e0, jnp.int32), cum_incl[:, :-1]], axis=1)
        cum_incl_c = jax.lax.transpose(cum_incl, (1, 0))  # (b, 1)
        cum_prev_c = jax.lax.transpose(cum_prev, (1, 0))
        nch = jnp.where(e1 > e0, (e1 - c0 + k - 1) // k, 0)

        def chunk_body(c, _):
            # genuinely 512-aligned (c0, c*k, e_len-k all are); the hint
            # is for Mosaic's divisibility prover on the DMA slices
            cs = pl.multiple_of(jnp.minimum(c0 + c * k, e_len - k), 128)
            e_pos = cs + lane  # (1, k) global entry positions
            # membership: cum windows, clipped to the block's own range so
            # clamped-window re-read lanes (always < e0) stay foreign
            inwin = ((e_pos >= cum_prev_c) & (e_pos < cum_incl_c)
                     & (e_pos >= e0))  # (b, k)
            oh = inwin.astype(jnp.bfloat16)

            sel = jax.lax.dot_general(
                planes, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (NPLANES, k), exact
            bi = sel.astype(jnp.int32)
            rows = []
            for wi in range(NWORDS):
                rows.append(bi[4 * wi + 0:4 * wi + 1, :]
                            | (bi[4 * wi + 1:4 * wi + 2, :] << 8)
                            | (bi[4 * wi + 2:4 * wi + 3, :] << 16)
                            | (bi[4 * wi + 3:4 * wi + 4, :] << 24))
            # id selected via the same matmul (lanes with no membership
            # get 0 — downstream masks by its own validity, as it already
            # does for sentinel keys)
            rows.append(bi[NPLANES - 3:NPLANES - 2, :]
                        | (bi[NPLANES - 2:NPLANES - 1, :] << 8)
                        | (bi[NPLANES - 1:NPLANES, :] << 16))
            rows.append(jnp.zeros((NOUT - NWORDS - 1, k), jnp.int32))
            chunk_out = jnp.concatenate(rows, axis=0)  # (NOUT, k)

            # cs can sit below c0 only via the end-of-buffer clamp; any
            # lane before e0 belongs to the previous block, so the union
            # add must run whenever such lanes are in the window
            shared = (c == 0) & (e0 > cs)

            @pl.when(shared)
            def _():
                rdma = pltpu.make_async_copy(
                    out_ref.at[:, pl.ds(cs, k)], rscr, rsem)
                rdma.start()
                rdma.wait()

            oscr[...] = jnp.where(shared, chunk_out + rscr[...], chunk_out)
            wdma = pltpu.make_async_copy(
                oscr, out_ref.at[:, pl.ds(cs, k)], osem)
            wdma.start()
            wdma.wait()
            return 0

        jax.lax.fori_loop(0, nch, chunk_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, BLOCKS_PER_STEP, block_body, 0)


def expand_fields(word_stack: jax.Array, gauss_counts: jax.Array,
                  e_cap: int):
    """Expand per-Gaussian words into per-entry words + gaussian ids.

    word_stack: (NWORDS, N) i32 per-Gaussian binning words.
    gauss_counts: (N,) i32 entries per Gaussian (post-drop).

    Returns (words (NWORDS, E) i32, ids (E,) i32): per-entry words and
    monotone gaussian ids in expansion order.  Slots past the real entry
    total are UNWRITTEN (arbitrary): every consumer already masks by its
    own validity predicate (sentinel keys, entry_valid zeroing).
    """
    nwords, n = word_stack.shape
    assert nwords == NWORDS
    b = BLOCK_GAUSS
    step_g = b * BLOCKS_PER_STEP
    n_pad = -(-n // step_g) * step_g
    e_len = -(-max(e_cap, CHUNK) // CHUNK) * CHUNK

    counts = gauss_counts.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    if n_pad != n:
        word_stack = jnp.pad(word_stack, ((0, 0), (0, n_pad - n)))
        cum = jnp.pad(cum, (0, n_pad - n), mode="edge")
    gid = jnp.arange(n_pad, dtype=jnp.uint32)
    u = word_stack.astype(jnp.uint32)
    # byte planes (exact in single-pass bf16) + 3 gaussian-id iota bytes;
    # cum rides the same per-block DMA as an f32-exact integer row
    # (entry totals < 2^24 by the tile-entry budget)
    planes = [((u[wi] >> (8 * p)) & 0xFF).astype(jnp.float32)
              for wi in range(NWORDS) for p in range(4)]
    planes += [(gid & 0xFF).astype(jnp.float32),
               ((gid >> 8) & 0xFF).astype(jnp.float32),
               ((gid >> 16) & 0xFF).astype(jnp.float32)]
    packed = jnp.stack(planes + [cum.astype(jnp.float32)], axis=0)

    nb = n_pad // b
    edges = jnp.minimum(jnp.arange(1, nb + 1) * b, n) - 1
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        cum[edges].astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // BLOCKS_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((NPLANES + 1, b), jnp.float32),
            pltpu.VMEM((NOUT, CHUNK), jnp.int32),
            pltpu.VMEM((NOUT, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_expand_kernel, e_len=e_len)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NOUT, e_len), jnp.int32),
        interpret=use_interpret_mode(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, packed)
    return out[:NWORDS, :e_cap], out[NWORDS, :e_cap]
