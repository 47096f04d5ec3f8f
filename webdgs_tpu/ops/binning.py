"""Tile binning: expand Gaussians into per-tile entries and depth-sort them.

The reference implements this as five GPU passes: count_main -> Blelloch
prefix scan -> update_stats -> emit_main -> a 519-line decoupled-lookback
radix sort, plus an atomicMin tile-ranges kernel
(src/shaders/tiled-forward.wgsl:296-354, src/prefix/prefix_sum.wgsl,
src/sort/radix_sort.wgsl, src/shaders/tile-ranges.wgsl).

On TPU the stage is a short chain of XLA-native ops with static shapes,
designed so *nothing O(entries) is ever binary-searched or scattered*:

* the ragged expansion (each visible Gaussian emits ``num_tiles`` entries)
  is ``jnp.repeat(..., total_repeat_length)`` — a cumsum under the hood —
  followed by ONE row-gather of the packed per-Gaussian binning fields;
* entries carry the reference's exact 32-bit sort key
  ``(tile_id << 16) | (ordered_depth >> 16)`` (tiled-forward.wgsl:121-136)
  and are sorted by one ``jax.lax.sort`` with the payloads the consumers
  need (gaussian id, expansion slot) — the sorted array IS the final
  layout;
* tile ranges are just a cumsum of per-tile counts, which come from a
  corner-scatter 2D prefix-sum over the Gaussians' tile rects (an O(N)
  histogram via one MXU matmul, not O(E)).  The ranges are UNALIGNED: the
  rasterizer kernels DMA chunk-aligned superset windows and mask foreign
  boundary slots by index arithmetic (ops/rasterize.py:_tile_window), so
  no O(entries) realignment gather ever runs (the round-2 counting-sort
  realignment cost 37 ms of gathers at 786k entries on a v5e chip —
  2/3 of the whole binning stage).

Entries beyond the static capacity are dropped whole-Gaussian, mirroring the
reference's maxTileEntries budget (src/renderers/tiled-forward-pass.ts:
137-158; the reference drops the overflow tail via out-of-bounds writes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from webdgs_tpu.config import RenderSettings
from webdgs_tpu.ops.projection import SplatAux


def tile_grid(img_w: int, img_h: int,
              settings: RenderSettings) -> tuple[int, int]:
    """Static tile-grid dimensions for an image size."""
    return -(-img_w // settings.tile_w), -(-img_h // settings.tile_h)


class Binning(NamedTuple):
    entry_gauss: jax.Array  # (E,) i32 — gaussian index per sorted entry slot
    entry_valid: jax.Array  # (E,) bool — slots past the real total are False
    tile_offsets: jax.Array  # (T+1,) i32 — unaligned cumulative entry counts
    tile_counts: jax.Array  # (T,) i32 — entries per tile
    total_entries: jax.Array  # () i32 — real entries across all tiles
    # present when the sort carried the expansion-slot payload (the
    # large-scale gradient-reduction path needs it): the pre-sort expansion
    # index of each sorted slot, and the per-Gaussian valid entry counts
    entry_source: jax.Array | None  # (E,) i32 or None
    gauss_counts: jax.Array | None  # (N,) i32 or None

    @property
    def capacity(self) -> int:
        return self.entry_gauss.shape[0]


def entry_capacity(n: int, settings: RenderSettings) -> int:
    """Static tile-entry capacity, like the reference's maxTileEntries sizing
    (tiled-forward-pass.ts:137-158)."""
    est = min(max(n, 1) * settings.avg_tiles_per_gaussian,
              settings.max_tile_entries)
    chunk = settings.chunk
    return max(-(-est // chunk) * chunk, chunk)


def _ordered_depth16(depth: jax.Array) -> jax.Array:
    """f32 view-space depth -> monotonic u32 -> top 16 bits, as the
    reference quantizes sort depths (tiled-forward.wgsl:121-130).  Clamped to
    0xFFFE so the 0xFFFF slot is reserved for alignment padding."""
    bits = jax.lax.bitcast_convert_type(depth, jnp.uint32)
    mask = jnp.where((bits >> 31) != 0, jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0x80000000))
    ordered = bits ^ mask
    return jnp.minimum(ordered >> 16, jnp.uint32(0xFFFE))


def _tile_histogram(aux: SplatAux, keep: jax.Array, ntx: int, nty: int):
    """Per-tile entry counts via the separable corner trick, as one MXU
    matmul instead of an XLA scatter (which serializes and costs ~3 ms at
    100k Gaussians): each Gaussian's rect indicator is the outer product of
    a +-1 row marker and a +-1 column marker, so the corner-delta grid is
    rowmark^T @ colmark — O(N*(ntx+nty)) marker build + one
    (nty+1, N) x (N, ntx+1) contraction — followed by a 2D prefix sum."""
    emitting = keep & (aux.num_tiles > 0)
    x0 = jnp.where(emitting, aux.tile_min[:, 0], 0)
    y0 = jnp.where(emitting, aux.tile_min[:, 1], 0)
    x1 = x0 + jnp.where(emitting, aux.tile_dims[:, 0], 0)  # exclusive
    y1 = y0 + jnp.where(emitting, aux.tile_dims[:, 1], 0)
    one = jnp.where(emitting, 1.0, 0.0).astype(jnp.float32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (x0.shape[0], ntx + 1), 1)
    colmark = (jnp.where(cols == x0[:, None], one[:, None], 0.0)
               - jnp.where(cols == x1[:, None], one[:, None], 0.0))
    rows = jax.lax.broadcasted_iota(jnp.int32, (y0.shape[0], nty + 1), 1)
    rowmark = (jnp.where(rows == y0[:, None], 1.0, 0.0)
               - jnp.where(rows == y1[:, None], 1.0, 0.0))
    # exact in f32: counts are small integers (N <= 2^24)
    grid = jax.lax.dot_general(
        rowmark, colmark, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nty+1, ntx+1)
    grid = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1).astype(jnp.int32)
    return grid[:nty, :ntx].reshape(-1)  # (T,)


def _repeat_ids(counts: jax.Array, total_len: int) -> jax.Array:
    """``jnp.repeat(arange(n), counts, total_repeat_length=total_len)`` via
    one unique-sorted scatter + a cumulative max — ~4x faster than
    ``jnp.repeat``'s generic lowering on TPU.

    Slots beyond ``sum(counts)`` hold the last emitted id (callers mask by
    a separate validity predicate); slots before the first emitted segment
    clamp to 0."""
    n = counts.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    # count-0 rows get unique out-of-bounds slots so the whole index set is
    # genuinely duplicate-free (mode="drop" discards them)
    starts = jnp.where(counts > 0, offsets, total_len + ids)
    seed = jnp.zeros((total_len,), jnp.int32).at[starts].set(
        ids + 1, mode="drop", unique_indices=True)
    return jnp.maximum(jax.lax.cummax(seed) - 1, 0)


def check_tile_key_limit(total_tiles: int) -> None:
    if total_tiles >= 0xFFFF:
        # tile ids share a u32 key with 16 depth bits, like the reference's
        # (tile+1)<<16 keys (tiled-forward.wgsl:133-136): ~4K x 4K images max
        raise ValueError(
            f"{total_tiles} tiles exceeds the 16-bit tile-key limit; "
            "increase tile size or shard the image")


def expand_entries(aux: SplatAux, ntx: int, e_cap: int):
    """Ragged expansion of per-Gaussian tile rects into per-entry sort keys,
    in expansion (gaussian-grouped) order — the analogue of the reference's
    emit_main (tiled-forward.wgsl:298-354).

    Returns (key, g, counts, total): the 32-bit (tile<<16)|depth16 key and
    gaussian index per expansion slot, the per-Gaussian kept entry counts,
    and the total real entry count.  Gaussians that would overflow ``e_cap``
    are dropped whole (the reference's maxTileEntries budget)."""
    counts0 = aux.num_tiles
    keep = jnp.cumsum(counts0) <= e_cap
    counts = jnp.where(keep, counts0, 0)
    cum_incl = jnp.cumsum(counts)
    offsets = cum_incl - counts
    total = cum_incl[-1]

    # entry -> gaussian, then one row-gather of the packed per-Gaussian
    # binning fields.  THREE words instead of five: every (E, c) gather
    # output is lane-padded to 128 on TPU (~400 MB of phantom tile traffic
    # at 786k entries), and XLA's consumer fusions re-read that padded
    # array once per output — so the base tile id and depth pre-combine
    # into the key's own layout (tile arithmetic only ever ADDS whole
    # tile steps, i.e. multiples of 1<<16, on top) and the whole per-entry
    # chain below produces ONE output, the sort key.
    g = _repeat_ids(counts, e_cap)
    base_tile = (aux.tile_min[:, 1] * ntx
                 + aux.tile_min[:, 0]).astype(jnp.uint32)
    fields = jnp.stack([
        ((base_tile << 16) | _ordered_depth16(aux.depth)).astype(jnp.int32),
        offsets,
        aux.tile_dims[:, 0],
    ], axis=1)  # (N, 3)
    ef = fields[g]  # (E, 3)

    e_idx = jnp.arange(e_cap, dtype=jnp.int32)
    valid = e_idx < total
    slot = e_idx - ef[:, 1]
    tiles_x = jnp.maximum(ef[:, 2], 1)  # repeat pads with the last gaussian,
    # which may have degenerate dims.  slot // tiles_x via f32 reciprocal:
    # XLA expands i32 division bit-serially on the VPU (~2.5 ms at 786k
    # entries on a v5e chip); both operands are < 2^13 (<= 2048 tiles per
    # gaussian, tiled-forward.wgsl:275), so one f32 divide is within 1 of
    # the true quotient and a single correction step makes it exact.
    q = jnp.floor(slot.astype(jnp.float32)
                  / tiles_x.astype(jnp.float32)).astype(jnp.int32)
    r = slot - q * tiles_x
    over = r >= tiles_x
    under = r < 0
    q = q + over.astype(jnp.int32) - under.astype(jnp.int32)
    r = (r - jnp.where(over, tiles_x, 0) + jnp.where(under, tiles_x, 0))
    # the reference's combined key (tiled-forward.wgsl:133-136), without its
    # +1 tile bias: invalid entries get the all-ones key and sort last
    key = jnp.where(valid,
                    ef[:, 0].astype(jnp.uint32)
                    + ((q * ntx + r).astype(jnp.uint32) << 16),
                    jnp.uint32(0xFFFFFFFF))
    return key, g, counts, total, keep


def aligned_tile_layout(tile_counts: jax.Array, chunk: int):
    """Chunk-aligned per-tile ranges from exact per-tile counts.  Returns
    (tile_offsets (T+1,), aligned_off (T,), unaligned_off (T,)).

    Used by the sharded exchange paths (parallel/sharding.py), which
    materialize entry rows into per-tile ranges after an all_to_all; the
    single-device path keeps entries in sort order instead and lets the
    rasterizer window over them (see module docstring)."""
    aligned_counts = -(-tile_counts // chunk) * chunk
    unaligned_off = jnp.cumsum(tile_counts) - tile_counts
    aligned_off = jnp.cumsum(aligned_counts) - aligned_counts
    tile_offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(aligned_counts).astype(jnp.int32),
    ])
    return tile_offsets, aligned_off, unaligned_off


def realign_sorted(tile_offsets, aligned_off, unaligned_off, tile_counts,
                   a_cap: int, chunk: int, total_tiles: int, src_cap: int):
    """Counting-sort placement indices: for each slot ``k`` of the aligned
    layout, the source index into the tile/depth-sorted entry array and a
    validity mask.  Pure index arithmetic from the per-tile counts."""
    chunk_starts = jnp.arange(a_cap // chunk, dtype=jnp.int32) * chunk
    chunk_tile = jnp.clip(
        jnp.searchsorted(tile_offsets[1:], chunk_starts, side="right"),
        0, total_tiles - 1)
    k_tile = jnp.repeat(chunk_tile, chunk)  # (A,) — static repeat count
    k_idx = jnp.arange(a_cap, dtype=jnp.int32)
    within = k_idx - aligned_off[k_tile]
    out_valid = within < tile_counts[k_tile]
    src = jnp.clip(k_idx - (aligned_off - unaligned_off)[k_tile], 0,
                   src_cap - 1)
    return src, out_valid


def bin_splats(aux: SplatAux, img_w: int, img_h: int,
               settings: RenderSettings,
               capacity: int | None = None,
               with_source: bool | None = None) -> Binning:
    n = aux.num_tiles.shape[0]
    e_cap = capacity if capacity is not None else entry_capacity(n, settings)
    ntx, nty = tile_grid(img_w, img_h, settings)
    total_tiles = ntx * nty
    check_tile_key_limit(total_tiles)

    key, g, counts, total, keep = expand_entries(aux, ntx, e_cap)

    if with_source is None:
        with_source = e_cap >= settings.grad_reduce_threshold

    # --- ONE depth sort; the sorted order is the final entry layout (the
    # reference's radix_sort.wgsl + atomicMin tile-ranges pass collapse to
    # this sort + the histogram cumsum below) ---
    if with_source:
        source = jnp.arange(e_cap, dtype=jnp.int32)
        _, sorted_gauss, sorted_source = jax.lax.sort((key, g, source),
                                                      num_keys=1)
    else:
        _, sorted_gauss = jax.lax.sort((key, g), num_keys=1)
        sorted_source = None

    # --- unaligned tile ranges from the O(N) corner histogram; the
    # rasterizer kernels window over them chunk-aligned ---
    tile_counts = _tile_histogram(aux, keep, ntx, nty)
    tile_offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(tile_counts).astype(jnp.int32),
    ])

    e_idx = jnp.arange(e_cap, dtype=jnp.int32)
    return Binning(
        entry_gauss=sorted_gauss,
        entry_valid=e_idx < total,
        tile_offsets=tile_offsets,
        tile_counts=tile_counts,
        total_entries=total,
        entry_source=sorted_source,
        gauss_counts=counts if with_source else None,
    )
