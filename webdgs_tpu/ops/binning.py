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
from webdgs_tpu.ops.projection import SplatAttrs, SplatAux


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
    # pre-sort (expansion-order) gaussian id per slot — MONOTONE along the
    # entry axis (jnp.repeat emits gaussian-grouped runs); the Pallas
    # segment-sum gradient reducer keys its one-hot blocks on it
    expansion_gauss: jax.Array | None = None
    # pre-overflow-drop entry DEMAND: the sum of per-Gaussian kept counts
    # (post-cull survivors when tile_cull is on) BEFORE the e_cap budget
    # drops whole Gaussians.  total_entries saturates at <= capacity, so
    # capacity adaptation must observe this instead to see real pressure.
    expansion_entries: jax.Array | None = None

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


# tile ids share a u32 key with 16 depth bits, like the reference's
# (tile+1)<<16 keys (tiled-forward.wgsl:133-136): ~4K x 4K images max.
# Module attribute (not inlined) so tests can lower it to exercise the
# banded fallback at CPU-sized frames.
TILE_KEY_LIMIT = 0xFFFF


def check_tile_key_limit(total_tiles: int) -> None:
    if total_tiles >= TILE_KEY_LIMIT:
        raise ValueError(
            f"{total_tiles} tiles exceeds the 16-bit tile-key limit; "
            "increase tile size or shard the image")


CULL_POSITIONS = 64  # local rect positions covered by the cull bitmask


def _floor_div_f32(num: jax.Array, den: jax.Array):
    """Exact integer floor-divide via one f32 divide + correction (both
    operands < 2^13; XLA's i32 division is bit-serial on the VPU)."""
    q = jnp.floor(num.astype(jnp.float32)
                  / den.astype(jnp.float32)).astype(jnp.int32)
    r = num - q * den
    over = r >= den
    under = r < 0
    q = q + over.astype(jnp.int32) - under.astype(jnp.int32)
    r = r - jnp.where(over, den, 0) + jnp.where(under, den, 0)
    return q, r


def _cull_bitmask(aux: SplatAux, attrs: SplatAttrs,
                  settings: RenderSettings):
    """Per-Gaussian 64-bit mask of rect positions whose maximum alpha over
    the tile's pixel box is provably < alpha_min (bit i = local position
    i = q*tiles_x + r is culled).  All math is f32 on (N, 64) arrays —
    O(N) work, one fusion, no per-entry gathers.  Gaussians with more than
    64 rect positions (or a numerically non-convex conic) get an all-zero
    mask: never culled, always safe."""
    det = jax.lax.stop_gradient
    conic = det(attrs.conic)
    ca, cb, cc = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]  # (N, 1)
    op = det(attrs.opacity)
    center = det(attrs.center_px)
    tw, th = settings.tile_w, settings.tile_h

    # cull iff qmin > qthr = 2 ln(op / alpha_min), rounded up for safety
    qthr = (2.0 * jnp.log(jnp.maximum(op, 1e-12) / settings.alpha_min)
            * (1.0 + 1e-5) + 1e-4)[:, None]  # (N, 1)

    pos = jnp.arange(CULL_POSITIONS, dtype=jnp.int32)[None, :]  # (1, R)
    tiles_x = jnp.maximum(aux.tile_dims[:, 0:1], 1)  # (N, 1)
    q_loc, r_loc = _floor_div_f32(pos, tiles_x)  # (N, R)
    eligible = (pos < aux.num_tiles[:, None]) & \
        (aux.num_tiles[:, None] <= CULL_POSITIONS)

    # tile pixel-center box relative to the splat center (continuous box
    # bounds <= any pixel center's q: conservative)
    x0 = ((aux.tile_min[:, 0:1] + r_loc) * tw).astype(jnp.float32) \
        + 0.5 - center[:, 0:1]
    y0 = ((aux.tile_min[:, 1:2] + q_loc) * th).astype(jnp.float32) \
        + 0.5 - center[:, 1:2]
    x1 = x0 + (tw - 1)
    y1 = y0 + (th - 1)

    # EXTENT refinement: the rasterizer also masks |dx| > ex (the SnugBox
    # extent test, tiled-rasterizer.wgsl:208), so the feasible pixel box is
    # the tile box INTERSECTED with the extent box — tiles whose
    # intersection is empty cull outright, and the quadratic min runs over
    # the smaller box (measured +3.8pp cull at the bench scene,
    # scripts/exp_cull.py).  The 1e-3 px margin keeps the clip conservative
    # against the kernel's one-rounding dx (ulp-class at image scale).
    ext = det(attrs.extents)
    exm = ext[:, 0:1] + 1e-3
    eym = ext[:, 1:2] + 1e-3
    empty = (x0 > exm) | (x1 < -exm) | (y0 > eym) | (y1 < -eym)
    x0 = jnp.maximum(x0, -exm)
    x1 = jnp.minimum(x1, exm)
    y0 = jnp.maximum(y0, -eym)
    y1 = jnp.minimum(y1, eym)
    inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)

    # exact min of the convex quadratic over the box: interior (0) or one
    # of the four edges, each a 1D quadratic clamped to its segment
    def edge_x(dxf):
        dy = jnp.clip(-cb * dxf / jnp.maximum(cc, 1e-12), y0, y1)
        return (ca * dxf + 2.0 * cb * dy) * dxf + cc * dy * dy

    def edge_y(dyf):
        dx = jnp.clip(-cb * dyf / jnp.maximum(ca, 1e-12), x0, x1)
        return (ca * dx + 2.0 * cb * dyf) * dx + cc * dyf * dyf

    qmin = jnp.minimum(jnp.minimum(edge_x(x0), edge_x(x1)),
                       jnp.minimum(edge_y(y0), edge_y(y1)))
    qmin = jnp.where(inside, 0.0, qmin) * (1.0 - 2.0 ** -12)
    convex = (ca > 0.0) & (cc > 0.0) & (ca * cc - cb * cb > 0.0)
    culled = eligible & convex & ((qmin > qthr) | empty)

    # SURVIVOR mask: rect positions that stay.  Gaussians beyond the mask
    # width (num_tiles > 64) keep their full rect (identity mapping).
    in_rect = pos < aux.num_tiles[:, None]
    bit = (in_rect & ~culled).astype(jnp.uint32)
    # bits are unique per lane, so a sum IS the bitwise OR
    w = bit << (pos % 32).astype(jnp.uint32)
    lo = jnp.sum(jnp.where(pos < 32, w, 0), axis=1).astype(jnp.uint32)
    hi = jnp.sum(jnp.where(pos >= 32, w, 0), axis=1).astype(jnp.uint32)

    n_surv = (jax.lax.population_count(lo)
              + jax.lax.population_count(hi)).astype(jnp.int32)
    small = aux.num_tiles <= CULL_POSITIONS
    surv_counts = jnp.where(small, n_surv, aux.num_tiles)
    # identity masks for large rects keep the per-entry bit-select total
    ones = jnp.uint32(0xFFFFFFFF)
    lo = jnp.where(small, lo, ones)
    hi = jnp.where(small, hi, ones)
    return (jax.lax.bitcast_convert_type(lo, jnp.int32),
            jax.lax.bitcast_convert_type(hi, jnp.int32),
            surv_counts)


def _select_nth_set_bit(lo: jax.Array, hi: jax.Array, s: jax.Array):
    """Position of the (s+1)-th set bit of the 64-bit mask (hi:lo), via a
    popcount binary search — vectorized, ~30 VPU ops, no gathers.  Callers
    guarantee s < popcount(mask).  All-ones masks yield the identity."""
    pc_lo = jax.lax.population_count(lo).astype(jnp.int32)
    use_hi = s >= pc_lo
    m = jnp.where(use_hi, hi, lo)
    s32 = jnp.where(use_hi, s - pc_lo, s)
    p = jnp.where(use_hi, jnp.int32(32), jnp.int32(0))
    for width in (16, 8, 4, 2, 1):
        mask_w = jnp.uint32((1 << width) - 1)
        c = jax.lax.population_count(m & mask_w).astype(jnp.int32)
        go_hi = s32 >= c
        s32 = s32 - jnp.where(go_hi, c, 0)
        p = p + jnp.where(go_hi, width, 0)
        m = jnp.where(go_hi, m >> jnp.uint32(width), m)
    return p


def expand_entries(aux: SplatAux, ntx: int, e_cap: int,
                   attrs: SplatAttrs | None = None,
                   settings: RenderSettings | None = None):
    """Ragged expansion of per-Gaussian tile rects into per-entry sort keys,
    in expansion (gaussian-grouped) order — the analogue of the reference's
    emit_main (tiled-forward.wgsl:298-354).

    Returns (key, g, counts, total, keep, demand): the 32-bit
    (tile<<16)|depth16 key and gaussian index per expansion slot, the
    per-Gaussian kept entry counts, the total real entry count, the
    per-Gaussian keep mask, and the pre-drop entry demand (see
    ``Binning.expansion_entries``).  Gaussians that would overflow
    ``e_cap`` are dropped whole (the reference's maxTileEntries budget).

    When ``attrs`` is given and ``settings.tile_cull`` is on, (gaussian,
    tile) pairs whose maximum alpha over the tile's pixel box is provably
    below alpha_min are culled — the expansion emits ONLY the survivors,
    so the entry capacity itself (and with it the sort, the pack gathers,
    and the gradient segment-reduce) shrinks, not just the kernel
    windows.  The rasterizer's alpha_min mask already zeroes every pixel
    of culled pairs, so the image and its gradients are unchanged — the
    reference's rect binning (SnugBox, tiled-forward.wgsl:298-354) simply
    over-covers: ~24% of the bench scene's entries fail this test
    (RESULTS.md).  The test is evaluated per GAUSSIAN over its local rect
    (f32-exact convex-quadratic min per tile box, :func:`_cull_bitmask` —
    O(N*64) work in one fusion); each entry maps its survivor slot back
    to a rect position by a popcount binary search over the 64-bit
    survivor mask (a per-ENTRY quadratic evaluation measured +4 ms: its
    7-word gather's lane-padded output was re-read by every consumer
    fusion).  Rects wider than 64 positions keep their full rect (the
    mask is identity there) — always safe."""
    cull_on = attrs is not None and settings is not None and settings.tile_cull

    if cull_on:
        mask_lo, mask_hi, counts0 = _cull_bitmask(aux, attrs, settings)
    else:
        counts0 = aux.num_tiles
    cum_all = jnp.cumsum(counts0)
    demand = cum_all[-1]  # pre-overflow-drop entry demand (post-cull)
    keep = cum_all <= e_cap
    counts = jnp.where(keep, counts0, 0)
    cum_incl = jnp.cumsum(counts)
    offsets = cum_incl - counts
    total_expansion = cum_incl[-1]

    # entry -> gaussian, then one row-gather of the packed per-Gaussian
    # binning fields.  THREE words instead of five (FIVE with the cull
    # bitmask): every (E, c) gather output is lane-padded to 128 on TPU
    # (~400 MB of phantom tile traffic at 786k entries), and XLA's
    # consumer fusions re-read that padded array once per output — so the
    # base tile id and depth pre-combine into the key's own layout (tile
    # arithmetic only ever ADDS whole tile steps, i.e. multiples of 1<<16,
    # on top) and the whole per-entry chain below produces ONE output, the
    # sort key.
    base_tile = (aux.tile_min[:, 1] * ntx
                 + aux.tile_min[:, 0]).astype(jnp.uint32)
    words = [
        ((base_tile << 16) | _ordered_depth16(aux.depth)).astype(jnp.int32),
        offsets,
        aux.tile_dims[:, 0],
    ]
    if cull_on:
        words += [mask_lo, mask_hi]
    use_kernel = settings is not None and settings.expand_kernel
    if use_kernel:
        # Pallas expansion (ops/expand.py): counts -> per-entry words +
        # monotone gaussian ids in ONE pass with compact channel-major
        # outputs — replaces the scatter+cummax repeat, the lane-padded
        # (E, 5) row-gather, and its padded re-reads (round-5 trace:
        # ~2.5 ms of the step at the bench shape)
        from webdgs_tpu.ops.expand import NWORDS, expand_fields
        while len(words) < NWORDS:
            words.append(jnp.zeros_like(words[0]))
        ew, g = expand_fields(jnp.stack(words, axis=0), counts, e_cap)
        w_key, w_off, w_tx = ew[0], ew[1], ew[2]
        w_mlo, w_mhi = ew[3], ew[4]
    else:
        g = _repeat_ids(counts, e_cap)
        fields = jnp.stack(words, axis=1)  # (N, 3 or 5)
        ef = fields[g]  # (E, .)
        w_key, w_off, w_tx = ef[:, 0], ef[:, 1], ef[:, 2]
        if cull_on:
            w_mlo, w_mhi = ef[:, 3], ef[:, 4]

    e_idx = jnp.arange(e_cap, dtype=jnp.int32)
    valid = e_idx < total_expansion
    slot = e_idx - w_off
    if cull_on:
        # survivor slot -> original rect position via the bitmask
        pos = _select_nth_set_bit(w_mlo.astype(jnp.uint32),
                                  w_mhi.astype(jnp.uint32),
                                  jnp.clip(slot, 0, None))
        # large rects (identity mask, num_tiles may exceed 64): p == slot
        pos = jnp.where(slot >= CULL_POSITIONS, slot, pos)
    else:
        pos = slot
    tiles_x = jnp.maximum(w_tx, 1)  # repeat pads with the last gaussian,
    # which may have degenerate dims.  pos // tiles_x via f32 reciprocal:
    # XLA expands i32 division bit-serially on the VPU (~2.5 ms at 786k
    # entries on a v5e chip); both operands are < 2^13 (<= 2048 tiles per
    # gaussian, tiled-forward.wgsl:275), so one f32 divide is within 1 of
    # the true quotient and a single correction step makes it exact.
    q, r = _floor_div_f32(pos, tiles_x)

    # the reference's combined key (tiled-forward.wgsl:133-136), without its
    # +1 tile bias: invalid entries get the all-ones key and sort last
    key = jnp.where(valid,
                    w_key.astype(jnp.uint32)
                    + ((q * ntx + r).astype(jnp.uint32) << 16),
                    jnp.uint32(0xFFFFFFFF))
    return key, g, counts, total_expansion, keep, demand


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
               with_source: bool | None = None,
               attrs: SplatAttrs | None = None) -> Binning:
    """``attrs``: when given (and ``settings.tile_cull``), enables the
    exact per-(gaussian, tile) alpha cull in :func:`expand_entries` —
    image-identical, ~20-24% fewer entries at the bench scene."""
    n = aux.num_tiles.shape[0]
    e_cap = capacity if capacity is not None else entry_capacity(n, settings)
    ntx, nty = tile_grid(img_w, img_h, settings)
    total_tiles = ntx * nty
    check_tile_key_limit(total_tiles)

    # names match expand_entries' return: total_kept = post-drop real
    # entries (<= e_cap), demand = pre-drop entry demand (can exceed it)
    key, g, counts, total_kept, keep, demand = expand_entries(
        aux, ntx, e_cap, attrs=attrs, settings=settings)
    culling = attrs is not None and settings.tile_cull

    if with_source is None:
        with_source = e_cap >= settings.grad_reduce_threshold

    # --- ONE depth sort; the sorted order is the final entry layout (the
    # reference's radix_sort.wgsl + atomicMin tile-ranges pass collapse to
    # this sort + the tile ranges below) ---
    if with_source:
        source = jnp.arange(e_cap, dtype=jnp.int32)
        sorted_key, sorted_gauss, sorted_source = jax.lax.sort(
            (key, g, source), num_keys=1)
    else:
        sorted_key, sorted_gauss = jax.lax.sort((key, g), num_keys=1)
        sorted_source = None

    if culling:
        # --- tile ranges from the sorted keys (the reference's tile-ranges
        # pass, tile-ranges.wgsl, as one vectorized binary search): the
        # corner histogram counts rect AREAS, which per-pair culling
        # invalidates.  Valid keys are < total_tiles<<16 <= the sentinel,
        # so offsets[T] lands on the surviving-entry count. ---
        bounds = (jnp.arange(total_tiles + 1, dtype=jnp.uint32)
                  << 16).astype(jnp.uint32)
        tile_offsets = jnp.searchsorted(sorted_key, bounds,
                                        side="left").astype(jnp.int32)
        tile_counts = tile_offsets[1:] - tile_offsets[:-1]
    else:
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
        entry_valid=e_idx < total_kept,
        tile_offsets=tile_offsets,
        tile_counts=tile_counts,
        total_entries=total_kept,
        entry_source=sorted_source,
        gauss_counts=counts if with_source else None,
        expansion_gauss=g if with_source else None,
        expansion_entries=demand,
    )
