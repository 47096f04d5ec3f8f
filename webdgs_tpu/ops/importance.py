"""Densification importance metrics.

Replaces the reference's three metric kernels (src/shaders/metric-map.wgsl,
metric-count.wgsl, metric-normalize.wgsl) and fixes its single-camera-buffer
bug (SURVEY.md Q1: all encoded metric views rendered with the LAST camera,
because every set_preset writeBuffer lands before the one submit; here each
view really renders with its own camera).

Pipeline per view, at a downscaled resolution (metricDownscale, default 2):
  1. render the scene; keep the per-tile n_contrib map,
  2. error map = mean |pred - gt| per pixel, min/max-normalized, thresholded
     to a binary flag map (metric-map.wgsl:27-117),
  3. for each flagged pixel, count every entry in the first n_contrib
     positions of its tile whose alpha >= 1/255 toward that entry's Gaussian
     (metric-count.wgsl:55-88) — implemented as a Pallas kernel that sums
     the (pixel, splat) contribution mask over pixels and a deterministic
     segment-add over entries,
  4. counts accumulate over views and divide by the view count
     (metric-normalize.wgsl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webdgs_tpu.config import RenderSettings, use_interpret_mode
from webdgs_tpu.core.camera import Camera
from webdgs_tpu.ops import binning as binning_ops
from webdgs_tpu.ops import rasterize as raster_ops
from webdgs_tpu.ops.projection import project_gaussians
from webdgs_tpu.ops.rasterize import _chunk_alpha, _pixel_coords


def metric_flag_map(pred: jax.Array, target: jax.Array,
                    threshold: float) -> jax.Array:
    """Binary (H, W) importance mask (metric-map.wgsl)."""
    err = jnp.mean(jnp.abs(pred - target), axis=-1)
    lo, hi = jnp.min(err), jnp.max(err)
    norm = jnp.where(hi > lo, (err - lo) / jnp.maximum(hi - lo, 1e-12), 0.0)
    return (norm > threshold).astype(jnp.float32)


def _metric_kernel(offsets_ref, attrs_ref, pix_ref, out_ref, scr, cnt_scr,
                   rscr, sem, osem, rsem, *, ntx: int,
                   settings: RenderSettings):
    """Per-tile replay with the same prefetch discipline as the rasterizer
    kernels: double-buffered input DMA, double-buffered count write-out,
    and two work bounds the serial version lacked — entries past every
    flagged pixel's n_contrib never count (the reference replays only the
    first n_contrib instances, metric-count.wgsl:55-62), and a tile with no
    flagged pixel skips its replay entirely (metric-count.wgsl:33-36 early
    return)."""
    k = settings.chunk
    gstep = settings.tiles_per_step
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    _metric_tile(pix_ref, offsets_ref, attrs_ref, out_ref, scr, cnt_scr,
                 rscr, sem, osem, rsem, lane, ntx=ntx, settings=settings,
                 gstep=gstep)


def _metric_tile(pix_ref, offsets_ref, attrs_ref, out_ref, scr, cnt_scr,
                 rscr, sem, osem, rsem, lane, *, ntx, settings, gstep):
    k = settings.chunk

    pid = pl.program_id(0)

    def tile_body(i, _):
        t = pid * gstep + i
        base, uo, cnt, nch = raster_ops._tile_window(offsets_ref, t, k)
        skip = uo - base

        pxf, pyf = _pixel_coords(t, ntx, settings)
        flagged = pix_ref[i, :, 0:1]  # (P, 1)
        n_contrib = pix_ref[i, :, 1:2]
        _metric_replay(base, uo, cnt, nch, skip, pxf, pyf, flagged,
                       n_contrib, attrs_ref, out_ref, scr, cnt_scr, rscr,
                       sem, osem, rsem, lane, settings)
        return 0

    jax.lax.fori_loop(0, gstep, tile_body, 0)


def _metric_replay(base, uo, cnt, nch, skip, pxf, pyf, flagged, n_contrib,
                   attrs_ref, out_ref, scr, cnt_scr, rscr, sem, osem, rsem,
                   lane, settings):
    k = settings.chunk

    # chunks at positions beyond every flagged pixel's last contributor
    # produce all-zero counts; skip them (zero-filled below).  Chunk 0 is
    # always processed so the shared-boundary accumulate below runs.
    max_nc = jnp.max(jnp.where(flagged > 0.0, n_contrib, 0.0))
    live = jnp.minimum(nch, jnp.maximum(
        (max_nc.astype(jnp.int32) + skip + k - 1) // k, 1))

    def chunk_dma(c, slot):
        start = pl.multiple_of(base + c * k, k)
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(start, k)], scr.at[slot], sem.at[slot])

    def out_dma(c, slot):
        start = pl.multiple_of(base + c * k, k)
        return pltpu.make_async_copy(
            cnt_scr.at[slot], out_ref.at[:, pl.ds(start, k)], osem.at[slot])

    # the window's first chunk may be shared with the previous tile's last
    # chunk (skip > 0): accumulate instead of clobbering, exactly like the
    # backward rasterizer's rmw (ops/rasterize.py:_bwd_kernel)
    def rmw_dma():
        start = pl.multiple_of(base, k)
        return pltpu.make_async_copy(
            out_ref.at[:, pl.ds(start, k)], rscr, rsem)

    @pl.when(live > 0)
    def _():
        chunk_dma(0, 0).start()
        rmw_dma().start()

    def body(c, _):
        slot = c % 2

        @pl.when(c + 1 < live)
        def _():
            chunk_dma(c + 1, (c + 1) % 2).start()

        chunk_dma(c, slot).wait()

        # the count scratch slot is reused every other chunk: its previous
        # write-out must have drained before overwriting
        @pl.when(c >= 2)
        def _():
            out_dma(c - 2, slot).wait()

        alpha, _, _, _, _, _ = _chunk_alpha(
            scr[slot], pxf, pyf, settings,
            raster_ops._window_mask(base, uo, cnt, c, lane, k))
        pos = (base + c * k + lane - uo + 1).astype(jnp.float32)
        m = ((alpha >= settings.alpha_min) & (pos <= n_contrib)
             & (flagged > 0.0)).astype(jnp.float32)
        counts_row = jnp.sum(m, axis=0, keepdims=True)

        @pl.when(c == 0)
        def _():
            rmw_dma().wait()

        cnt_scr[slot, 0:1, :] = jnp.where(
            (c == 0) & (skip > 0), counts_row + rscr[0:1, :], counts_row)
        out_dma(c, slot).start()
        return 0

    jax.lax.fori_loop(0, live, body, 0)

    @pl.when(live >= 2)
    def _():
        out_dma(live - 2, live % 2).wait()

    @pl.when(live >= 1)
    def _():
        out_dma(live - 1, (live - 1) % 2).wait()

    # chunks skipped by the n_contrib/flag bounds still need zero counts
    cnt_scr[0] = jnp.zeros((1, k), jnp.float32)
    cnt_scr[1] = jnp.zeros((1, k), jnp.float32)

    def zero_fill(c, _):
        @pl.when(c >= live + 2)
        def _():
            out_dma(c - 2, (c - 2) % 2).wait()
        out_dma(c, c % 2).start()
        return 0

    jax.lax.fori_loop(live, nch, zero_fill, 0)

    @pl.when(nch - live >= 2)
    def _():
        out_dma(nch - 2, nch % 2).wait()

    @pl.when(nch - live >= 1)
    def _():
        out_dma(nch - 1, (nch - 1) % 2).wait()


def _entry_counts(attrs16, tile_offsets, pix_tiles, num_tiles_x, num_tiles_y,
                  settings: RenderSettings) -> jax.Array:
    p = settings.tile_px
    k = settings.chunk
    g = settings.tiles_per_step
    n_tiles = num_tiles_x * num_tiles_y
    e_pad = attrs16.shape[1]
    tile_offsets, n_pad = raster_ops._pad_tiles(tile_offsets, n_tiles, g)
    if n_pad != n_tiles:
        pix_tiles = jnp.pad(pix_tiles, ((0, n_pad - n_tiles), (0, 0),
                                        (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((g, p, 2), lambda i, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, raster_ops.NUM_ROWS, k), jnp.float32),
            pltpu.VMEM((2, 1, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_metric_kernel, ntx=num_tiles_x,
                               settings=settings)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, e_pad), jnp.float32),
        interpret=use_interpret_mode(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_offsets, attrs16, pix_tiles)


def view_importance_counts(scene_params, alive, sh_deg, camera: Camera,
                           target: jax.Array, img_w: int, img_h: int,
                           threshold: float,
                           settings: RenderSettings) -> jax.Array:
    """Per-Gaussian importance counts for one view (already downscaled).

    target: (img_h, img_w, 3) ground truth at the metrics resolution.
    """
    attrs, aux = project_gaussians(scene_params, alive, camera, img_w, img_h,
                                   sh_deg, settings)
    ntx, nty = binning_ops.tile_grid(img_w, img_h, settings)
    # attrs enables the exact tile cull (binning.expand_entries): culled
    # pairs have alpha < alpha_min at every pixel, so they are never
    # contributors — n_contrib and the replayed counts are unchanged
    bins = binning_ops.bin_splats(aux, img_w, img_h, settings, attrs=attrs)
    attrs16 = raster_ops.pack_entry_attrs(attrs, bins.entry_gauss,
                                          bins.entry_valid, settings)
    out = raster_ops.rasterize_tiles(attrs16, bins.tile_offsets, ntx, nty,
                                     settings)
    tiles = raster_ops.tiles_to_image(out, ntx, nty, img_w, img_h, settings)
    pred = raster_ops.composite_background(tiles, settings)

    flag = metric_flag_map(pred, target, threshold)
    pix = jnp.stack([flag, tiles[..., raster_ops.OUT_NCONTRIB]], axis=-1)
    pix_tiles = raster_ops.image_to_tiles(pix, ntx, nty, settings)

    entry_counts = _entry_counts(attrs16, bins.tile_offsets, pix_tiles,
                                 ntx, nty, settings)[0]
    n = alive.shape[0]
    if bins.entry_source is not None:
        # per-Gaussian sums without the large-scale XLA scatter-add (same
        # prefix-segment reduction as the gradient path)
        # (f16 row gather is exact here: counts are integers <= tile_px)
        return raster_ops.segment_reduce_entries(
            bins.capacity, entry_counts[:, None], bins.entry_valid,
            bins.entry_source, bins.gauss_counts, settings,
            bins.expansion_gauss)[:, 0]
    entry_counts = jnp.where(bins.entry_valid, entry_counts, 0.0)
    return jnp.zeros((n,), jnp.float32).at[bins.entry_gauss].add(entry_counts)


def multiview_importance_counts(scene_params, alive, sh_deg,
                                cameras: Camera, targets: jax.Array,
                                img_w: int, img_h: int, threshold: float,
                                settings: RenderSettings) -> jax.Array:
    """Average counts over a batch of views (leading axis on cameras/targets),
    the reference's multi-view accumulation + normalize (trainer.ts:391-432)
    with Q1 fixed."""
    n_views = targets.shape[0]

    def body(i, acc):
        cam_i = jax.tree.map(lambda x: x[i], cameras)
        return acc + view_importance_counts(
            scene_params, alive, sh_deg, cam_i, targets[i], img_w, img_h,
            threshold, settings)

    total = jax.lax.fori_loop(
        0, n_views, body, jnp.zeros((alive.shape[0],), jnp.float32))
    return total / n_views
