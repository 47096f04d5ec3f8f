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
                   sem, osem, *, ntx: int, settings: RenderSettings):
    k = settings.chunk
    t = pl.program_id(0)
    start = offsets_ref[t]
    nch = (offsets_ref[t + 1] - start) // k

    pxf, pyf = _pixel_coords(t, ntx, settings)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    flagged = pix_ref[0, :, 0:1]  # (P, 1)
    n_contrib = pix_ref[0, :, 1:2]

    def body(c, _):
        base = pl.multiple_of(start + c * k, k)
        cp = pltpu.make_async_copy(attrs_ref.at[:, pl.ds(base, k)], scr, sem)
        cp.start()
        cp.wait()
        alpha, _, _, _ = _chunk_alpha(scr[:], pxf, pyf, settings)
        pos = (c * k + lane + 1).astype(jnp.float32)
        m = ((alpha >= settings.alpha_min) & (pos <= n_contrib)
             & (flagged > 0.0)).astype(jnp.float32)
        cnt_scr[0:1, :] = jnp.sum(m, axis=0, keepdims=True)
        out_cp = pltpu.make_async_copy(
            cnt_scr, out_ref.at[:, pl.ds(base, k)], osem)
        out_cp.start()
        out_cp.wait()
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


def _entry_counts(attrs16, tile_offsets, pix_tiles, num_tiles_x, num_tiles_y,
                  settings: RenderSettings) -> jax.Array:
    p = settings.tile_px
    k = settings.chunk
    n_tiles = num_tiles_x * num_tiles_y
    e_pad = attrs16.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, p, 2), lambda i, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((raster_ops.NUM_ROWS, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.SemaphoreType.DMA,
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
    bins = binning_ops.bin_splats(aux, img_w, img_h, settings)
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
    entry_counts = jnp.where(bins.entry_valid, entry_counts, 0.0)
    n = alive.shape[0]
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
