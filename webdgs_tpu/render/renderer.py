"""Full forward render: scene + camera -> image.

Equivalent to the reference's per-frame encode of TiledForwardPass +
TiledRasterizer (src/viewer.ts:71-100, src/renderers/tiled-forward-pass.ts:
341-404, src/renderers/tiled-rasterizer.ts:180-300), as one jittable
function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from webdgs_tpu.config import DEFAULT_SETTINGS, RenderSettings
from webdgs_tpu.core.camera import Camera
from webdgs_tpu.core.scene import GaussianScene
from webdgs_tpu.ops import binning as binning_ops
from webdgs_tpu.ops import rasterize as raster_ops
from webdgs_tpu.ops.projection import SplatAttrs, SplatAux, project_gaussians


class RenderResult(NamedTuple):
    image: jax.Array  # (H, W, 3) with background composited
    accum: jax.Array  # (H, W, 4) raw [r,g,b,accum_alpha] before background
    t_final: jax.Array  # (H, W) final transmittance (reference output_alpha)
    n_contrib: jax.Array  # (H, W) i32 last contributor per pixel
    aux: SplatAux
    binning: binning_ops.Binning


def render_from_attrs(attrs: SplatAttrs, aux: SplatAux, img_w: int,
                      img_h: int, settings: RenderSettings,
                      entry_capacity: int | None = None):
    """Bin (non-differentiable) + rasterize (custom VJP) from projected
    splat attributes.  Differentiable w.r.t. ``attrs``."""
    ntx, nty = binning_ops.tile_grid(img_w, img_h, settings)
    bins = binning_ops.bin_splats(aux, img_w, img_h, settings,
                                  capacity=entry_capacity)
    attrs16 = raster_ops.pack_entry_attrs(attrs, bins.entry_gauss,
                                          bins.entry_valid, settings)
    out = raster_ops.rasterize_tiles(attrs16, bins.tile_offsets,
                                     ntx, nty, settings)
    return out, bins


def render(scene: GaussianScene, camera: Camera, img_w: int, img_h: int,
           settings: RenderSettings = DEFAULT_SETTINGS,
           entry_capacity: int | None = None) -> RenderResult:
    attrs, aux = project_gaussians(scene.params(), scene.alive, camera,
                                   img_w, img_h, scene.sh_deg, settings)
    out, bins = render_from_attrs(attrs, aux, img_w, img_h, settings,
                                  entry_capacity)
    ntx, nty = binning_ops.tile_grid(img_w, img_h, settings)
    img_tiles = raster_ops.tiles_to_image(out, ntx, nty, img_w, img_h,
                                          settings)
    accum = img_tiles[..., 0:4]
    t_final = img_tiles[..., raster_ops.OUT_T]
    bg = jnp.asarray(settings.background, dtype=jnp.float32)
    # final color = accum + background * T (tiled-rasterizer.wgsl:250-252)
    image = accum[..., :3] + bg * t_final[..., None]
    return RenderResult(
        image=image,
        accum=accum,
        t_final=t_final,
        n_contrib=img_tiles[..., raster_ops.OUT_NCONTRIB].astype(jnp.int32),
        aux=aux,
        binning=bins,
    )
