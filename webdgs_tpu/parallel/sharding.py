"""Multi-chip execution: view-data-parallel training and tile-sharded
rendering over a ``jax.sharding.Mesh``.

The reference is strictly single-device (one WebGPU queue in one browser
tab; SURVEY.md section 2.3), so this subsystem is new surface designed per
BASELINE.json config 5: "1M+ Gaussians, multi-view batched rendering with
tile-sharded rasterization across a v5e-8 mesh".

* ``dp_train_step``: the scene and optimizer state are replicated; the view
  batch (cameras + target images) is sharded over the ``dp`` mesh axis.
  Each device accumulates parameter gradients and per-Gaussian visibility
  counts over its local views, gradients are ``psum``-reduced over ICI, and
  the (identical) Adam update runs everywhere.

* ``render_tile_sharded``: each device renders a horizontal band of tile
  rows.  Projection is computed replicated (O(N) and cheap next to
  rasterization); per-band binning restricts every Gaussian's tile rect to
  the band and rebases tile ids, and splat centers are shifted into band
  pixel coordinates so the rasterizer kernel needs no changes.  The output
  image is sharded over rows; an ``all_gather`` materializes the full frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from webdgs_tpu.config import DEFAULT_SETTINGS, RenderSettings
from webdgs_tpu.core.camera import Camera
from webdgs_tpu.core.scene import GaussianScene
from webdgs_tpu.ops import binning as binning_ops
from webdgs_tpu.ops import rasterize as raster_ops
from webdgs_tpu.ops.adam import AdamHyperparameters, AdamState, adam_step
from webdgs_tpu.ops.loss import LossConfig, loss_metrics
from webdgs_tpu.ops.projection import SplatAux, project_gaussians
from webdgs_tpu.train.step import compute_param_grads


def make_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


# ---------------------------------------------------------------------------
# data-parallel training over views
# ---------------------------------------------------------------------------

def dp_train_step(scene: GaussianScene, opt_state: AdamState,
                  cameras: Camera, targets: jax.Array, mesh: Mesh, *,
                  img_w: int, img_h: int,
                  loss_cfg: LossConfig = LossConfig(),
                  hp: AdamHyperparameters = AdamHyperparameters(),
                  settings: RenderSettings = DEFAULT_SETTINGS,
                  entry_capacity: int | None = None):
    """One training step over a batch of views sharded across the mesh.

    cameras: stacked Camera pytree with leading view axis (size divisible by
    the mesh); targets: (V, H, W, 3).

    Returns (scene, opt_state, metrics) where metrics carries the same keys
    as the single-device ``train_step`` — scalar losses averaged over the
    view batch, ``visible``/``tile_entries`` as the per-view MAX (the
    quantity that sizes the adaptive entry capacity).
    """
    n_views = targets.shape[0]
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()), check_vma=False)
    def step(scene_r, opt_r, cams_l, targets_l):
        params = scene_r.params()
        zeros = jax.tree.map(jnp.zeros_like, params)
        n = scene_r.capacity

        def body(carry, inputs):
            grads_acc, counts_acc, sums, maxes = carry
            cam, target = inputs
            image, d_params, aux = compute_param_grads(
                scene_r, cam, target, img_w, img_h, loss_cfg, settings,
                parity_sh=not hp.full_sh, entry_capacity=entry_capacity)
            grads_acc = jax.tree.map(jnp.add, grads_acc, d_params)
            counts_acc = counts_acc + aux.num_tiles
            m = loss_metrics(image, target, loss_cfg)
            sums = {k: sums[k] + m[k] for k in sums}
            maxes = {
                "visible": jnp.maximum(
                    maxes["visible"], jnp.sum(aux.visible.astype(jnp.int32))),
                "tile_entries": jnp.maximum(
                    maxes["tile_entries"], jnp.sum(aux.num_tiles)),
            }
            return (grads_acc, counts_acc, sums, maxes), None

        sums0 = {k: jnp.float32(0.0)
                 for k in ("loss", "l1", "l2", "dssim", "psnr")}
        maxes0 = {"visible": jnp.int32(0), "tile_entries": jnp.int32(0)}
        (grads, counts, sums, maxes), _ = jax.lax.scan(
            body, (zeros, jnp.zeros((n,), jnp.int32), sums0, maxes0),
            (cams_l, targets_l))

        grads = jax.lax.psum(grads, axis)
        counts = jax.lax.psum(counts, axis)
        metrics = {k: jax.lax.psum(v, axis) / n_views
                   for k, v in sums.items()}
        metrics.update({k: jax.lax.pmax(v, axis) for k, v in maxes.items()})
        grads = jax.tree.map(lambda gr: gr / n_views, grads)

        new_params, new_opt = adam_step(params, grads, opt_r, hp, counts)
        return scene_r.with_params(new_params), new_opt, metrics

    return step(scene, opt_state, cameras, targets)


# ---------------------------------------------------------------------------
# tile-sharded rendering
# ---------------------------------------------------------------------------

def _restrict_aux_to_band(aux: SplatAux, row0: int, rows: int) -> SplatAux:
    """Clip each Gaussian's tile rect to tile rows [row0, row0+rows) and
    rebase tile ids to the band."""
    ty0 = aux.tile_min[:, 1]
    ty1 = ty0 + aux.tile_dims[:, 1] - 1
    ny0 = jnp.maximum(ty0, row0)
    ny1 = jnp.minimum(ty1, row0 + rows - 1)
    tiles_y = ny1 - ny0 + 1
    overlap = tiles_y > 0
    visible = aux.visible & overlap
    tiles_y = jnp.where(visible, tiles_y, 0)
    tile_min = jnp.stack([aux.tile_min[:, 0],
                          jnp.maximum(ny0 - row0, 0)], axis=-1)
    tile_dims = jnp.stack([aux.tile_dims[:, 0], tiles_y], axis=-1)
    num_tiles = jnp.where(visible, aux.tile_dims[:, 0] * tiles_y, 0)
    return SplatAux(depth=aux.depth, visible=visible, tile_min=tile_min,
                    tile_dims=tile_dims, num_tiles=num_tiles,
                    radius_capped=aux.radius_capped)


def render_tile_sharded(scene: GaussianScene, camera: Camera, img_w: int,
                        img_h: int, mesh: Mesh,
                        settings: RenderSettings = DEFAULT_SETTINGS,
                        gather: bool = True):
    """Render with the tile grid row-sharded across the mesh."""
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    ntx, nty = binning_ops.tile_grid(img_w, img_h, settings)
    nty_pad = -(-nty // d) * d
    rows = nty_pad // d
    band_h = rows * settings.tile_h

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P(),),
                       out_specs=P(axis), check_vma=False)
    def run(scene_r):
        b = jax.lax.axis_index(axis)
        row0 = b * rows
        attrs, aux = project_gaussians(scene_r.params(), scene_r.alive,
                                       camera, img_w, img_h, scene_r.sh_deg,
                                       settings)
        aux_b = _restrict_aux_to_band(aux, row0, rows)
        # shift splat centers into band pixel coordinates so the kernel's
        # tile->pixel mapping stays band-local
        shift = jnp.array([0.0, 1.0]) * (row0 * settings.tile_h)
        attrs_b = attrs._replace(
            center_px=attrs.center_px - shift[None, :].astype(jnp.float32))

        # full capacity per band: a concentrated scene can land all its
        # entries in one band (dividing by D would silently drop them)
        bins = binning_ops.bin_splats(aux_b, img_w, band_h, settings)
        attrs16 = raster_ops.pack_entry_attrs(attrs_b, bins.entry_gauss,
                                              bins.entry_valid, settings)
        out = raster_ops.rasterize_tiles(attrs16, bins.tile_offsets, ntx,
                                         rows, settings)
        tiles = raster_ops.tiles_to_image(out, ntx, rows, img_w, band_h,
                                          settings)
        # (band_h, W, 3), stacked over the mesh by out_specs
        return raster_ops.composite_background(tiles, settings)

    img = run(scene)  # (nty_pad*tile_h, W, 3) row-sharded
    if gather:
        img = jax.device_get(img)
    return img[:img_h] if gather else img
