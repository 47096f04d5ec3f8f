"""EWA projection: 3D Gaussians -> screen-space splats.

Re-implements the math of the reference's ``count_main`` kernel
(src/shaders/tiled-forward.wgsl:162-294) and its covariance helpers
(src/shaders/common.wgsl:44-108) as one fused, vectorized JAX function over
all N Gaussians.  It is fully differentiable — the reference's 304-line
hand-derived geometry backward (src/shaders/tiled-backward.wgsl) is replaced
by ``jax.vjp`` of this function.

Semantics preserved (file:line into /root/reference):
  * NDC cull at +-1.2 in xy and [0,1] in z      (tiled-forward.wgsl:198-201)
  * cov3D = R S^2 R^T from an *unnormalized* quaternion (common.wgsl:44-68 —
    the reference never normalizes in the forward path; Adam renormalizes
    after each update)
  * EWA cov2D with the 1.3*fov frustum clamp and +0.3 diagonal dilation
    (common.wgsl:71-108)
  * opacity-aware extent t = 2*ln(sigmoid(op)*128), SnugBox extents, screen
    radius cap (default 128 px)                  (tiled-forward.wgsl:222-234)
  * 2 px tile margin, viewport intersection, <=2048 tiles per Gaussian
    (tiled-forward.wgsl:238-277)
  * SH color from the normalized (mean - camera) direction, clamped to [0,1]
    on write                                     (tiled-forward.wgsl:258-285)

Known deviations (documented in ARCHITECTURE.md):
  * f32 throughout — the reference round-trips centers/extents through f16 so
    that its separate count/emit kernels agree (SURVEY.md Q4); we compute the
    tile range once, so no quantization is needed.
  * gradients come from autodiff, which fixes the reference's sign error in
    the y-component of the position gradient through the projection
    (tiled-backward.wgsl:92 multiplies dL/dpx by +0.5*viewport for both axes,
    but the forward y mapping is px_y = (-0.5*ndc_y + 0.5)*H).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from webdgs_tpu.config import RenderSettings
from webdgs_tpu.core.camera import Camera
from webdgs_tpu.ops.sh import eval_sh_color

OPACITY_THRESHOLD = 128.0  # tiled-forward.wgsl:223
TILE_MARGIN_PX = 2.0  # tiled-forward.wgsl:238
NDC_CULL = 1.2  # tiled-forward.wgsl:198


class SplatAttrs(NamedTuple):
    """Differentiable per-Gaussian screen-space attributes."""

    center_px: jax.Array  # (N, 2)
    conic: jax.Array  # (N, 3) (a, b, c) of the inverse 2D covariance
    color: jax.Array  # (N, 3) in [0, 1]
    opacity: jax.Array  # (N,) sigmoid-space
    extents: jax.Array  # (N, 2) capped SnugBox half-extents in px


class SplatAux(NamedTuple):
    """Non-differentiable binning metadata."""

    depth: jax.Array  # (N,) view-space z
    visible: jax.Array  # (N,) bool
    tile_min: jax.Array  # (N, 2) i32 (tx_min, ty_min)
    tile_dims: jax.Array  # (N, 2) i32 (tiles_x, tiles_y)
    num_tiles: jax.Array  # (N,) i32, 0 when culled
    radius_capped: jax.Array  # (N,) bool — extent hit max_splat_radius_px


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(N,4) (w,x,y,z) -> (N,3,3); standard form, no normalization
    (common.wgsl:44-53 builds the transpose column-wise; the resulting
    covariance R S^2 R^T is this standard matrix)."""
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def covariance3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """Sigma = R diag(s^2) R^T, (N,3,3) (common.wgsl:44-68)."""
    rot = quat_to_rotmat(quats)
    return jnp.einsum("nij,nj,nkj->nik", rot, scales * scales, rot)


def project_gaussians(
    params: dict[str, jax.Array],
    alive: jax.Array,
    camera: Camera,
    img_w: int,
    img_h: int,
    sh_deg: int,
    settings: RenderSettings,
    detach_color: bool = False,
) -> tuple[SplatAttrs, SplatAux]:
    """``detach_color``: stop gradients through the SH color evaluation
    (both into the coefficients and into positions via the view direction).
    The reference's backward has no color->geometry path and its SH DC
    gradient is routed separately (tiled-backward.wgsl; SURVEY.md Q2), so
    parity training sets this and skips the whole SH backward."""
    # geometry must be f32-exact: the MXU's default single-pass bf16
    # matmuls would round splat centers by ~0.4% (pixels of error)
    with jax.default_matmul_precision("highest"):
        return _project_gaussians_impl(params, alive, camera, img_w, img_h,
                                       sh_deg, settings, detach_color)


def _project_gaussians_impl(params, alive, camera, img_w, img_h, sh_deg,
                            settings, detach_color):
    means = params["means"]
    quats = params["quats"]
    log_scales = params["log_scales"]
    opacity_logits = params["opacity_logits"]
    sh = params["sh"]

    view, proj = camera.view, camera.proj
    viewport = jnp.array([img_w, img_h], dtype=jnp.float32)
    focal_x, focal_y = camera.focal[0], camera.focal[1]

    # --- view / clip transform (tiled-forward.wgsl:188-201) ---
    t = means @ view[:3, :3].T + view[:3, 3]  # view-space position
    clip = t @ proj[:, :3].T + proj[:, 3]  # (N, 4)
    w = clip[:, 3]
    w_ok = w != 0.0
    w_safe = jnp.where(w_ok, w, 1.0)
    ndc = clip[:, :3] / w_safe[:, None]

    in_frustum = (
        (ndc[:, 0] >= -NDC_CULL) & (ndc[:, 0] <= NDC_CULL)
        & (ndc[:, 1] >= -NDC_CULL) & (ndc[:, 1] <= NDC_CULL)
        & (ndc[:, 2] >= 0.0) & (ndc[:, 2] <= 1.0)
        & w_ok & alive
    )

    # --- 3D covariance (common.wgsl:44-68) ---
    scales = jnp.exp(log_scales)
    cov3d = covariance3d(quats, scales)

    # --- EWA 2D covariance (common.wgsl:71-108) ---
    tz = t[:, 2]
    tz_safe = jnp.where(in_frustum, tz, 1.0)
    lim_x = 1.3 * (viewport[0] * 0.5) / focal_x
    lim_y = 1.3 * (viewport[1] * 0.5) / focal_y
    tx = jnp.clip(t[:, 0] / tz_safe, -lim_x, lim_x) * tz_safe
    ty = jnp.clip(t[:, 1] / tz_safe, -lim_y, lim_y) * tz_safe

    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    # J is the 2x3 Jacobian of the perspective projection at the clamped point.
    jmat = jnp.stack([
        jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], -1),
        jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], -1),
    ], axis=-2)  # (N, 2, 3)
    amat = jnp.einsum("nij,jk->nik", jmat, view[:3, :3])  # (N, 2, 3)
    cov2d = jnp.einsum("nij,njk,nlk->nil", amat, cov3d, amat)  # (N, 2, 2)
    cov_a = cov2d[:, 0, 0] + 0.3
    cov_b = cov2d[:, 0, 1]
    cov_c = cov2d[:, 1, 1] + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic_a = cov_c / det_safe
    conic_b = -cov_b / det_safe
    conic_c = cov_a / det_safe
    disc = conic_b * conic_b - conic_a * conic_c
    ellipse_ok = (conic_a > 0.0) & (conic_c > 0.0) & (disc < 0.0)

    # --- opacity-aware extent (tiled-forward.wgsl:222-234) ---
    opacity = jax.nn.sigmoid(opacity_logits)
    t_pow = 2.0 * jnp.log(jnp.maximum(opacity * OPACITY_THRESHOLD, 1e-12))
    opacity_ok = t_pow > 0.0

    valid_so_far = in_frustum & det_ok & ellipse_ok & opacity_ok
    neg_disc = jnp.where(valid_so_far, -disc, 1.0)
    t_pos = jnp.where(valid_so_far, t_pow, 1.0)
    x_extent = jnp.sqrt(t_pos * jnp.where(valid_so_far, conic_c, 1.0) / neg_disc)
    y_extent = jnp.sqrt(t_pos * jnp.where(valid_so_far, conic_a, 1.0) / neg_disc)

    cap = settings.max_splat_radius_px if settings.max_splat_radius_px > 0 else 1e9
    radius_capped = jnp.maximum(x_extent, y_extent) >= cap
    x_extent_cap = jnp.minimum(x_extent, cap)
    y_extent_cap = jnp.minimum(y_extent, cap)
    extents = jnp.stack([x_extent_cap, y_extent_cap], axis=-1)

    # --- pixel center and tile range (tiled-forward.wgsl:236-277) ---
    center_px = (ndc[:, :2] * jnp.array([0.5, -0.5]) + 0.5) * viewport

    ext_sg = jax.lax.stop_gradient(extents)
    c_sg = jax.lax.stop_gradient(center_px)
    bbox_min_raw = c_sg - ext_sg - TILE_MARGIN_PX
    bbox_max_raw = c_sg + ext_sg + TILE_MARGIN_PX
    on_screen = (
        (bbox_max_raw[:, 0] >= 0.0) & (bbox_max_raw[:, 1] >= 0.0)
        & (bbox_min_raw[:, 0] < viewport[0]) & (bbox_min_raw[:, 1] < viewport[1])
    )
    bbox_min = jnp.maximum(bbox_min_raw, 0.0)
    bbox_max = jnp.minimum(bbox_max_raw, viewport - 1.0)
    bbox_ok = (bbox_max[:, 0] >= bbox_min[:, 0]) & (bbox_max[:, 1] >= bbox_min[:, 1])

    num_tiles_x = -(-img_w // settings.tile_w)
    num_tiles_y = -(-img_h // settings.tile_h)
    tile_min_x = (bbox_min[:, 0].astype(jnp.int32)) // settings.tile_w
    tile_min_y = (bbox_min[:, 1].astype(jnp.int32)) // settings.tile_h
    tile_max_x = jnp.minimum(bbox_max[:, 0].astype(jnp.int32) // settings.tile_w,
                             num_tiles_x - 1)
    tile_max_y = jnp.minimum(bbox_max[:, 1].astype(jnp.int32) // settings.tile_h,
                             num_tiles_y - 1)
    tiles_x = tile_max_x - tile_min_x + 1
    tiles_y = tile_max_y - tile_min_y + 1
    num_tiles = tiles_x * tiles_y
    tiles_ok = num_tiles <= settings.max_tiles_per_gaussian

    visible = valid_so_far & on_screen & bbox_ok & tiles_ok
    num_tiles = jnp.where(visible, num_tiles, 0)

    # --- SH color (tiled-forward.wgsl:258-261, clamp at :284-285) ---
    rel = means - camera.cam_pos
    norm = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1, keepdims=True), 1e-24))
    sh_in, dirs = sh, rel / norm
    if detach_color:
        sh_in = jax.lax.stop_gradient(sh_in)
        dirs = jax.lax.stop_gradient(dirs)
    color = jnp.clip(eval_sh_color(sh_in, dirs, sh_deg), 0.0, 1.0)

    attrs = SplatAttrs(
        center_px=center_px,
        conic=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        color=color,
        opacity=opacity,
        extents=extents,
    )
    aux = SplatAux(
        depth=jax.lax.stop_gradient(tz),
        visible=visible,
        tile_min=jnp.stack([tile_min_x, tile_min_y], axis=-1),
        tile_dims=jnp.stack([tiles_x, tiles_y], axis=-1),
        num_tiles=num_tiles,
        radius_capped=radius_capped & visible,
    )
    return attrs, aux
