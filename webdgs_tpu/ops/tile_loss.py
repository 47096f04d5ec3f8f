"""Tile-space loss kernel: the reference's loss.wgsl, fused on tiles.

The reference computes dL/dpixel in place over the rendered texture
(src/shaders/loss.wgsl:85-115) with a 5x5 edge-clamped uniform-window SSIM
(loss.wgsl:20-44).  The naive TPU port goes tiles -> (H, W, 3) image ->
loss -> re-tile for the backward rasterizer: two full-image transposes
whose 3-5-lane minor dims tile-pad to 128 lanes, plus TWO image-space SSIM
window passes (one for the gradient, one for the metrics).  This kernel
keeps everything in tile space:

* the kernel works on a ROW-PLANAR view (rows, NUM_OUT, th, ntx*tw) of
  the rasterizer's planar (T, NUM_OUT, P) buffer (one cheap XLA
  transpose in,
  one out).  Planar blocks mean every channel read/write inside the
  kernel is a leading-dim index yielding a clean (th, W) 2D vector — no
  in-register merges or splits of the pixel grid, which Mosaic's layout
  inference rejects on hardware;
* each grid step owns one full TILE ROW (a (th, ntx*tw) pixel band): a
  per-tile grid paid ~2.6 us of sequential grid-step overhead x 1900
  tiles = 5 ms at 800x600 on a v5e chip, vs 38 row steps here.  The
  vertical 2-pixel halo a 5x5 window needs comes from two neighbor-row
  edge slices (auto-pipelined BlockSpec inputs);
* the ground truth rides the SAME nine-block neighborhood: the target is
  re-tiled once per call into the planar tile layout (one cheap XLA
  transpose of a 3-channel image) and enters through auto-pipelined
  BlockSpecs, so every target access is tile-aligned by construction (a
  manual 3x20x20 HBM window DMA violates Mosaic's (8,128) slice-alignment
  rule on hardware — the round-3 on-chip compile blocker);
* border replication (the reference's clamped textureLoad) and image-crop
  alignment are one-hot row/column select matmuls built from iotas —
  exact at HIGHEST precision, 20x48 at most; column selection contracts
  on the one-hot's source dim directly so no vector transposes are
  needed;
* window means are shifted-add box filters (exact f32, no MXU);
* outputs are the backward rasterizer's pixel cotangent (T, 8, P) —
  composite-background chain rule folded in: d_rgb = grad, d_T = grad.bg
  — and per-tile metric partial sums (|diff|, diff^2, dssim, valid count),
  so the scalar metrics cost no second SSIM pass.

Requires ntx >= 3 and img_w, img_h >= HALO_W; smaller frames fall back to
the image-space path (ops/loss.py), which remains the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webdgs_tpu.config import RenderSettings, use_interpret_mode
from webdgs_tpu.ops.loss import LossConfig
from webdgs_tpu.ops.rasterize import NUM_OUT, OUT_T

HALF = 2  # 5x5 window
WIN = 2 * HALF + 1


def supports_tile_loss(img_w: int, img_h: int,
                       settings: RenderSettings) -> bool:
    # The row-band kernel's clamped selects handle any tile count and any
    # frame border; only frames smaller than the 5x5 SSIM window itself
    # fall back to the image-space oracle path (ops/loss.py).
    return img_w >= WIN and img_h >= WIN


def _onehot_select(src_idx: jax.Array, n_src: int):
    """(n_out, n_src) one-hot S with S[i, src_idx[i]] = 1.  src_idx:
    (n_out, 1) i32 in [0, n_src) — 2D so every vector stays 2D (1D iotas
    and (n,) -> (n, 1) casts are rejected by Mosaic on hardware)."""
    n_out = src_idx.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_src), 1)
    return (col == src_idx).astype(jnp.float32)


def _sel_rows(mat: jax.Array, x: jax.Array):
    """S @ x: row i of the result is row src_idx[i] of x (exact f32)."""
    return jax.lax.dot_general(
        mat, x, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _sel_cols(x: jax.Array, mat: jax.Array):
    """x @ S^T: column j of the result is column src_idx[j] of x —
    contraction on the one-hot's source dim, no transposes."""
    return jax.lax.dot_general(
        x, mat, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _box(x: jax.Array, th: int, tw: int):
    """5x5 box sum: (th+4, tw+4) -> (th, tw) shifted adds (exact f32)."""
    r = x[:, 0:tw]
    for d in range(1, WIN):
        r = r + x[:, d:tw + d]
    s = r[0:th, :]
    for d in range(1, WIN):
        s = s + r[d:th + d, :]
    return s


def _loss_kernel(rb_ref, c_ref, u_ref, d_ref, tc_ref, tu_ref, td_ref,
                 dpix_ref, sums_ref,
                 *, ntx: int, nty: int, img_w: int, img_h: int,
                 cfg: LossConfig, settings: RenderSettings):
    th, tw = settings.tile_h, settings.tile_w
    wp = ntx * tw  # full row width incl. tile-grid padding
    hh = th + 2 * HALF
    r = pl.program_id(0)
    # rb_ref: global tile-row base of this buffer (0 for a full frame; the
    # band's first tile row in the band-sharded path, a traced per-device
    # scalar) — only the kernel body needs globals (clamps, valid mask)
    y0 = (rb_ref[0] + r) * th
    bg = settings.background

    # ---- (hh, wp) channel planes of the pixel-row band ----
    def plane(cref, uref, dref, c):
        return jnp.concatenate([uref[0, c], cref[0, c], dref[0, c]], axis=0)

    t_plane = plane(c_ref, u_ref, d_ref, OUT_T)
    # composited pred planes (tiled-rasterizer.wgsl:250-252)
    pred_row = [plane(c_ref, u_ref, d_ref, c) + bg[c] * t_plane
                for c in range(3)]
    targ_row = [plane(tc_ref, tu_ref, td_ref, c) for c in range(3)]

    # ---- clamp/select matrices (the reference's clamped textureLoad) ----
    # halo column i wants clamp(i - HALF, 0, img_w - 1): one matrix serves
    # the frame's left/right edges AND the tile-grid padding columns
    iw = jax.lax.broadcasted_iota(jnp.int32, (wp + 2 * HALF, 1), 0)
    gx = jnp.clip(iw - HALF, 0, img_w - 1)  # (wp+4, 1)
    s_col = _onehot_select(gx, wp)  # (wp+4, wp)
    ih = jax.lax.broadcasted_iota(jnp.int32, (hh, 1), 0)
    gy = jnp.clip(y0 - HALF + ih, 0, img_h - 1)  # (hh, 1)
    s_row = _onehot_select(gy - (y0 - HALF), hh)  # (hh, hh)

    # (hh, wp+4) clamped pred/target halos per channel — the target band is
    # pre-tiled into the same layout, so the SAME clamped selects apply
    pred = [_sel_rows(s_row, _sel_cols(p, s_col)) for p in pred_row]
    targ = [_sel_rows(s_row, _sel_cols(q, s_col)) for q in targ_row]

    # ---- 5x5 window means + SSIM (loss.wgsl:20-72) ----
    inv = 1.0 / (WIN * WIN)
    own = (slice(HALF, HALF + th), slice(HALF, HALF + wp))
    vx = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1) < img_w
    vy = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0) + y0 < img_h
    valid = (vx & vy).astype(jnp.float32)

    grad = []
    s_abs = s_sq = s_ds = 0.0
    for c in range(3):
        p, q = pred[c], targ[c]
        mu_x = _box(p, th, wp) * inv
        mu_y = _box(q, th, wp) * inv
        sigma_x2 = _box(p * p, th, wp) * inv - mu_x * mu_x
        sigma_y2 = _box(q * q, th, wp) * inv - mu_y * mu_y
        sigma_xy = _box(p * q, th, wp) * inv - mu_x * mu_y
        num = (2 * mu_x * mu_y + cfg.c1) * (2 * sigma_xy + cfg.c2)
        den = ((mu_x * mu_x + mu_y * mu_y + cfg.c1)
               * (sigma_x2 + sigma_y2 + cfg.c2))
        dssim = (1.0 - num / den) * 0.5

        diff = p[own] - q[own]
        g = cfg.lambda_l1 * jnp.sign(diff) + cfg.lambda_l2 * diff
        g = g + cfg.lambda_dssim * dssim * diff
        grad.append(g * valid)
        s_abs = s_abs + jnp.sum(jnp.abs(diff) * valid)
        s_sq = s_sq + jnp.sum(diff * diff * valid)
        s_ds = s_ds + jnp.sum(dssim * valid)

    # ---- pixel cotangent, row-planar channel layout ----
    zeros = jnp.zeros((th, wp), jnp.float32)
    for c in range(3):
        dpix_ref[0, c] = grad[c]
    d_t = bg[0] * grad[0] + bg[1] * grad[1] + bg[2] * grad[2]
    for c in range(3, NUM_OUT):
        dpix_ref[0, c] = d_t if c == OUT_T else zeros

    # (1, 1, 8) block: the singleton middle dim makes the block's last two
    # dims equal the array dims, which Mosaic's layout rules require (a
    # (1, 8) block over an (n_tiles, 8) array is rejected on hardware).
    # Row built 2D-native: scalar -> (1, 1) broadcast + lane concat.
    z11 = jnp.zeros((1, 1), jnp.float32)
    sums_ref[0] = jnp.concatenate(
        [jnp.full((1, 1), s_abs, jnp.float32),
         jnp.full((1, 1), s_sq, jnp.float32),
         jnp.full((1, 1), s_ds, jnp.float32),
         jnp.full((1, 1), jnp.sum(valid), jnp.float32),
         z11, z11, z11, z11], axis=1)


def _rowplanar_tiles(out: jax.Array, ntx: int,
                     settings: RenderSettings) -> jax.Array:
    """(T, C, P) channel-planar tile buffer -> row-planar
    (rows, C, th, ntx*tw): one full-width pixel band per tile row."""
    th, tw = settings.tile_h, settings.tile_w
    c = out.shape[1]
    rows = out.shape[0] // ntx
    t5 = out.reshape(rows, ntx, c, th, tw)
    return t5.transpose(0, 2, 3, 1, 4).reshape(rows, c, th, ntx * tw)


def _unrowplanar_tiles(dpixp: jax.Array, ntx: int,
                       settings: RenderSettings) -> jax.Array:
    """Row-planar (rows, C, th, ntx*tw) -> (T, C, P)."""
    th, tw = settings.tile_h, settings.tile_w
    rows, c = dpixp.shape[0], dpixp.shape[1]
    t5 = dpixp.reshape(rows, c, th, ntx, tw)
    return t5.transpose(0, 3, 1, 2, 4).reshape(rows * ntx, c, th * tw)


def tile_loss_gradient(out: jax.Array, target: jax.Array, img_w: int,
                       img_h: int, ntx: int, nty: int, cfg: LossConfig,
                       settings: RenderSettings):
    """Pixel cotangent for the rasterizer's tile buffer + metric sums.

    out: (T, NUM_OUT, P) planar rasterizer forward tiles; target:
    (H, W, 3).  Returns (dpix (T, NUM_OUT, P), metrics dict of scalars: the same keys
    as ops.loss.loss_metrics).

    The full frame is the one-band special case of the band-sharded
    kernel: the frame-border "halo" slices are never read (the kernel's
    clamped selects only index rows inside the frame), so the first tile
    row's own slices stand in for them.
    """
    eb = HALF * settings.tile_w
    dpix, sums = band_tile_loss_gradient(
        out, out[:ntx, :, :eb], out[:ntx, :, :eb], target,
        jnp.zeros((), jnp.int32), img_w, img_h, ntx, nty, cfg, settings)
    return dpix, metrics_from_sums(jnp.sum(sums, axis=0), cfg)


def metrics_from_sums(tot: jax.Array, cfg: LossConfig) -> dict:
    """Scalar metrics (the ``loss_metrics`` keys) from summed per-tile
    partials ``[sum|diff|, sum diff^2, sum dssim, valid px, 0...]``."""
    n = jnp.maximum(tot[3] * 3.0, 1.0)
    l1 = tot[0] / n
    l2 = tot[1] / n
    dssim = tot[2] / n
    return {
        "l1": l1,
        "l2": l2,
        "dssim": dssim,
        "loss": (cfg.lambda_l1 * l1 + cfg.lambda_l2 * l2
                 + cfg.lambda_dssim * dssim),
        "psnr": -10.0 * jnp.log10(jnp.maximum(l2, 1e-12)),
    }


def halo_slices(out: jax.Array, ntx: int, settings: RenderSettings):
    """The two (ntx, NUM_OUT, HALF*tw) boundary slices a vertical neighbor
    band needs from this band: (bottom slice of the LAST tile row, top
    slice of the FIRST tile row).  These are what the caller ppermutes —
    the kernel reads nothing else of the neighbor bands, so shipping full
    tile rows would move tile_h/HALF x the required ICI bytes."""
    th, tw = settings.tile_h, settings.tile_w
    t4 = out.reshape(out.shape[0], NUM_OUT, th, tw)
    bot, top = t4[-ntx:, :, -HALF:, :], t4[:ntx, :, :HALF, :]
    # shape from the slice, not ntx: callers may pass an empty buffer when
    # probing past a frame border (the slices are discarded there)
    return (bot.reshape(bot.shape[0], NUM_OUT, HALF * tw),
            top.reshape(top.shape[0], NUM_OUT, HALF * tw))


def band_tile_loss_gradient(out: jax.Array, halo_top: jax.Array,
                            halo_bot: jax.Array, target: jax.Array,
                            row_base: jax.Array, img_w: int, img_h: int,
                            ntx: int, rows: int, cfg: LossConfig,
                            settings: RenderSettings):
    """Band-sharded variant: pixel cotangent for ONE device's band of tile
    rows, given the 2-pixel boundary slices from the neighbor bands.

    out: (rows*ntx, NUM_OUT, P) this band's planar rasterizer tiles;
    halo_top / halo_bot: (ntx, NUM_OUT, HALF*tw) — the band above's bottom slice and
    the band below's top slice (:func:`halo_slices`, ppermuted over the
    band axis by the caller).  ``row_base``: global tile row of ``out``'s
    first row — a traced per-device scalar (enters the kernel through
    SMEM; block index maps stay band-local).

    At frame borders the halo CONTENT is never read: the kernel's
    edge-clamped selects (the reference's clamped textureLoad,
    loss.wgsl:20-28) only index rows inside [0, img_h), so the wrap-around
    slices a circular ppermute delivers to bands 0 and D-1 are harmless.
    Rows of padding bands beyond the frame produce zero gradient and zero
    metric sums (their valid mask is empty).

    Returns (dpix (rows*ntx, NUM_OUT, P), sums (rows, 8) per-tile-row
    metric partials — psum ``sums.sum(0)`` over the band axis and feed
    :func:`metrics_from_sums`).
    """
    th, tw = settings.tile_h, settings.tile_w
    wp = ntx * tw
    outp = _rowplanar_tiles(out, ntx, settings)  # (rows, 8, th, wp)

    # ---- target -> row-planar layout (3-channel analogue of outp) ----
    # One cheap XLA re-tile per call; every kernel-side target access then
    # rides tile-aligned BlockSpecs (Mosaic rejects the unaligned window
    # DMA this replaces).  Pad is zeros: the kernel's clamped selects never
    # read past the frame border.
    glob_ty = -(-img_h // th)
    targp = target.transpose(2, 0, 1)  # (3, H, W)
    targp = jnp.pad(targp, ((0, 0), (0, glob_ty * th - img_h),
                            (0, wp - img_w)))
    tt = targp.reshape(3, glob_ty, th, wp).transpose(1, 0, 2, 3)
    if rows > tt.shape[0]:  # padding bands past the frame
        tt = jnp.pad(tt, ((0, rows - tt.shape[0]), (0, 0), (0, 0), (0, 0)))
    rb = row_base.reshape(()).astype(jnp.int32)
    band_t = jax.lax.dynamic_slice_in_dim(tt, rb, rows, 0)
    # neighbor-row boundary slices (replicated target: no exchange needed;
    # out-of-frame starts clamp to in-frame rows whose content the kernel's
    # border-clamped selects never read)
    above_rt = jax.lax.dynamic_slice_in_dim(tt, rb - 1, 1, 0)[:, :, -HALF:]
    below_rt = jax.lax.dynamic_slice_in_dim(tt, rb + rows, 1, 0)[:, :, :HALF]
    above_t = jnp.concatenate([above_rt, band_t[:-1, :, -HALF:, :]], axis=0)
    below_t = jnp.concatenate([band_t[1:, :, :HALF, :], below_rt], axis=0)

    def halo_rowplanar(h):
        # (ntx, NUM_OUT, HALF*tw) -> (1, NUM_OUT, HALF, wp)
        h4 = h.reshape(ntx, NUM_OUT, HALF, tw)
        return h4.transpose(1, 2, 0, 3).reshape(1, NUM_OUT, HALF, wp)

    # per-row vertical-neighbor slices: above[r] = bottom 2 px of the tile
    # row above, below[r] = top 2 px of the row below
    above = jnp.concatenate(
        [halo_rowplanar(halo_top), outp[:-1, :, -HALF:, :]], axis=0)
    below = jnp.concatenate(
        [outp[1:, :, :HALF, :], halo_rowplanar(halo_bot)], axis=0)

    blk = lambda ch, h: pl.BlockSpec((1, ch, h, wp),
                                     lambda r: (r, 0, 0, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        blk(NUM_OUT, th), blk(NUM_OUT, HALF), blk(NUM_OUT, HALF),
        blk(3, th), blk(3, HALF), blk(3, HALF),
    ]
    out_specs = [
        pl.BlockSpec((1, NUM_OUT, th, wp), lambda r: (r, 0, 0, 0)),
        pl.BlockSpec((1, 1, 8), lambda r: (r, 0, 0)),
    ]
    kernel = functools.partial(
        _loss_kernel, ntx=ntx, nty=rows, img_w=img_w, img_h=img_h,
        cfg=cfg, settings=settings)
    dpixp, sums = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((rows, NUM_OUT, th, wp), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1, 8), jnp.float32),
        ],
        interpret=use_interpret_mode(),
    )(rb.reshape(1), outp, above, below, band_t, above_t, below_t)
    return _unrowplanar_tiles(dpixp, ntx, settings), sums[:, 0, :]
