"""Tile-space loss kernel: the reference's loss.wgsl, fused on tiles.

The reference computes dL/dpixel in place over the rendered texture
(src/shaders/loss.wgsl:85-115) with a 5x5 edge-clamped uniform-window SSIM
(loss.wgsl:20-44).  The naive TPU port goes tiles -> (H, W, 3) image ->
loss -> re-tile for the backward rasterizer: two full-image transposes
whose 3-5-lane minor dims tile-pad to 128 lanes, plus TWO image-space SSIM
window passes (one for the gradient, one for the metrics).  This kernel
keeps everything in tile space:

* the kernel works on a CHANNEL-PLANAR view (T, NUM_OUT, th, tw) of the
  rasterizer's (T, P, NUM_OUT) buffer (one cheap XLA transpose in, one
  out).  Planar blocks mean every channel read/write inside the kernel is
  a leading-dim index yielding a clean (rows, tw) 2D vector — no
  in-register merges or splits of the pixel grid, which Mosaic's layout
  inference rejects on hardware (vector<16x16> -> vector<256x1> shape
  casts were the round-3 on-chip compile blocker);
* each grid step owns one tile and sees its 3x3 tile neighborhood through
  nine auto-pipelined BlockSpec inputs (full left/center/right tiles of
  its row band plus 2-pixel row slices of the bands above and below) —
  the 2-pixel halo a 5x5 window needs;
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
* outputs are the backward rasterizer's pixel cotangent (T, P, 8) —
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
    ntx = -(-img_w // settings.tile_w)
    hw = settings.tile_w + 2 * HALF
    hh = settings.tile_h + 2 * HALF
    return ntx >= 3 and img_w >= hw and img_h >= hh


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


def _loss_kernel(rb_ref, cl_ref, cc_ref, cr_ref, ul_ref, uc_ref, ur_ref,
                 dl_ref, dc_ref, dr_ref,
                 tcl_ref, tcc_ref, tcr_ref, tul_ref, tuc_ref, tur_ref,
                 tdl_ref, tdc_ref, tdr_ref, dpix_ref, sums_ref,
                 *, ntx: int, nty: int, img_w: int, img_h: int,
                 cfg: LossConfig, settings: RenderSettings):
    th, tw = settings.tile_h, settings.tile_w
    hh, hw = th + 2 * HALF, tw + 2 * HALF
    t = pl.program_id(0)
    tx = t % ntx
    # rb_ref: global tile-row base of this buffer (0 for a full frame; the
    # band's first tile row in the band-sharded path, a traced per-device
    # scalar) — only the kernel body needs globals (clamps, valid mask,
    # target window); the block index maps stay local to the buffer
    ty = rb_ref[0] + t // ntx
    x0 = tx * tw
    y0 = ty * th
    bg = settings.background

    # ---- assemble the (hh, tw*3) channel planes of the tile row band ----
    def band(l_ref, c_ref, r_ref, u3, d3, c):
        # planar refs: channel read = leading-dim index -> (rows, tw)
        mid = jnp.concatenate(
            [l_ref[0, c], c_ref[0, c], r_ref[0, c]], axis=1)
        top = jnp.concatenate([u3[0][0, c], u3[1][0, c], u3[2][0, c]],
                              axis=1)
        bot = jnp.concatenate([d3[0][0, c], d3[1][0, c], d3[2][0, c]],
                              axis=1)
        return jnp.concatenate([top, mid, bot], axis=0)  # (hh, 3*tw)

    def plane(c):
        return band(cl_ref, cc_ref, cr_ref, (ul_ref, uc_ref, ur_ref),
                    (dl_ref, dc_ref, dr_ref), c)

    def tplane(c):
        return band(tcl_ref, tcc_ref, tcr_ref, (tul_ref, tuc_ref, tur_ref),
                    (tdl_ref, tdc_ref, tdr_ref), c)

    ts = jnp.clip(tx - 1, 0, ntx - 3)  # leftmost tile of the band
    t_plane = plane(OUT_T)
    # composited pred planes over the band (tiled-rasterizer.wgsl:250-252)
    pred48 = [plane(c) + bg[c] * t_plane for c in range(3)]

    # ---- clamp/select matrices (the reference's clamped textureLoad) ----
    # band columns hold global x = ts*tw .. ts*tw + 3*tw; halo column i
    # wants clamp(x0 - HALF + i, 0, img_w - 1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    gx = jnp.clip(x0 - HALF + iw, 0, img_w - 1)  # (hw, 1)
    s_col = _onehot_select(gx - ts * tw, 3 * tw)  # (hw, 3*tw)
    ih = jax.lax.broadcasted_iota(jnp.int32, (hh, 1), 0)
    gy = jnp.clip(y0 - HALF + ih, 0, img_h - 1)  # (hh, 1)
    s_row = _onehot_select(gy - (y0 - HALF), hh)  # (hh, hh)

    # (hh, hw) clamped pred/target halos per channel — the target band is
    # pre-tiled into the same layout, so the SAME clamped selects apply
    pred = [_sel_rows(s_row, _sel_cols(p, s_col)) for p in pred48]
    targ = [_sel_rows(s_row, _sel_cols(tplane(c), s_col)) for c in range(3)]

    # ---- 5x5 window means + SSIM (loss.wgsl:20-72) ----
    inv = 1.0 / (WIN * WIN)
    own = (slice(HALF, HALF + th), slice(HALF, HALF + tw))
    vx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + x0 < img_w
    vy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + y0 < img_h
    valid = (vx & vy).astype(jnp.float32)

    grad = []
    s_abs = s_sq = s_ds = 0.0
    for c in range(3):
        p, q = pred[c], targ[c]
        mu_x = _box(p, th, tw) * inv
        mu_y = _box(q, th, tw) * inv
        sigma_x2 = _box(p * p, th, tw) * inv - mu_x * mu_x
        sigma_y2 = _box(q * q, th, tw) * inv - mu_y * mu_y
        sigma_xy = _box(p * q, th, tw) * inv - mu_x * mu_y
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

    # ---- pixel cotangent, planar channel layout: (th, tw) stores only ----
    zeros = jnp.zeros((th, tw), jnp.float32)
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


def _planar_tiles(out: jax.Array, settings: RenderSettings) -> jax.Array:
    """(T, P, NUM_OUT) tile buffer -> channel-planar (T, NUM_OUT, th, tw)."""
    th, tw = settings.tile_h, settings.tile_w
    return out.reshape(out.shape[0], th, tw, NUM_OUT).transpose(0, 3, 1, 2)


def _unplanar_tiles(dpixp: jax.Array, settings: RenderSettings) -> jax.Array:
    """Channel-planar (T, NUM_OUT, th, tw) -> (T, P, NUM_OUT)."""
    n = dpixp.shape[0]
    return dpixp.transpose(0, 2, 3, 1).reshape(n, settings.tile_px, NUM_OUT)


def tile_loss_gradient(out: jax.Array, target: jax.Array, img_w: int,
                       img_h: int, ntx: int, nty: int, cfg: LossConfig,
                       settings: RenderSettings):
    """Pixel cotangent for the rasterizer's tile buffer + metric sums.

    out: (T, P, NUM_OUT) rasterizer forward tiles; target: (H, W, 3).
    Returns (dpix (T, P, NUM_OUT), metrics dict of scalars: the same keys
    as ops.loss.loss_metrics).

    The full frame is the one-band special case of the band-sharded
    kernel: the frame-border "halo" slices are never read (the kernel's
    clamped selects only index rows inside the frame), so the first tile
    row's own slices stand in for them.
    """
    eb = HALF * settings.tile_w
    dpix, sums = band_tile_loss_gradient(
        out, out[:ntx, :eb, :], out[:ntx, :eb, :], target,
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
    """The two (ntx, HALF*tw, NUM_OUT) boundary slices a vertical neighbor
    band needs from this band: (bottom slice of the LAST tile row, top
    slice of the FIRST tile row).  These are what the caller ppermutes —
    the kernel reads nothing else of the neighbor bands, so shipping full
    tile rows would move tile_h/HALF x the required ICI bytes."""
    th, tw = settings.tile_h, settings.tile_w
    t4 = out.reshape(out.shape[0], th, tw, NUM_OUT)
    bot, top = t4[-ntx:, -HALF:, :, :], t4[:ntx, :HALF, :, :]
    # shape from the slice, not ntx: callers may pass an empty buffer when
    # probing past a frame border (the slices are discarded there)
    return (bot.reshape(bot.shape[0], HALF * tw, NUM_OUT),
            top.reshape(top.shape[0], HALF * tw, NUM_OUT))


def band_tile_loss_gradient(out: jax.Array, halo_top: jax.Array,
                            halo_bot: jax.Array, target: jax.Array,
                            row_base: jax.Array, img_w: int, img_h: int,
                            ntx: int, rows: int, cfg: LossConfig,
                            settings: RenderSettings):
    """Band-sharded variant: pixel cotangent for ONE device's band of tile
    rows, given the 2-pixel boundary slices from the neighbor bands.

    out: (rows*ntx, P, NUM_OUT) this band's rasterizer tiles; halo_top /
    halo_bot: (ntx, HALF*tw, NUM_OUT) — the band above's bottom slice and
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

    Returns (dpix (rows*ntx, P, NUM_OUT), sums (rows*ntx, 8) per-tile
    metric partials — psum ``sums.sum(0)`` over the band axis and feed
    :func:`metrics_from_sums`).
    """
    th, tw = settings.tile_h, settings.tile_w
    band_tiles = rows * ntx
    outp = _planar_tiles(out, settings)

    # ---- target -> planar tile layout (3-channel analogue of outp) ----
    # One cheap XLA re-tile per call; every kernel-side target access then
    # rides tile-aligned BlockSpecs (Mosaic rejects the unaligned window
    # DMA this replaces).  Pad is zeros: the kernel's clamped selects never
    # read past the frame border.
    glob_ty = -(-img_h // th)
    targp = target.transpose(2, 0, 1)  # (3, H, W)
    targp = jnp.pad(targp, ((0, 0), (0, glob_ty * th - img_h),
                            (0, ntx * tw - img_w)))
    tt = targp.reshape(3, glob_ty, th, ntx, tw).transpose(
        1, 3, 0, 2, 4).reshape(glob_ty * ntx, 3, th, tw)
    if band_tiles > tt.shape[0]:  # padding bands past the frame
        tt = jnp.pad(tt, ((0, band_tiles - tt.shape[0]), (0, 0), (0, 0),
                          (0, 0)))
    rb = row_base.reshape(()).astype(jnp.int32)
    band_t = jax.lax.dynamic_slice_in_dim(tt, rb * ntx, band_tiles, 0)
    # neighbor-row boundary slices (replicated target: no exchange needed;
    # out-of-frame starts clamp to in-frame rows whose content the kernel's
    # border-clamped selects never read)
    above_row = jax.lax.dynamic_slice_in_dim(
        tt, (rb - 1) * ntx, ntx, 0)[:, :, -HALF:, :]
    below_row = jax.lax.dynamic_slice_in_dim(
        tt, (rb + rows) * ntx, ntx, 0)[:, :, :HALF, :]
    above_t = jnp.concatenate([above_row, band_t[:-ntx, :, -HALF:, :]],
                              axis=0)
    below_t = jnp.concatenate([band_t[ntx:, :, :HALF, :], below_row],
                              axis=0)

    def halo_planar(h):
        # (ntx, HALF*tw, NUM_OUT) -> (ntx, NUM_OUT, HALF, tw)
        return h.reshape(ntx, HALF, tw, NUM_OUT).transpose(0, 3, 1, 2)

    # per-tile vertical-neighbor blocks: above[t] = bottom slice of the
    # tile directly above tile t, below[t] = top slice of the tile below
    # (O(band * HALF/th) bytes — the old full-band ext concatenation
    # copied the whole tile buffer once per step)
    above = jnp.concatenate(
        [halo_planar(halo_top), outp[:-ntx, :, -HALF:, :]], axis=0)
    below = jnp.concatenate(
        [outp[ntx:, :, :HALF, :], halo_planar(halo_bot)], axis=0)

    def row(b):
        def f(t):
            tx = t % ntx
            return t - tx + jnp.clip(tx - 1, 0, ntx - 3) + b
        return f

    blk = lambda ch, h, f: pl.BlockSpec((1, ch, h, tw),
                                        lambda t, _f=f: (_f(t), 0, 0, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        blk(NUM_OUT, th, row(0)), blk(NUM_OUT, th, row(1)),
        blk(NUM_OUT, th, row(2)),
        blk(NUM_OUT, HALF, row(0)), blk(NUM_OUT, HALF, row(1)),
        blk(NUM_OUT, HALF, row(2)),
        blk(NUM_OUT, HALF, row(0)), blk(NUM_OUT, HALF, row(1)),
        blk(NUM_OUT, HALF, row(2)),
        blk(3, th, row(0)), blk(3, th, row(1)), blk(3, th, row(2)),
        blk(3, HALF, row(0)), blk(3, HALF, row(1)), blk(3, HALF, row(2)),
        blk(3, HALF, row(0)), blk(3, HALF, row(1)), blk(3, HALF, row(2)),
    ]
    out_specs = [
        pl.BlockSpec((1, NUM_OUT, th, tw), lambda t: (t, 0, 0, 0)),
        pl.BlockSpec((1, 1, 8), lambda t: (t, 0, 0)),
    ]
    kernel = functools.partial(
        _loss_kernel, ntx=ntx, nty=rows, img_w=img_w, img_h=img_h,
        cfg=cfg, settings=settings)
    dpixp, sums = pl.pallas_call(
        kernel,
        grid=(band_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((band_tiles, NUM_OUT, th, tw), jnp.float32),
            jax.ShapeDtypeStruct((band_tiles, 1, 8), jnp.float32),
        ],
        interpret=use_interpret_mode(),
    )(rb.reshape(1), outp, outp, outp,
      above, above, above, below, below, below,
      band_t, band_t, band_t, above_t, above_t, above_t,
      below_t, below_t, below_t)
    return _unplanar_tiles(dpixp, settings), sums[:, 0, :]
