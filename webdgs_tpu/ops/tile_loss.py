"""Tile-space loss kernel: the reference's loss.wgsl, fused on tiles.

The reference computes dL/dpixel in place over the rendered texture
(src/shaders/loss.wgsl:85-115) with a 5x5 edge-clamped uniform-window SSIM
(loss.wgsl:20-44).  The naive TPU port goes tiles -> (H, W, 3) image ->
loss -> re-tile for the backward rasterizer: two full-image transposes
whose 3-5-lane minor dims tile-pad to 128 lanes, plus TWO image-space SSIM
window passes (one for the gradient, one for the metrics).  This kernel
keeps everything in the rasterizer's (T, P, 8) tile layout:

* each grid step owns one tile and sees its 3x3 tile neighborhood through
  nine auto-pipelined BlockSpec inputs (full left/center/right tiles of
  its row band plus 2-pixel row slices of the bands above and below) —
  the 2-pixel halo a 5x5 window needs;
* the ground-truth window is one 20x20x3 async copy from the (H, W, 3)
  target with a border-clamped start, realigned in-register;
* border replication (the reference's clamped textureLoad) and image-crop
  alignment are one-hot row/column select matmuls built from iotas —
  exact at HIGHEST precision, 20x48 at most;
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
    """(n_out, n_src) one-hot S with S[i, src_idx[i]] = 1; S @ x selects
    rows src_idx of x.  src_idx: (n_out,) i32 in [0, n_src)."""
    n_out = src_idx.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_src), 1)
    return (col == src_idx[:, None]).astype(jnp.float32)


def _sel(mat: jax.Array, x: jax.Array):
    """Exact f32 selection matmul (one-hot rows; HIGHEST keeps x exact)."""
    return jax.lax.dot_general(
        mat, x, (((1,), (0,)), ((), ())),
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
                 dl_ref, dc_ref, dr_ref, target_ref, dpix_ref, sums_ref,
                 tscr, tsem, *, ntx: int, nty: int, img_w: int, img_h: int,
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

    # ---- ground-truth window DMA first; realigned after the pred math ----
    sx = jnp.clip(x0 - HALF, 0, img_w - hw)
    sy = jnp.clip(y0 - HALF, 0, img_h - hh)
    cp = pltpu.make_async_copy(
        target_ref.at[pl.ds(sy, hh), pl.ds(sx, hw), :], tscr, tsem)
    cp.start()

    # ---- assemble the (hh, tw*3) channel planes of the tile row band ----
    ts = jnp.clip(tx - 1, 0, ntx - 3)  # leftmost tile of the band

    def ch(ref, c, rows):
        return ref[0, :, c].reshape(rows, tw)

    def plane(c):
        mid = jnp.concatenate(
            [ch(cl_ref, c, th), ch(cc_ref, c, th), ch(cr_ref, c, th)],
            axis=1)
        top = jnp.concatenate(
            [ch(ul_ref, c, HALF), ch(uc_ref, c, HALF), ch(ur_ref, c, HALF)],
            axis=1)
        bot = jnp.concatenate(
            [ch(dl_ref, c, HALF), ch(dc_ref, c, HALF), ch(dr_ref, c, HALF)],
            axis=1)
        return jnp.concatenate([top, mid, bot], axis=0)  # (hh, 3*tw)

    t_plane = plane(OUT_T)
    # composited pred planes over the band (tiled-rasterizer.wgsl:250-252)
    pred48 = [plane(c) + bg[c] * t_plane for c in range(3)]

    # ---- clamp/select matrices (the reference's clamped textureLoad) ----
    # band columns hold global x = ts*tw .. ts*tw + 3*tw; halo column i
    # wants clamp(x0 - HALF + i, 0, img_w - 1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (hw,), 0)
    gx = jnp.clip(x0 - HALF + iw, 0, img_w - 1)
    s_col = _onehot_select(gx - ts * tw, 3 * tw)  # (hw, 3*tw)
    ih = jax.lax.broadcasted_iota(jnp.int32, (hh,), 0)
    gy = jnp.clip(y0 - HALF + ih, 0, img_h - 1)
    s_row = _onehot_select(gy - (y0 - HALF), hh)  # (hh, hh)

    # (hh, hw) clamped pred halos per channel
    pred = [_sel(s_row, _sel(s_col, p.T).T) for p in pred48]

    # ---- target realignment: loaded window starts at (sy, sx) ----
    cp.wait()
    t_col = _onehot_select(gx - sx, hw)  # (hw, hw)
    t_row = _onehot_select(gy - sy, hh)  # (hh, hh)
    targ = [_sel(t_row, _sel(t_col, tscr[:, :, c].T).T) for c in range(3)]

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

    # ---- pixel cotangent in the rasterizer's channel layout ----
    p_px = th * tw
    dpix_ref[0, :, 0:3] = jnp.stack(
        [g.reshape(p_px) for g in grad], axis=1)
    dpix_ref[0, :, 3:4] = jnp.zeros((p_px, 1), jnp.float32)
    d_t = bg[0] * grad[0] + bg[1] * grad[1] + bg[2] * grad[2]
    dpix_ref[0, :, OUT_T:OUT_T + 1] = d_t.reshape(p_px, 1)
    dpix_ref[0, :, OUT_T + 1:NUM_OUT] = jnp.zeros(
        (p_px, NUM_OUT - OUT_T - 1), jnp.float32)

    zero = jnp.zeros((), jnp.float32)
    # (1, 1, 8) block: the singleton middle dim makes the block's last two
    # dims equal the array dims, which Mosaic's layout rules require (a
    # (1, 8) block over an (n_tiles, 8) array is rejected on hardware)
    sums_ref[0] = jnp.stack(
        [s_abs, s_sq, s_ds, jnp.sum(valid),
         zero, zero, zero, zero]).reshape(1, 8)


def tile_loss_gradient(out: jax.Array, target: jax.Array, img_w: int,
                       img_h: int, ntx: int, nty: int, cfg: LossConfig,
                       settings: RenderSettings):
    """Pixel cotangent for the rasterizer's tile buffer + metric sums.

    out: (T, P, NUM_OUT) rasterizer forward tiles; target: (H, W, 3).
    Returns (dpix (T, P, NUM_OUT), metrics dict of scalars: the same keys
    as ops.loss.loss_metrics).
    """
    th, tw = settings.tile_h, settings.tile_w
    p_px = settings.tile_px
    n_tiles = ntx * nty

    def row(b):
        # block index of tile column clamp(tx-1,0,ntx-3)+b within the row
        def f(t):
            tx = t % ntx
            return t - tx + jnp.clip(tx - 1, 0, ntx - 3) + b
        return f

    def vrow(dy, b):
        def f(t):
            tx = t % ntx
            ty = jnp.clip(t // ntx + dy, 0, nty - 1)
            return ty * ntx + jnp.clip(tx - 1, 0, ntx - 3) + b
        return f

    full = lambda f: pl.BlockSpec((1, p_px, NUM_OUT),
                                  lambda t: (f(t), 0, 0))
    # 2-pixel row slices: P in blocks of HALF*tw pixels; the bottom slice
    # of the tile above is its last block, the top slice of the tile below
    # is its block 0
    n_blk = p_px // (HALF * tw)
    edge = lambda f, blk: pl.BlockSpec((1, HALF * tw, NUM_OUT),
                                       lambda t: (f(t), blk, 0))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),  # row base (1,)
        full(row(0)), full(row(1)), full(row(2)),
        edge(vrow(-1, 0), n_blk - 1), edge(vrow(-1, 1), n_blk - 1),
        edge(vrow(-1, 2), n_blk - 1),
        edge(vrow(1, 0), 0), edge(vrow(1, 1), 0), edge(vrow(1, 2), 0),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # target (H,W,3)
    ]
    out_specs = [
        pl.BlockSpec((1, p_px, NUM_OUT), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, 1, 8), lambda t: (t, 0, 0)),
    ]
    kernel = functools.partial(
        _loss_kernel, ntx=ntx, nty=nty, img_w=img_w, img_h=img_h,
        cfg=cfg, settings=settings)
    dpix, sums = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p_px, NUM_OUT), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALF, tw + 2 * HALF, 3), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=use_interpret_mode(),
    )(jnp.zeros((1,), jnp.int32), out, out, out, out, out, out, out, out,
      out, target)

    return dpix, metrics_from_sums(jnp.sum(sums[:, 0, :], axis=0), cfg)


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
    eb = HALF * settings.tile_w
    return out[-ntx:, -eb:, :], out[:ntx, :eb, :]


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
    p_px = settings.tile_px
    band_tiles = rows * ntx
    eb = HALF * tw
    # per-tile vertical-neighbor blocks: above[t] = bottom slice of the
    # tile directly above tile t, below[t] = top slice of the tile below
    # (O(band * HALF/th) bytes — the old full-band ext concatenation
    # copied the whole tile buffer once per step)
    above = jnp.concatenate([halo_top, out[:-ntx, -eb:, :]], axis=0)
    below = jnp.concatenate([out[ntx:, :eb, :], halo_bot], axis=0)

    def row(b):
        def f(t):
            tx = t % ntx
            return t - tx + jnp.clip(tx - 1, 0, ntx - 3) + b
        return f

    full = lambda f: pl.BlockSpec((1, p_px, NUM_OUT),
                                  lambda t: (f(t), 0, 0))
    edge = lambda f: pl.BlockSpec((1, eb, NUM_OUT), lambda t: (f(t), 0, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        full(row(0)), full(row(1)), full(row(2)),
        edge(row(0)), edge(row(1)), edge(row(2)),
        edge(row(0)), edge(row(1)), edge(row(2)),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    out_specs = [
        pl.BlockSpec((1, p_px, NUM_OUT), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, 1, 8), lambda t: (t, 0, 0)),
    ]
    kernel = functools.partial(
        _loss_kernel, ntx=ntx, nty=rows, img_w=img_w, img_h=img_h,
        cfg=cfg, settings=settings)
    dpix, sums = pl.pallas_call(
        kernel,
        grid=(band_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((band_tiles, p_px, NUM_OUT), jnp.float32),
            jax.ShapeDtypeStruct((band_tiles, 1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALF, tw + 2 * HALF, 3), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=use_interpret_mode(),
    )(row_base.reshape(1).astype(jnp.int32), out, out, out,
      above, above, above, below, below, below, target)
    return dpix, sums[:, 0, :]
