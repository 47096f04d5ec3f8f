"""Tiled alpha-compositing rasterizer — Pallas TPU forward/backward kernels.

This replaces the reference's per-pixel sequential loops
(src/shaders/tiled-rasterizer.wgsl:82-273 forward,
src/shaders/tiled-backward-rasterize.wgsl:34-172 backward) with a dense
formulation that maps onto the TPU's vector/matrix units.

Key identity — *saturation as thresholding*: the reference skips a splat for
a pixel once accumulated alpha exceeds 0.99 (tiled-rasterizer.wgsl:224),
i.e. once transmittance T < 0.01.  Because T is monotonically
non-increasing along the depth-sorted splat list, the sequentially-gated
loop is exactly equivalent to

    T_j   = prod_{k<j} (1 - a_k)          (ungated, exclusive)
    incl_j = [T_j >= 0.01]                 (a prefix property)
    C      = sum_j c_j * a_j * T_j * incl_j

so compositing becomes a *cumulative sum of log(1-a) along the splat axis*
plus elementwise math — fully parallel over (pixel, splat) pairs.  Within a
chunk of K splats the exclusive prefix is computed either by a strictly
triangular (K,K) matmul on the MXU or by a Hillis–Steele lane scan.

The backward pass needs no back-to-front replay (the reference recovers T by
division and reconstructs a running suffix, tiled-backward-rasterize.wgsl:
121-141): with suffix_j = total - inclusive-prefix_j,

    dL/da_j = gamma_j * T_j - (U_tot - U_prefix_j + g_T * T_final) / (1-a_j)

where gamma_j = sum_ch g_ch c_{j,ch} (one small matmul) and U = gamma * w
accumulates forward.  All per-splat gradient reductions over pixels are MXU
contractions or sublane reductions; per-Gaussian accumulation happens
outside the kernel — deterministically, where the reference quantizes
gradients through 1e-6 fixed-point atomics (common.wgsl:110-121) — either
as the XLA scatter-add transpose of the entry gather (small scale) or as a
prefix-sum segment reduction in expansion order (large scale; see
pack_entry_attrs).

Alpha semantics (kept consistent between forward and backward, unlike the
reference whose forward accumulates alphas below 1/255 that its backward
then skips):
  * alpha = min(0.99, opacity * exp(-0.5 * conic quad form))
            (tiled-rasterizer.wgsl:228-233)
  * pixels outside the splat's SnugBox extents are skipped
    (tiled-rasterizer.wgsl:208)
  * alpha < 1/255 contributes nothing (tiled-backward-rasterize.wgsl:116)
  * n_contrib = 1-based index of the last contributing splat in the tile
    (tiled-rasterizer.wgsl:238-240)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webdgs_tpu.config import RenderSettings, use_interpret_mode

# attribute-row layout of the packed per-entry splat array (16, E)
ROW_CX, ROW_CY = 0, 1
ROW_CA, ROW_CB, ROW_CC = 2, 3, 4
ROW_R, ROW_G, ROW_B = 5, 6, 7
ROW_OP = 8
ROW_EX, ROW_EY = 9, 10
NUM_ROWS = 16  # sublane-aligned; 12 rows crashes the Mosaic compile helper

# output-channel layout of the per-tile pixel buffer (T, NUM_OUT, P) —
# channel-PLANAR: pixels on the minor (lane) axis.  A channel-minor
# (T, P, 8) layout lane-pads the 8-wide minor dim to 128 under TPU tiling:
# 249 MB of phantom HBM for the 15.6 MB logical buffer at 800x600, written
# by the forward kernel, read twice by the backward, and re-shuffled by
# every layout copy around the loss kernel (measured round 4 via
# memory_analysis + xplane: ~2 ms/step).  Planar tiles are exactly compact.
OUT_R, OUT_G, OUT_B = 0, 1, 2
OUT_ACC_ALPHA = 3
OUT_T = 4
OUT_NCONTRIB = 5
NUM_OUT = 8
# backward-kernel pixel-cotangent channels: d(r,g,b,acc) + the pixel's
# precomputed suffix term (see _rasterize_bwd)
GPIX_SUFFIX = 4
NUM_GPIX = 5


def _tile_window(offsets_ref, t, k):
    """Chunk-aligned DMA window covering tile ``t``'s entry range.

    ``offsets_ref`` holds the UNALIGNED per-tile entry offsets (a plain
    cumsum of real counts): the kernels read the aligned superset window
    ``[base, base + nch*k)`` and mask the foreign slots by index arithmetic
    — realigning the consumer instead of the data deletes the O(entries)
    realignment gathers the binning stage used to pay.  Chunk-aligned
    offsets (the sharded exchange layouts) are the ``skip == 0`` special
    case and behave exactly as before.

    Returns (base, uo, cnt, nch): aligned window start, the tile's first
    real slot, its real entry count, and the window's chunk count.
    """
    uo = offsets_ref[t]
    cnt = offsets_ref[t + 1] - uo
    base = (uo // k) * k
    skip = uo - base
    nch = jnp.where(cnt > 0, (skip + cnt + k - 1) // k, 0)
    return base, uo, cnt, nch


def _window_mask(base, uo, cnt, c, lane, k):
    """(1, K) validity of window chunk ``c``'s lanes: inside the tile's
    real entry range (foreign boundary slots belong to a neighbor tile —
    possibly the SAME Gaussian binned there too, so they must not
    composite here)."""
    sl = base + c * k + lane
    return (sl >= uo) & (sl < uo + cnt)


def _group_start(base, cg, gd, k, e_pad):
    """HBM start of DMA group ``cg`` (gd chunks of k lanes): the nominal
    start ``base + cg*gd*k``, clamped so the transfer never reads past the
    entry buffer.  When clamped, the window's leading lanes repeat slots a
    previous group already processed — the group mask
    (:func:`_group_mask`) excludes them, so no caller-side capacity
    alignment is needed."""
    return jnp.minimum(base + cg * gd * k, e_pad - gd * k)


def _group_mask(cs, gstart, uo, cnt, j, lane, k):
    """(1, K) validity of sub-chunk ``j`` of a DMA group loaded from
    ``cs``: inside the tile's real entry range AND at-or-above the group's
    nominal start ``gstart`` (lanes below it belong to the previous group;
    they appear here only when the group window was clamped at the buffer
    end)."""
    sl = cs + j * k + lane
    return (sl >= uo) & (sl < uo + cnt) & (sl >= gstart)


def _chunk_alpha(scr, pxf, pyf, settings: RenderSettings, mask=None):
    """Per-(pixel, splat) alpha for one chunk.

    ``mask``: optional (1, K) lane validity; masked lanes get alpha 0 (an
    exact no-op in the compositor and a zero in every gradient).
    Returns (alpha (P,K), gaussian weight G (P,K), dx, dy, u1, u2) where
    u1 = ca*dx + cb*dy and u2 = cb*dx + cc*dy are the conic quadratic
    form's factors (power = dx*u1 + dy*u2) — the backward reuses them:
    d power/d center = -2*(u1, u2).
    """
    cx = scr[ROW_CX:ROW_CX + 1, :]
    cy = scr[ROW_CY:ROW_CY + 1, :]
    ca = scr[ROW_CA:ROW_CA + 1, :]
    cb = scr[ROW_CB:ROW_CB + 1, :]
    cc = scr[ROW_CC:ROW_CC + 1, :]
    op = scr[ROW_OP:ROW_OP + 1, :]
    ex = scr[ROW_EX:ROW_EX + 1, :]
    ey = scr[ROW_EY:ROW_EY + 1, :]

    dx = pxf - cx  # (P, K)
    dy = pyf - cy
    u1 = ca * dx + cb * dy
    u2 = cb * dx + cc * dy
    power = dx * u1 + dy * u2
    g = jnp.exp(-0.5 * power)
    alpha = jnp.minimum(op * g, settings.alpha_max)
    in_ext = (jnp.abs(dx) <= ex) & (jnp.abs(dy) <= ey)
    keep = in_ext & (alpha >= settings.alpha_min)
    if mask is not None:
        keep = keep & mask
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, g, dx, dy, u1, u2


def _lane_cumsum(x, k: int):
    """Inclusive prefix sum along the lane (splat) axis of a (P, K) block,
    as an inclusive-triangular matmul on the MXU.

    Precision: the MXU's single-pass bf16 rounds log-transmittance by 0.4%
    (visibly wrong) and Mosaic's only alternative, HIGHEST, costs 6 passes.
    The 0/1 triangle is EXACT in bf16, so only x needs widening: a manual
    hi+lo bf16 split gives ~16-bit mantissa (the reference's own f16
    precision class, error ~1.5e-5) at 2 single-pass matmuls.  A
    Hillis-Steele roll scan measured slower than the MXU passes."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (row <= col).astype(jnp.bfloat16)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    # hi and lo stacked on the sublane axis: ONE (2P, K) MXU pass instead
    # of two (P, K) passes — identical products, half the invocations
    p = x.shape[0]
    s = jax.lax.dot_general(
        jnp.concatenate([x_hi, x_lo], axis=0), tri, dims,
        preferred_element_type=jnp.float32)
    return s[:p] + s[p:]


def _dot_general_tiered(a, b, dims, settings: RenderSettings):
    """General-operand matmul at the settings' precision tier.

    "bf16x3": both operands split hi+lo in bf16; the lo*lo cross term is
    dropped — 3 single-pass MXU matmuls with relative error ~2^-16 (the
    f16 class the reference's packed splat attributes live in anyway).
    "highest": Mosaic HIGHEST (6 passes, f32-exact) — the verification
    reference for on-chip error measurement (RESULTS.md)."""
    if settings.matmul_precision == "highest":
        return jax.lax.dot_general(a, b, dims,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    # fold a_hi@b_hi and a_lo@b_hi into one pass by stacking a's hi/lo
    # halves along its non-contracted axis (output axis 0 = a's
    # non-contracted dim, so the halves split back on axis 0): 2 MXU
    # passes total instead of 3, identical products
    (a_c,), _ = dims[0]
    an = 1 - a_c
    m = a.shape[an]
    s = d(jnp.concatenate([a_hi, a_lo], axis=an), b_hi)
    return (s[:m] + s[m:]) + d(a_hi, b_lo)


def _pixel_coords(t, ntx, settings: RenderSettings):
    """Pixel-center coordinates of tile t as (P,1) columns."""
    p = settings.tile_px
    tx = t % ntx
    ty = t // ntx
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pxf = (tx * settings.tile_w + pix % settings.tile_w).astype(jnp.float32) + 0.5
    pyf = (ty * settings.tile_h + pix // settings.tile_w).astype(jnp.float32) + 0.5
    return pxf, pyf


def _fwd_kernel(offsets_ref, attrs_ref, out_ref, scr, sem, *,
                ntx: int, e_pad: int, settings: RenderSettings,
                track_ncontrib: bool = True):
    p = settings.tile_px
    k = settings.chunk
    g = settings.tiles_per_step
    gd = min(settings.dma_group, e_pad // k)
    log_t_min = math.log(settings.t_threshold)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    # one grid step owns `g` tiles: sequential grid-step overhead on a
    # v5e chip is ~2 us, i.e. ~4 ms at 1900 tiles — the per-tile loop
    # amortizes it g-fold (the kernels were dispatch-bound, not
    # compute-bound, at 16x16 tiles)
    pid = pl.program_id(0)

    def tile_body(i, _):
        t = pid * g + i
        base, uo, cnt, nch = _tile_window(offsets_ref, t, k)
        ngr = (nch + gd - 1) // gd  # DMA groups of gd chunks
        pxf, pyf = _pixel_coords(t, ntx, settings)

        def group_dma(cg, slot):
            cs = pl.multiple_of(_group_start(base, cg, gd, k, e_pad), k)
            return pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(cs, gd * k)], scr.at[slot],
                sem.at[slot])

        @pl.when(ngr > 0)
        def _():
            group_dma(0, 0).start()

        def body(carry):
            cg, log_t_un, log_t_gated, acc, nmax = carry
            slot = cg % 2

            # prefetch the next group while this one is processed
            @pl.when(cg + 1 < ngr)
            def _():
                group_dma(cg + 1, (cg + 1) % 2).start()

            group_dma(cg, slot).wait()
            cs = _group_start(base, cg, gd, k, e_pad)
            gstart = base + cg * gd * k

            for j in range(gd):  # static unroll over the group's chunks
                sub = scr[slot, :, j * k:(j + 1) * k]
                alpha, _, _, _, _, _ = _chunk_alpha(
                    sub, pxf, pyf, settings,
                    _group_mask(cs, gstart, uo, cnt, j, lane, k))
                alog = jnp.log1p(-alpha)
                alog_incl = _lane_cumsum(alog, k)
                t_excl = jnp.exp(alog_incl - alog + log_t_un)
                incl = (t_excl >= settings.t_threshold).astype(jnp.float32)
                w = alpha * t_excl * incl  # (P, K)

                c4 = jnp.concatenate(
                    [sub[ROW_R:ROW_B + 1, :],
                     jnp.ones((1, k), jnp.float32)], axis=0)
                # planar accumulator: (4, P) += c4 (4,K) x w (P,K) over K —
                # the swapped operand order writes the channel-planar output
                # layout directly (no transpose anywhere)
                acc = acc + _dot_general_tiered(
                    c4, w, (((1,), (1,)), ((), ())), settings)  # (4, P)

                log_t_un = log_t_un + alog_incl[:, k - 1:k]
                log_t_gated = log_t_gated + jnp.sum(alog * incl, axis=1,
                                                    keepdims=True)

                if track_ncontrib:
                    # 1-based position within the TILE's real range (window
                    # slots before uo are foreign, masked to alpha 0)
                    pos = (cs + j * k + lane - uo + 1).astype(jnp.float32)
                    contrib = (alpha > 0.0) & (incl > 0.0)
                    nmax = jnp.maximum(
                        nmax, jnp.max(jnp.where(contrib, pos, 0.0), axis=1,
                                      keepdims=True))
            return cg + 1, log_t_un, log_t_gated, acc, nmax

        def cond(carry):
            cg, log_t_un, *_ = carry
            return (cg < ngr) & (jnp.max(log_t_un) >= log_t_min)

        zero_p1 = jnp.zeros((p, 1), jnp.float32)
        init = (jnp.int32(0), zero_p1, zero_p1,
                jnp.zeros((4, p), jnp.float32), zero_p1)
        done_g, _, log_t_gated, acc, nmax = jax.lax.while_loop(cond, body,
                                                               init)

        # a saturation early-exit may leave one prefetched DMA in flight
        @pl.when(done_g < ngr)
        def _():
            group_dma(done_g, done_g % 2).wait()

        out_ref[i, 0:4, :] = acc
        # the per-pixel scalars accumulate as (P, 1) columns (lane
        # reductions of the (P, K) chunk blocks); ONE small transpose per
        # tile moves both into the planar channel rows
        scal = jax.lax.transpose(
            jnp.concatenate([log_t_gated, nmax], axis=1), (1, 0))  # (2, P)
        out_ref[i, OUT_T:OUT_T + 1, :] = jnp.exp(scal[0:1, :])
        out_ref[i, OUT_NCONTRIB:OUT_NCONTRIB + 1, :] = scal[1:2, :]
        out_ref[i, 6:8, :] = jnp.zeros((2, p), jnp.float32)
        return 0

    jax.lax.fori_loop(0, g, tile_body, 0)


def _bwd_kernel(offsets_ref, attrs_ref, gpix_ref, dout_ref,
                scr, dscr, rscr, sem, dsem, rsem, *, ntx: int,
                n_pad_tiles: int, e_pad: int,
                settings: RenderSettings):
    p = settings.tile_px
    k = settings.chunk
    gstep = settings.tiles_per_step
    gd = min(settings.dma_group, e_pad // k)
    log_t_min = math.log(settings.t_threshold)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    # one grid step owns `gstep` tiles (see _fwd_kernel): the backward was
    # equally dispatch-bound at 16x16 tiles
    pid = pl.program_id(0)

    def tile_body(i, _):
        t = pid * gstep + i
        base, uo, cnt, nch = _tile_window(offsets_ref, t, k)
        ngr = (nch + gd - 1) // gd  # DMA groups of gd chunks
        skip = uo - base
        pxf, pyf = _pixel_coords(t, ntx, settings)

        # gpix_ref carries the planar pixel cotangents: channels 0:4 =
        # d(r, g, b, acc_alpha) and channel GPIX_SUFFIX = the precomputed
        # suffix term U_tot + g_T*T_final (see _rasterize_bwd) — so the
        # kernel needs NO forward-output input at all.  One small (5, P)
        # -> (P, 5) transpose per tile yields the per-pixel columns the
        # (P, K) chunk math broadcasts.
        gt5 = jax.lax.transpose(gpix_ref[i, 0:NUM_GPIX, :], (1, 0))  # (P, 5)
        g4 = gt5[:, 0:4]  # cotangents for (r, g, b, acc_alpha), (P, 4)
        suffix_extra = gt5[:, GPIX_SUFFIX:GPIX_SUFFIX + 1]  # (P, 1)

        # group windows are NEVER clamped here: _backward_impl pads the
        # entry buffer (and sizes dout) by (gd-1)*k lanes, so the nominal
        # group window [base + cg*gd*k, +gd*k) is always in-bounds and
        # gradient groups write back at the same nominal start
        def group_dma(cg, slot):
            start = pl.multiple_of(base + cg * gd * k, k)
            return pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(start, gd * k)], scr.at[slot],
                sem.at[slot])

        def out_dma(cg, slot):
            start = pl.multiple_of(base + cg * gd * k, k)
            return pltpu.make_async_copy(
                dscr.at[slot], dout_ref.at[:, pl.ds(start, gd * k)],
                dsem.at[slot])

        # the window's first chunk may be shared with the previous tile's last
        # chunk (skip > 0): read its current gradients and accumulate, so this
        # tile's write cannot clobber the neighbor's slots.  The grid is
        # sequential and every kernel drains its write DMAs before returning,
        # so the read sees the neighbor's final values.
        def rmw_dma():
            start = pl.multiple_of(base, k)
            return pltpu.make_async_copy(
                dout_ref.at[:, pl.ds(start, k)], rscr, rsem)

        @pl.when(ngr > 0)
        def _():
            group_dma(0, 0).start()
            rmw_dma().start()

        def body(carry):
            cg, log_t_un, cum_u = carry
            slot = cg % 2

            @pl.when(cg + 1 < ngr)
            def _():
                group_dma(cg + 1, (cg + 1) % 2).start()

            group_dma(cg, slot).wait()
            # the gradient scratch slot is reused every other group: make sure
            # its previous write-out has drained before overwriting
            @pl.when(cg >= 2)
            def _():
                out_dma(cg - 2, slot).wait()

            gstart = base + cg * gd * k
            for j in range(gd):  # static unroll over the group's chunks
                cj = slice(j * k, (j + 1) * k)
                col = scr[slot, :, cj]
                alpha, g, dx, dy, u1, u2 = _chunk_alpha(
                    col, pxf, pyf, settings,
                    _group_mask(gstart, gstart, uo, cnt, j, lane, k))
                alog = jnp.log1p(-alpha)
                alog_incl = _lane_cumsum(alog, k)
                t_excl = jnp.exp(alog_incl - alog + log_t_un)
                incl = (t_excl >= settings.t_threshold).astype(jnp.float32)
                live = (alpha > 0.0).astype(jnp.float32) * incl
                w = alpha * t_excl * incl

                # gamma4[p, j] = sum_ch g4[p, ch] * c4[ch, j] — contraction
                # dim is only 4: exact f32 VPU broadcast beats any MXU tier
                gamma4 = (g4[:, 0:1] * col[ROW_R:ROW_R + 1, :]
                          + g4[:, 1:2] * col[ROW_G:ROW_G + 1, :]
                          + g4[:, 2:3] * col[ROW_B:ROW_B + 1, :]
                          + g4[:, 3:4])  # (P, K); alpha row of c4 is all-ones

                u = gamma4 * w
                u_incl = _lane_cumsum(u, k)
                u_prefix = cum_u + u_incl  # inclusive, (P, K)
                one_m_a = 1.0 - alpha
                dl_da = (gamma4 * t_excl
                         - (suffix_extra - u_prefix) / one_m_a) * live

                op = col[ROW_OP:ROW_OP + 1, :]
                unclamped = (op * g < settings.alpha_max).astype(jnp.float32)
                dl_dg = dl_da * op * unclamped
                d_op = jnp.sum(dl_da * g * unclamped, axis=0,
                               keepdims=True)  # (1, K)

                # d color: dL/dc[ch,j] = sum_p g_ch[p] * w[p,j] — the planar
                # gpix rows contract over P directly, no slice transpose
                d_col = _dot_general_tiered(
                    gpix_ref[i, 0:3, :], w, (((1,), (0,)), ((), ())),
                    settings)  # (3, K)

                q = dl_dg * (-0.5 * g)  # (P, K)
                # d power/d center = -2*(u1, u2) with u1 = ca dx + cb dy,
                # u2 = cb dx + cc dy, so sum_p q*u1 = ca*S_qx + cb*S_qy
                # with S_qx = sum_p qx etc — the conic rows are per-splat
                # constants, which deletes the q*u1/q*u2 (P, K) products
                qx = q * dx
                qy = q * dy
                s_qx = jnp.sum(qx, axis=0, keepdims=True)  # (1, K)
                s_qy = jnp.sum(qy, axis=0, keepdims=True)
                ca = col[ROW_CA:ROW_CA + 1, :]
                cb = col[ROW_CB:ROW_CB + 1, :]
                cc = col[ROW_CC:ROW_CC + 1, :]
                d_cx = -2.0 * (ca * s_qx + cb * s_qy)
                d_cy = -2.0 * (cb * s_qx + cc * s_qy)
                d_ca = jnp.sum(qx * dx, axis=0, keepdims=True)
                d_cb = 2.0 * jnp.sum(qx * dy, axis=0, keepdims=True)
                d_cc = jnp.sum(qy * dy, axis=0, keepdims=True)

                dscr[slot, ROW_CX:ROW_CX + 1, cj] = d_cx
                dscr[slot, ROW_CY:ROW_CY + 1, cj] = d_cy
                dscr[slot, ROW_CA:ROW_CA + 1, cj] = d_ca
                dscr[slot, ROW_CB:ROW_CB + 1, cj] = d_cb
                dscr[slot, ROW_CC:ROW_CC + 1, cj] = d_cc
                dscr[slot, ROW_R:ROW_B + 1, cj] = d_col
                dscr[slot, ROW_OP:ROW_OP + 1, cj] = d_op
                dscr[slot, ROW_EX:NUM_ROWS, cj] = jnp.zeros(
                    (NUM_ROWS - ROW_EX, k), jnp.float32)

                log_t_un = log_t_un + alog_incl[:, k - 1:k]
                cum_u = cum_u + u_incl[:, k - 1:k]

            # accumulate into the shared boundary chunk (foreign slots of
            # this tile carry exact zeros, so the add preserves the
            # neighbor's gradients; on a fresh chunk skip == 0 selects zeros)
            @pl.when(cg == 0)
            def _():
                rmw_dma().wait()
                dscr[slot, :, 0:k] = dscr[slot, :, 0:k] + jnp.where(
                    skip > 0, rscr[...], 0.0)

            out_dma(cg, slot).start()
            return cg + 1, log_t_un, cum_u

        def cond(carry):
            cg, log_t_un, _ = carry
            return (cg < ngr) & (jnp.max(log_t_un) >= log_t_min)

        zero_p1 = jnp.zeros((p, 1), jnp.float32)
        done_g, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), zero_p1, zero_p1))

        # drain pending gradient write-outs (up to 2) and, if the saturation
        # early-exit fired, the prefetched input DMA
        @pl.when(done_g >= 2)
        def _():
            out_dma(done_g - 2, done_g % 2).wait()

        @pl.when(done_g >= 1)
        def _():
            out_dma(done_g - 1, (done_g - 1) % 2).wait()

        @pl.when(done_g < ngr)
        def _():
            group_dma(done_g, done_g % 2).wait()

        # groups skipped by saturation early-exit still need zero gradients
        # (their shared-boundary content is restored by the NEXT tile's rmw
        # add; group 0 is never zero-filled — the body always processes it);
        # both scratch slots hold zeros so the fill DMAs can be
        # double-buffered.  Fills run at GROUP granularity where the whole
        # group is inside the window/buffer, chunk granularity for the tail.
        dscr[0] = jnp.zeros((NUM_ROWS, gd * k), jnp.float32)
        dscr[1] = jnp.zeros((NUM_ROWS, gd * k), jnp.float32)

        def zfill_dma(c, width, slot):
            # c in CHUNK units; width in chunks (1 or gd, both k-aligned)
            start = pl.multiple_of(base + c * k, k)
            return pltpu.make_async_copy(
                dscr.at[slot, :, 0:width * k],
                dout_ref.at[:, pl.ds(start, width * k)], dsem.at[slot])

        # fill start: after the body's groups for a live tile; for an
        # EMPTY tile, skip a shared first chunk (a neighbor's data lives
        # there).  Fill end: the LAST tile extends to the whole (padded)
        # buffer so d_attrs has no garbage tail — consumers then need no
        # mask and the cotangent is fully defined.
        e_buf = e_pad + (gd - 1) * k  # dout width (see _backward_impl)
        zstart = jnp.where(cnt > 0, done_g * gd,
                           jnp.where(skip > 0, jnp.int32(1), jnp.int32(0)))
        zend = jnp.where(t == n_pad_tiles - 1,
                         e_buf // k - base // k, ngr * gd)
        # whole zero groups, then a chunk-granular tail (max(.,0): an empty
        # tile with a shared first chunk has zend=0 < zstart=1 — no fill)
        n_zg = jnp.maximum(zend - zstart, 0) // gd

        def zero_fill_groups(gi, _):
            @pl.when(gi >= 2)
            def _():
                zfill_dma(zstart + (gi - 2) * gd, gd, gi % 2).wait()
            zfill_dma(zstart + gi * gd, gd, gi % 2).start()
            return 0

        jax.lax.fori_loop(0, n_zg, zero_fill_groups, 0, unroll=False)

        @pl.when(n_zg >= 2)
        def _():
            zfill_dma(zstart + (n_zg - 2) * gd, gd, n_zg % 2).wait()

        @pl.when(n_zg >= 1)
        def _():
            zfill_dma(zstart + (n_zg - 1) * gd, gd, (n_zg - 1) % 2).wait()

        def zero_fill_tail(c, _):
            dma = zfill_dma(c, 1, 0)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(zstart + n_zg * gd, zend, zero_fill_tail, 0,
                          unroll=False)
        return 0

    jax.lax.fori_loop(0, gstep, tile_body, 0)


def _pad_tiles(tile_offsets, n_tiles: int, g: int):
    """Pad (T+1,) offsets so the tile count is a multiple of the kernels'
    tiles-per-step; trailing tiles repeat the total (empty ranges)."""
    n_pad = -(-n_tiles // g) * g
    if n_pad == n_tiles:
        return tile_offsets, n_pad
    tail = jnp.broadcast_to(tile_offsets[-1:], (n_pad - n_tiles,))
    return jnp.concatenate([tile_offsets, tail]), n_pad


def _forward_impl(attrs16, tile_offsets, num_tiles_x, num_tiles_y,
                  settings: RenderSettings, track_ncontrib: bool = True):
    p = settings.tile_px
    k = settings.chunk
    g = settings.tiles_per_step
    e_pad = attrs16.shape[1]
    gd = min(settings.dma_group, e_pad // k)
    n_tiles = num_tiles_x * num_tiles_y
    offsets, n_pad = _pad_tiles(tile_offsets, n_tiles, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // g,),
        # keep the packed entries in HBM: tile ranges start at arbitrary
        # offsets, and only HBM (linear) refs can be sliced unaligned for DMA
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((g, NUM_OUT, p), lambda i, offs: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ROWS, gd * k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, ntx=num_tiles_x, e_pad=e_pad,
                               settings=settings,
                               track_ncontrib=track_ncontrib)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, NUM_OUT, p), jnp.float32),
        interpret=use_interpret_mode(),
    )(offsets, attrs16)
    return out[:n_tiles] if n_pad != n_tiles else out


def _backward_impl(attrs16, tile_offsets, gpix5, num_tiles_x,
                   num_tiles_y, settings: RenderSettings):
    """``gpix5``: (T, NUM_GPIX, P) planar pixel cotangents — d(r,g,b,acc)
    plus the precomputed per-pixel suffix term (see _rasterize_bwd)."""
    p = settings.tile_px
    k = settings.chunk
    g = settings.tiles_per_step
    n_tiles = num_tiles_x * num_tiles_y
    e_pad = attrs16.shape[1]
    gd = min(settings.dma_group, e_pad // k)
    offsets, n_pad = _pad_tiles(tile_offsets, n_tiles, g)
    if n_pad != n_tiles:
        gpix5 = jnp.pad(gpix5, ((0, n_pad - n_tiles), (0, 0), (0, 0)))
    # pad the entry buffer so gd-chunk group windows starting at any
    # k-aligned base stay in-bounds (worst overrun (gd-1)*k); the gradient
    # buffer gets the same width and the tail is sliced off below (the
    # slice fuses into the segment-reduce's select+gather — no copy)
    e_buf = e_pad + (gd - 1) * k
    if e_buf != e_pad:
        attrs16 = jnp.pad(attrs16, ((0, 0), (0, e_buf - e_pad)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((g, NUM_GPIX, p), lambda i, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ROWS, gd * k), jnp.float32),
            pltpu.VMEM((2, NUM_ROWS, gd * k), jnp.float32),
            pltpu.VMEM((NUM_ROWS, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_bwd_kernel, ntx=num_tiles_x,
                               n_pad_tiles=n_pad, e_pad=e_pad,
                               settings=settings)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_ROWS, e_buf), jnp.float32),
        interpret=use_interpret_mode(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, attrs16, gpix5)
    return out[:, :e_pad] if e_buf != e_pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def rasterize_tiles(attrs16, tile_offsets, num_tiles_x, num_tiles_y,
                    settings: RenderSettings, track_ncontrib: bool = True):
    """attrs16: (16, E) packed per-entry splat attributes in sorted
    tile/depth order; tile_offsets: (T+1,) i32 entry ranges — UNALIGNED
    cumulative counts are fine (the kernels read chunk-aligned superset
    windows and mask foreign slots); chunk-aligned layouts with zeroed
    padding rows (the sharded exchange paths) work identically.

    ``track_ncontrib``: the per-pixel last-contributor index (channel 5,
    tiled-rasterizer.wgsl:238-240) is consumed only by the importance
    replay (metric-count.wgsl); training steps pass False and the forward
    kernel skips its position/max bookkeeping (channel 5 reads 0).

    Returns (T, NUM_OUT, P) channel-PLANAR per-tile pixels
    [r, g, b, acc_alpha, T_final, n_contrib, 0, 0] *without* background
    (pixels on the minor axis: the channel-minor alternative lane-pads
    8 -> 128 under TPU tiling — see the OUT_* comment above).
    """
    return _forward_impl(attrs16, tile_offsets, num_tiles_x, num_tiles_y,
                         settings, track_ncontrib)


def _rasterize_fwd(attrs16, tile_offsets, num_tiles_x, num_tiles_y, settings,
                   track_ncontrib):
    out = _forward_impl(attrs16, tile_offsets, num_tiles_x, num_tiles_y,
                        settings, track_ncontrib)
    return out, (attrs16, tile_offsets, out)


def _rasterize_bwd(num_tiles_x, num_tiles_y, settings, track_ncontrib,
                   residuals, g):
    attrs16, tile_offsets, fwd_out = residuals
    # Fold the forward outputs out of the kernel: the backward math needs
    # them only through the per-pixel suffix term
    #     suffix = U_tot + g_T*T_final
    #            = sum_c g_c*out_c (c = r,g,b,acc) + g_T*T_final,
    # one cheap XLA fusion over the compact planar buffers — the kernel
    # then takes 5 cotangent channels and NO forward-output input (which
    # halves its pixel-buffer DMA traffic).
    suffix = (jnp.sum(g[:, 0:4] * fwd_out[:, 0:4], axis=1, keepdims=True)
              + g[:, OUT_T:OUT_T + 1] * fwd_out[:, OUT_T:OUT_T + 1])
    gpix5 = jnp.concatenate([g[:, 0:4], suffix], axis=1)  # (T, 5, P)
    d_attrs = _backward_impl(attrs16, tile_offsets, gpix5,
                             num_tiles_x, num_tiles_y, settings)
    # Slots past the last tile window hold garbage (never written by the
    # kernel), but every consumer of this cotangent masks by entry_valid
    # before use — segment_reduce_entries and the plain-gather VJP both
    # zero invalid slots, and the sharded exchange backward masks by its
    # own validity — so no (16, E) where-mask is paid here (it measured
    # 1.45 ms of pure HBM traffic per step at 786k entries).
    d_offsets = np.zeros(tile_offsets.shape, dtype=jax.dtypes.float0)
    return d_attrs, d_offsets


rasterize_tiles.defvjp(_rasterize_fwd, _rasterize_bwd)


def _pack_per_gauss(attrs):
    n = attrs.opacity.shape[0]
    return jnp.concatenate([
        attrs.center_px,  # 2
        attrs.conic,  # 3
        attrs.color,  # 3
        attrs.opacity[:, None],  # 1
        attrs.extents,  # 2
        jnp.zeros((n, NUM_ROWS - 11), jnp.float32),
    ], axis=1)  # (N, 16); column order must match ROW_* constants


def _gather_pack(per_gauss, entry_gauss, entry_valid):
    gathered = jnp.where(entry_valid[:, None], per_gauss[entry_gauss], 0.0)
    return gathered.T  # (16, A)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_pack_prefix(e_cap, settings, per_gauss, entry_gauss,
                        entry_valid, entry_source, gauss_counts,
                        expansion_gauss):
    return _gather_pack(per_gauss, entry_gauss, entry_valid)


def _gather_pack_prefix_fwd(e_cap, settings, per_gauss, entry_gauss,
                            entry_valid, entry_source, gauss_counts,
                            expansion_gauss):
    out = _gather_pack(per_gauss, entry_gauss, entry_valid)
    return out, (entry_valid, entry_source, gauss_counts, expansion_gauss)


def segment_reduce_entries(e_cap, rows, entry_valid, entry_source,
                           gauss_counts, settings=None,
                           expansion_gauss=None):
    """Per-Gaussian accumulation of per-entry values WITHOUT an XLA
    scatter-add (XLA serializes large-scale row scatters: measured 16.4 ms
    at 530k entries into 100k Gaussians vs 7.2 ms for this path).

    Entries in expansion order are grouped by Gaussian (jnp.repeat emits
    them in index order), so per-Gaussian sums are differences of an
    inclusive prefix sum at segment boundaries.  ``rows`` (E, C) arrive in
    tile-sorted slot order; ``entry_source`` maps each slot back to its
    expansion index, so its inverse permutes them into expansion order.
    f32 prefix-difference error is ~eps*sqrt(E/s) relative for a segment
    of size s — ~2e-4 worst case, immaterial for SGD.

    The expansion-order permutation gathers the rows at HALF width (f16):
    row-gather cost on a v5e chip is width-bound (0.96 vs 3.06 ms at 410k
    rows, scripts/exp_segred.py), and f16 is exactly the reference's own
    per-entry gradient precision — its backward packs every accumulated
    gradient into the f16 GaussianGradient buffer
    (src/shaders/tiled-backward.wgsl:285-297).  The prefix sum and the
    boundary differences stay f32.  ``settings.grad_rows_f16=False``
    restores the exact-f32 gather (the oracle-comparison tier).

    Returns (N, C) per-Gaussian sums (N = gauss_counts.shape[0]).
    """
    from webdgs_tpu.config import DEFAULT_SETTINGS
    settings = settings if settings is not None else DEFAULT_SETTINGS
    a_cap = entry_source.shape[0]
    rows = jnp.where(entry_valid[:, None], rows, 0.0)  # (E, C)

    # inverse permutation: expansion index -> slot, by sorting the source
    # payload back to identity (an XLA scatter of 786k i32 rows measured
    # 5.6 ms on a v5e chip; this sort is 2.7 ms).  In the sorted layout
    # ``entry_source`` is a TRUE permutation of [0, e_cap) and valid slots
    # are exactly those with source < total in both orders, so no
    # sentinel redirection is needed: invalid slots gather already-zeroed
    # rows.
    slot_ids = jnp.arange(a_cap, dtype=jnp.int32)
    # is_stable=False: entry_source is a TRUE permutation (all keys
    # distinct), so stability cannot affect the result and the unstable
    # sort path is cheaper
    _, inv = jax.lax.sort((entry_source, slot_ids), num_keys=1,
                          is_stable=False)
    if settings.grad_rows_f16:
        # f16 saturates at 65504: without this clamp a single large
        # cotangent row (huge splat / spiky loss pixel) casts to inf, the
        # per-Gaussian sum goes inf, Adam's moments go NaN, and the splat
        # teleports out of the frustum.  Exactly this divergence was
        # measured on a real v5e chip (round 5: healthy to iter ~150,
        # then visible 11k -> 0 by iter 275; f32 rows train clean — the
        # CPU suite never reaches overflow scales).  Saturation is
        # reference-class semantics: its fixed-point i32 gradient
        # accumulators clamp at +-2147 TOTAL per gradient
        # (common.wgsl:111-121), 30x tighter than this per-entry clamp.
        rows = jnp.clip(rows, -65000.0, 65000.0).astype(jnp.float16)

    use_kernel = expansion_gauss is not None and settings.segsum_kernel
    if use_kernel and not settings.grad_rows_f16:
        # f32 tier: split into bf16 hi/lo BEFORE the expansion-order
        # permutation and gather the halves separately — the full-width
        # f32 gather measured 2.8 ms/step (round-5 final trace) and
        # row-gather cost is width-bound; the segsum kernel consumes the
        # halves directly (its f32 branch computes this exact split
        # in-kernel, so the sums are bit-identical)
        from webdgs_tpu.ops.segsum import segment_sum_rows
        r_hi = rows.astype(jnp.bfloat16)
        r_lo = (rows - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        iv = inv[:e_cap]
        rows_cm = jnp.concatenate([r_hi[iv].T, r_lo[iv].T], axis=0)
        return segment_sum_rows(rows_cm, expansion_gauss, gauss_counts)

    d_exp = rows[inv[:e_cap]]  # (E, C) in expansion (gaussian-grouped) order

    if use_kernel:
        # f16 tier: one half-width gather, kernel converts + splits
        # (ops/segsum.py) — one pass over the channel-major rows instead
        # of the f32 convert + (E, C) cumsum + boundary gathers, each of
        # which materializes an 8x lane-padded (E, C) array (round-5
        # trace: ~2.3 ms of the 16.7 ms step at the bench shape)
        from webdgs_tpu.ops.segsum import segment_sum_rows
        return segment_sum_rows(d_exp.T, expansion_gauss, gauss_counts)

    cum = jnp.cumsum(d_exp.astype(jnp.float32), axis=0)
    cum_counts = jnp.cumsum(gauss_counts)
    # cum_l[g] = prefix through the END of segment g (0 while no segment
    # has started).  Segments are consecutive, so the exclusive boundary
    # is a SHIFT of the same gathered array — one (N, C) gather instead
    # of two (0.6 ms at the bench shape, scripts/exp_segred.py).  A
    # zero-count Gaussian has cum_counts[g] == cum_counts[g-1], so its
    # difference is exactly 0.
    cum_l = jnp.where((cum_counts > 0)[:, None],
                      cum[jnp.clip(cum_counts - 1, 0, e_cap - 1)], 0.0)
    prev = jnp.concatenate([jnp.zeros((1, cum_l.shape[1]), cum_l.dtype),
                            cum_l[:-1]], axis=0)
    return cum_l - prev


def _gather_pack_prefix_bwd(e_cap, settings, res, g):
    """Rasterizer-cotangent accumulation per Gaussian via
    :func:`segment_reduce_entries` (the transpose of the entry gather)."""
    entry_valid, entry_source, gauss_counts, expansion_gauss = res
    d_per_gauss = segment_reduce_entries(e_cap, g.T, entry_valid,
                                         entry_source, gauss_counts,
                                         settings, expansion_gauss)

    def f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (d_per_gauss, f0(entry_source), f0(entry_valid),
            f0(entry_source), f0(gauss_counts), f0(entry_source))


_gather_pack_prefix.defvjp(_gather_pack_prefix_fwd, _gather_pack_prefix_bwd)


def pack_entry_attrs(attrs, entry_gauss, entry_valid,
                     settings: RenderSettings, entry_source=None,
                     gauss_counts=None, expansion_capacity: int | None = None,
                     expansion_gauss=None):
    """Gather per-Gaussian SplatAttrs into chunk-aligned, depth-sorted
    per-entry rows (16, A).

    One (N,16) row-major pack + ONE vectorized row gather (TPU gathers cost
    the same for a 64B row as for a scalar) + transpose.  Invalid/padding
    entries are zeroed everywhere — opacity 0 makes them exact no-ops in the
    compositor, and the zero mask keeps their cotangents out of Gaussian 0's
    gradients.

    Gradient accumulation per Gaussian is the transpose of the gather: a
    deterministic scatter-add by default, or — when ``entry_source`` /
    ``gauss_counts`` are provided (large scale) — a prefix-sum segment
    reduction that avoids XLA's slow large-scale scatter.
    """
    per_gauss = _pack_per_gauss(attrs)
    if entry_source is not None and gauss_counts is not None:
        assert expansion_capacity is not None
        return _gather_pack_prefix(expansion_capacity, settings, per_gauss,
                                   entry_gauss, entry_valid, entry_source,
                                   gauss_counts, expansion_gauss)
    return _gather_pack(per_gauss, entry_gauss, entry_valid)


def composite_background(tiles, settings: RenderSettings):
    """accum + background * T_final (tiled-rasterizer.wgsl:250-252);
    tiles: (..., NUM_OUT) IMAGE-space pixel channels (channel-minor, i.e.
    after :func:`tiles_to_image`) -> (..., 3) final color."""
    bg = jnp.asarray(settings.background, dtype=jnp.float32)
    return tiles[..., 0:3] + bg * tiles[..., OUT_T:OUT_T + 1]


def tiles_to_image(out, num_tiles_x, num_tiles_y, img_w, img_h,
                   settings: RenderSettings):
    """(T, C, P) channel-planar per-tile pixels -> (H, W, C) image crop."""
    c = out.shape[1]
    img = out.reshape(num_tiles_y, num_tiles_x, c, settings.tile_h,
                      settings.tile_w)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        num_tiles_y * settings.tile_h, num_tiles_x * settings.tile_w, c)
    return img[:img_h, :img_w]


def image_to_tiles(img, num_tiles_x, num_tiles_y, settings: RenderSettings):
    """(H, W, C) -> channel-MINOR (T, P, C), zero-padding to the tile grid.

    Note this is NOT the inverse layout of the rasterizer's planar
    (T, C, P) output: the importance replay kernel consumes its per-pixel
    inputs as (P, c) columns (ops/importance.py), which is what this
    produces."""
    h, w, c = img.shape
    ph = num_tiles_y * settings.tile_h - h
    pw = num_tiles_x * settings.tile_w - w
    img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)))
    img = img.reshape(num_tiles_y, settings.tile_h, num_tiles_x,
                      settings.tile_w, c)
    return img.transpose(0, 2, 1, 3, 4).reshape(
        num_tiles_y * num_tiles_x, settings.tile_px, c)
