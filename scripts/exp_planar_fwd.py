"""On-chip A/B: forward rasterizer with (T, P, 8) channel-minor output
(shipped; TPU tiling pads the 8-lane minor dim 16x -> 249 MB phantom temp
at 800x600, measured via memory_analysis) vs (T, 8, P) channel-PLANAR
output (compact, acc accumulated transposed via a swapped dot_general and
one lax.transpose of the per-pixel scalars per tile).
"""

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, *args, iters=30):
    import jax
    import jax.numpy as jnp
    _ = float(jnp.sum(jax.tree.leaves(fn(*args))[0].ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:8]))
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from webdgs_tpu.config import RenderSettings, enable_compilation_cache
    from webdgs_tpu.ops import rasterize as ro
    enable_compilation_cache()

    settings = RenderSettings()
    ntx, nty = 25, 38
    T = ntx * nty
    E = 410_496
    rng = np.random.default_rng(0)

    # plausible-ish entries: centers inside their tile, moderate alpha
    tile_of = (np.arange(E) * T // E).astype(np.int32)
    tx = tile_of % ntx
    ty = tile_of // ntx
    cx = (tx * 32 + rng.uniform(0, 32, E)).astype(np.float32)
    cy = (ty * 16 + rng.uniform(0, 16, E)).astype(np.float32)
    inv_s2 = rng.uniform(0.02, 0.5, E).astype(np.float32)
    attrs = np.zeros((16, E), np.float32)
    attrs[ro.ROW_CX] = cx
    attrs[ro.ROW_CY] = cy
    attrs[ro.ROW_CA] = inv_s2
    attrs[ro.ROW_CC] = inv_s2
    attrs[ro.ROW_R:ro.ROW_B + 1] = rng.uniform(0, 1, (3, E))
    attrs[ro.ROW_OP] = rng.uniform(0.05, 0.9, E)
    attrs[ro.ROW_EX] = rng.uniform(4, 30, E)
    attrs[ro.ROW_EY] = rng.uniform(4, 30, E)
    attrs16 = jnp.asarray(attrs)
    counts = np.bincount(tile_of, minlength=T)
    off = jnp.asarray(np.concatenate([[0], np.cumsum(counts)])
                      .astype(np.int32))

    # ---------------- planar forward kernel (the B variant) -------------
    def _fwd_kernel_planar(offsets_ref, attrs_ref, out_ref, scr, sem, *,
                           ntx: int, e_pad: int, settings, track_ncontrib):
        p = settings.tile_px
        k = settings.chunk
        g = settings.tiles_per_step
        gd = min(settings.dma_group, e_pad // k)
        log_t_min = math.log(settings.t_threshold)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        pid = pl.program_id(0)

        def tile_body(i, _):
            t = pid * g + i
            base, uo, cnt, nch = ro._tile_window(offsets_ref, t, k)
            ngr = (nch + gd - 1) // gd
            pxf, pyf = ro._pixel_coords(t, ntx, settings)

            def group_dma(cg, slot):
                cs = pl.multiple_of(
                    ro._group_start(base, cg, gd, k, e_pad), k)
                return pltpu.make_async_copy(
                    attrs_ref.at[:, pl.ds(cs, gd * k)], scr.at[slot],
                    sem.at[slot])

            @pl.when(ngr > 0)
            def _():
                group_dma(0, 0).start()

            def body(carry):
                cg, log_t_un, log_t_gated, acc, nmax = carry
                slot = cg % 2

                @pl.when(cg + 1 < ngr)
                def _():
                    group_dma(cg + 1, (cg + 1) % 2).start()

                group_dma(cg, slot).wait()
                cs = ro._group_start(base, cg, gd, k, e_pad)
                gstart = base + cg * gd * k

                for j in range(gd):
                    sub = scr[slot, :, j * k:(j + 1) * k]
                    alpha, _, _, _, _, _ = ro._chunk_alpha(
                        sub, pxf, pyf, settings,
                        ro._group_mask(cs, gstart, uo, cnt, j, lane, k))
                    alog = jnp.log1p(-alpha)
                    alog_incl = ro._lane_cumsum(alog, k)
                    t_excl = jnp.exp(alog_incl - alog + log_t_un)
                    incl = (t_excl >= settings.t_threshold
                            ).astype(jnp.float32)
                    w = alpha * t_excl * incl

                    c4 = jnp.concatenate(
                        [sub[ro.ROW_R:ro.ROW_B + 1, :],
                         jnp.ones((1, k), jnp.float32)], axis=0)
                    # PLANAR acc: (4, P) += c4 (4,K) x w (P,K) contract K
                    acc = acc + ro._dot_general_tiered(
                        c4, w, (((1,), (1,)), ((), ())), settings)

                    log_t_un = log_t_un + alog_incl[:, k - 1:k]
                    log_t_gated = log_t_gated + jnp.sum(
                        alog * incl, axis=1, keepdims=True)

                    if track_ncontrib:
                        pos = (cs + j * k + lane - uo + 1
                               ).astype(jnp.float32)
                        contrib = (alpha > 0.0) & (incl > 0.0)
                        nmax = jnp.maximum(
                            nmax, jnp.max(jnp.where(contrib, pos, 0.0),
                                          axis=1, keepdims=True))
                return cg + 1, log_t_un, log_t_gated, acc, nmax

            def cond(carry):
                cg, log_t_un, *_ = carry
                return (cg < ngr) & (jnp.max(log_t_un) >= log_t_min)

            zero_p1 = jnp.zeros((p, 1), jnp.float32)
            init = (jnp.int32(0), zero_p1, zero_p1,
                    jnp.zeros((4, p), jnp.float32), zero_p1)
            done_g, _, log_t_gated, acc, nmax = jax.lax.while_loop(
                cond, body, init)

            @pl.when(done_g < ngr)
            def _():
                group_dma(done_g, done_g % 2).wait()

            out_ref[i, 0:4, :] = acc
            scal = jnp.concatenate([log_t_gated, nmax], axis=1)  # (P, 2)
            scal_t = jax.lax.transpose(scal, (1, 0))  # (2, P)
            out_ref[i, 4:5, :] = jnp.exp(scal_t[0:1, :])
            out_ref[i, 5:6, :] = scal_t[1:2, :]
            out_ref[i, 6:8, :] = jnp.zeros((2, p), jnp.float32)
            return 0

        jax.lax.fori_loop(0, g, tile_body, 0)

    def forward_planar(attrs16, tile_offsets, num_tiles_x, num_tiles_y,
                       settings, track_ncontrib=True):
        p = settings.tile_px
        k = settings.chunk
        g = settings.tiles_per_step
        e_pad = attrs16.shape[1]
        gd = min(settings.dma_group, e_pad // k)
        n_tiles = num_tiles_x * num_tiles_y
        offsets, n_pad = ro._pad_tiles(tile_offsets, n_tiles, g)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((g, ro.NUM_OUT, p),
                                   lambda i, offs: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, ro.NUM_ROWS, gd * k), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _fwd_kernel_planar, ntx=num_tiles_x, e_pad=e_pad,
            settings=settings, track_ncontrib=track_ncontrib)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, ro.NUM_OUT, p),
                                           jnp.float32),
        )(offsets, attrs16)
        return out[:n_tiles] if n_pad != n_tiles else out

    fa = jax.jit(lambda a, o: ro.rasterize_tiles(
        a, o, ntx, nty, settings, False))
    fb = jax.jit(functools.partial(forward_planar, num_tiles_x=ntx,
                                   num_tiles_y=nty, settings=settings,
                                   track_ncontrib=False))
    fb_nc = jax.jit(functools.partial(forward_planar, num_tiles_x=ntx,
                                      num_tiles_y=nty, settings=settings,
                                      track_ncontrib=True))
    fa_nc = jax.jit(lambda a, o: ro.rasterize_tiles(
        a, o, ntx, nty, settings, True))

    oa = fa(attrs16, off)
    ob = fb(attrs16, off)
    err = float(jnp.max(jnp.abs(jnp.transpose(oa, (0, 2, 1))[:, 0:5]
                                - ob[:, 0:5])))
    print(f"max |channel-minor - planar| over rgba+T: {err:.3e}")
    ma = jax.jit(lambda a, o: ro.rasterize_tiles(
        a, o, ntx, nty, settings, False)).lower(
        attrs16, off).compile().memory_analysis()
    mb = fb.lower(attrs16, off).compile().memory_analysis()
    print(f"temp bytes: channel-minor {ma.temp_size_in_bytes/1e6:.1f} MB, "
          f"planar {mb.temp_size_in_bytes/1e6:.1f} MB")
    print(f"fwd  (T,P,8) no-ncontrib: {timeit(fa, attrs16, off):7.3f} ms")
    print(f"fwd  (T,8,P) no-ncontrib: {timeit(fb, attrs16, off):7.3f} ms")
    print(f"fwd  (T,P,8) ncontrib:    {timeit(fa_nc, attrs16, off):7.3f} ms")
    print(f"fwd  (T,8,P) ncontrib:    {timeit(fb_nc, attrs16, off):7.3f} ms")
