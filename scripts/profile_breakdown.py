"""The definitive per-stage breakdown of the train step at bench scale."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.prof_util import measure


def main():
    import jax
    import jax.numpy as jnp

    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.ops import binning as B
    from webdgs_tpu.ops import rasterize as RZ
    from webdgs_tpu.ops.adam import (AdamHyperparameters, adam_step,
                                     init_adam_state)
    from webdgs_tpu.ops.loss import LossConfig, pixel_loss_gradient
    from webdgs_tpu.ops.projection import project_gaussians
    from webdgs_tpu.train.step import train_step
    from webdgs_tpu.core.scene import scene_from_arrays

    # WEBDGS_PROFILE_SCALE=tiny: same stages at toy shapes on CPU to smoke
    # the script (plumbing only; the numbers are meaningless off-chip)
    tiny = os.environ.get("WEBDGS_PROFILE_SCALE") == "tiny"
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from webdgs_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    n = 2_000 if tiny else 100_000
    w, h = (128, 96) if tiny else (800, 600)
    rng = np.random.default_rng(0)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scene = scene_from_arrays(
        rng.normal(0, 1.5, (n, 3)).astype(np.float32), quats=quats,
        log_scales=rng.uniform(-4.5, -2.5, (n, 3)).astype(np.float32),
        opacity_logits=rng.uniform(-1, 3, (n,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    s = RenderSettings(chunk=128)
    cap = 4096 if tiny else 786432
    ntx, nty = B.tile_grid(w, h, s)
    cfg = LossConfig()
    hp = AdamHyperparameters()
    target = jnp.zeros((h, w, 3), jnp.float32)
    params = scene.params()
    opt0 = init_adam_state(params)

    # precomputed stage inputs
    attrs, aux = jax.jit(lambda p: project_gaussians(
        p, scene.alive, cam, w, h, 0, s, detach_color=True))(params)
    bins = jax.jit(lambda a: B.bin_splats(a, w, h, s, capacity=cap))(aux)
    a16 = jax.jit(lambda at, b: RZ.pack_entry_attrs(
        at, b.entry_gauss, b.entry_valid, s))(attrs, bins)
    fwd_out = jax.jit(lambda a, b: RZ.rasterize_tiles(
        a, b.tile_offsets, ntx, nty, s))(a16, bins)
    gpix = fwd_out * 1e-3

    rows = []

    def rec(name, stage, args, r=16):
        ms = measure(stage, args, r=2 if tiny else r)
        rows.append((name, ms))
        print(f"{name:22s} {ms:7.2f} ms", flush=True)


    rec("projection fwd", lambda p: project_gaussians(
        p, scene.alive, cam, w, h, 0, s, detach_color=True), (params,))

    def proj_vjp(p, d):
        _, vjp = jax.vjp(lambda q: project_gaussians(
            q, scene.alive, cam, w, h, 0, s, detach_color=True)[0], p)
        return vjp(d)

    d_attrs_pg = jax.tree.map(lambda x: x * 1e-3, attrs)
    rec("projection fwd+vjp", proj_vjp, (params, d_attrs_pg))

    rec("bin full", lambda a: B.bin_splats(a, w, h, s, capacity=cap), (aux,))

    # bin internals
    def bin_repeat(a):
        counts = jnp.where(jnp.cumsum(a.num_tiles) <= cap, a.num_tiles, 0)
        return B._repeat_ids(counts, cap)

    rec("bin/repeat", bin_repeat, (aux,))

    def bin_fields(a):
        counts = jnp.where(jnp.cumsum(a.num_tiles) <= cap, a.num_tiles, 0)
        g = B._repeat_ids(counts, cap)
        offsets = jnp.cumsum(counts) - counts
        fields = jnp.stack([
            offsets, a.tile_min[:, 0], a.tile_min[:, 1], a.tile_dims[:, 0],
            B._ordered_depth16(a.depth).astype(jnp.int32)], axis=1)
        return fields[g]

    rec("bin/repeat+gather", bin_fields, (aux,))

    rec("bin/hist", lambda a: B._tile_histogram(
        a, jnp.cumsum(a.num_tiles) <= cap, ntx, nty), (aux,))

    # full expansion incl. the per-entry key math (slot % / // by a
    # per-entry divisor — dynamic integer div/mod is not free on the VPU)
    rec("bin/expand(keys)", lambda a: B.expand_entries(a, ntx, cap), (aux,))

    def expand_sort(a):
        key, g, counts, total, keep, _ = B.expand_entries(a, ntx, cap)
        source = jnp.arange(cap, dtype=jnp.int32)
        return jax.lax.sort((key, g, source), num_keys=1)

    rec("bin/expand+sort(real)", expand_sort, (aux,))

    def sort3(k, g, src):
        return jax.lax.sort((k, g, src), num_keys=1)

    # the real sort since the round-3 windowed layout: e_cap slots, key +
    # gaussian-id + expansion-slot payloads; sorted order IS the layout
    keys0 = jax.random.randint(jax.random.PRNGKey(0), (cap,), 0,
                               1 << 30).astype(jnp.uint32)
    gauss0 = jnp.zeros_like(keys0).astype(jnp.int32)
    rec(f"bin/sort(k,g,s) {cap/1e3:.0f}k", sort3,
        (keys0, gauss0, gauss0 + 1))

    rec("pack gather", lambda at, b: RZ.pack_entry_attrs(
        at, b.entry_gauss, b.entry_valid, s), (attrs, bins))

    rec("raster fwd kernel", lambda a, b: RZ.rasterize_tiles(
        a, b.tile_offsets, ntx, nty, s), (a16, bins))

    rec("raster bwd kernel", lambda a, b, f, gp: RZ._backward_impl(
        a, b.tile_offsets, gp[:, :RZ.NUM_GPIX], ntx, nty, s),
        (a16, bins, fwd_out, gpix))

    def scatter_rows(dattr, b):
        rows_ = jnp.where(b.entry_valid[:, None], dattr.T, 0.0)
        return jnp.zeros((n, 16), jnp.float32).at[b.entry_gauss].add(rows_)

    rec("grad scatter-add", scatter_rows, (a16, bins))

    # the step's REAL reduction path (sort-order segment sums; the scatter
    # above is the comparison point it replaced)
    rows_big = jnp.ones((bins.entry_gauss.shape[0], 16), jnp.float32)
    rec("grad segment-reduce", lambda rr, b: RZ.segment_reduce_entries(
        cap, rr, b.entry_valid, b.entry_source, b.gauss_counts),
        (rows_big, bins))

    # segment-reduce internals
    ids0 = jnp.arange(cap, dtype=jnp.int32)
    rec("segred/inv-sort", lambda src: jax.lax.sort((src, ids0),
                                                    num_keys=1),
        (bins.entry_source,))
    inv_pre = jax.jit(lambda src: jax.lax.sort(
        (src, ids0), num_keys=1)[1])(bins.entry_source)
    rec("segred/row-gather", lambda rr, iv: rr[iv], (rows_big, inv_pre))
    rec("segred/cumsum", lambda rr: jnp.cumsum(rr, axis=0), (rows_big,))

    # the step's actual loss path since round 3: cotangent + metrics on the
    # tile buffer (ops/tile_loss.py); the image-space stages below are the
    # small-frame fallback, kept for comparison
    from webdgs_tpu.ops.tile_loss import tile_loss_gradient
    rec("tile loss (real path)", lambda t: tile_loss_gradient(
        t, target, w, h, ntx, nty, cfg, s), (fwd_out,))

    img0 = jnp.ones((h, w, 3), jnp.float32)
    rec("loss grad (fallback)", lambda i: pixel_loss_gradient(i, target, cfg),
        (img0,))
    rec("img->tiles", lambda i: RZ.image_to_tiles(i, ntx, nty, s), (img0,))
    rec("tiles->img", lambda t: RZ.tiles_to_image(t, ntx, nty, w, h, s),
        (fwd_out,))

    g_par = jax.tree.map(lambda x: x * 1e-6, params)
    rec("adam", lambda p, gg, o: adam_step(p, gg, o, hp, aux.num_tiles),
        (params, g_par, opt0))

    # ---- full step and top-level pieces ----
    def full(p, o):
        sc = scene.with_params(p)
        return train_step(sc, o, cam, target, img_w=w, img_h=h, loss_cfg=cfg,
                          hp=hp, settings=s, entry_capacity=cap)

    rec("FULL train_step", full, (params, opt0), r=4)

    print("----", flush=True)
    total = [ms for nm, ms in rows if nm.startswith("FULL")][0]
    print(f"sum of parts vs FULL: see above; FULL = {total:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
