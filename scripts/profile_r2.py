"""Round-2 device-time stage profile: each stage chained R times inside ONE
jit (anti-CSE via data-dependent salt), single sync, divide by R.

Stages are cumulative prefixes of the train step, so consecutive deltas
give per-stage device time."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = 8


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
    from webdgs_tpu.train.step import compute_param_grads
    from webdgs_tpu.core.scene import scene_from_arrays

    n = 100_000
    w, h = 800, 600
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
    cap = 786432
    ntx, nty = B.tile_grid(w, h, s)
    cfg = LossConfig()
    target = jnp.zeros((h, w, 3), jnp.float32)
    opt0 = init_adam_state(scene.params())
    hp = AdamHyperparameters()

    def proj(params, salt):
        p2 = {**params, "means": params["means"] + salt}
        return project_gaussians(p2, scene.alive, cam, w, h, 0, s,
                                 detach_color=True)

    def leaf_sum(o):
        leaves = [x for x in jax.tree.leaves(o)
                  if hasattr(x, "dtype") and x.dtype != jnp.bool_]
        return sum(jnp.sum(x.astype(jnp.float32).ravel()[:4]) for x in leaves[:3])

    def make_chained(stage):
        def run(params):
            acc = jnp.float32(0)
            for _ in range(R):
                out = stage(params, acc * 1e-30)
                acc = acc + leaf_sum(out)
            return acc
        return jax.jit(run)

    def fwd_parts(params, salt):
        attrs, aux = proj(params, salt)
        bins = B.bin_splats(aux, w, h, s, capacity=cap)
        a16 = RZ.pack_entry_attrs(attrs, bins.entry_gauss, bins.entry_valid, s)
        out = RZ.rasterize_tiles(a16, bins.tile_offsets, ntx, nty, s)
        tiles = RZ.tiles_to_image(out, ntx, nty, w, h, s)
        return RZ.composite_background(tiles, s), aux

    def stage_proj(params, salt):
        return proj(params, salt)

    def stage_bin(params, salt):
        _, aux = proj(params, salt)
        return B.bin_splats(aux, w, h, s, capacity=cap)

    def stage_pack(params, salt):
        attrs, aux = proj(params, salt)
        bins = B.bin_splats(aux, w, h, s, capacity=cap)
        return RZ.pack_entry_attrs(attrs, bins.entry_gauss, bins.entry_valid, s)

    def stage_fwd(params, salt):
        img, _ = fwd_parts(params, salt)
        return img

    def stage_loss(params, salt):
        img, _ = fwd_parts(params, salt)
        return pixel_loss_gradient(img, target, cfg)

    def stage_raster_bwd(params, salt):
        # forward + loss grad + rasterizer VJP back to per-gaussian attrs,
        # WITHOUT the projection VJP
        attrs, aux = proj(params, salt)
        bins = B.bin_splats(aux, w, h, s, capacity=cap)

        def img_fn(a):
            a16 = RZ.pack_entry_attrs(a, bins.entry_gauss, bins.entry_valid, s)
            out = RZ.rasterize_tiles(a16, bins.tile_offsets, ntx, nty, s)
            tiles = RZ.tiles_to_image(out, ntx, nty, w, h, s)
            return RZ.composite_background(tiles, s)

        img, vjp = jax.vjp(img_fn, attrs)
        pg = pixel_loss_gradient(img, target, cfg)
        (d_attrs,) = vjp(pg)
        return d_attrs

    def stage_grads(params, salt):
        p2 = {**params, "means": params["means"] + salt}
        img, d_params, aux, _ = compute_param_grads(
            scene.with_params(p2), cam, target, w, h, cfg, s,
            parity_sh=True, entry_capacity=cap)
        return d_params

    def stage_full(params, salt):
        p2 = {**params, "means": params["means"] + salt}
        img, d_params, aux, _ = compute_param_grads(
            scene.with_params(p2), cam, target, w, h, cfg, s,
            parity_sh=True, entry_capacity=cap)
        new_params, new_opt = adam_step(p2, d_params, opt0, hp, aux.num_tiles)
        return new_params

    def stage_adam_only(params, salt):
        p2 = {**params, "means": params["means"] + salt}
        g = jax.tree.map(lambda x: x * 1e-6, p2)
        new_params, new_opt = adam_step(p2, g, opt0, hp,
                                        jnp.ones((n,), jnp.int32))
        return new_params

    stages = [("projection", stage_proj), ("bin", stage_bin),
              ("pack", stage_pack), ("raster_fwd", stage_fwd),
              ("loss_grad", stage_loss), ("raster_bwd", stage_raster_bwd),
              ("full_grads", stage_grads), ("full_step", stage_full),
              ("adam_only", stage_adam_only)]
    results = {}
    for name, fn in stages:
        f = make_chained(fn)
        _ = float(f(scene.params()))  # compile+warm
        t0 = time.perf_counter()
        _ = float(f(scene.params()))
        dt = (time.perf_counter() - t0) / R * 1e3
        results[name] = dt
        print(f"{name:12s} {dt:7.2f} ms", flush=True)

    print("--- deltas ---", flush=True)
    keys = list(results)
    for a, b in zip(keys, keys[1:]):
        print(f"{b:12s} +{results[b]-results[a]:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
