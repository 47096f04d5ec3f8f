"""True device-time stage profile: each stage chained R times inside ONE
jit (anti-CSE via data-dependent salt), single sync, divide by R."""

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
    from webdgs_tpu.ops.loss import LossConfig
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

    def proj(params, salt):
        p2 = {**params, "means": params["means"] + salt}
        return project_gaussians(p2, scene.alive, cam, w, h, 0, s)

    def leaf_sum(o):
        return jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32).ravel()[:4])

    def make_chained(stage):
        def run(params):
            acc = jnp.float32(0)
            for _ in range(R):
                out = stage(params, acc * 1e-30)
                acc = acc + leaf_sum(out)
            return acc
        return jax.jit(run)

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
        attrs, aux = proj(params, salt)
        bins = B.bin_splats(aux, w, h, s, capacity=cap)
        a16 = RZ.pack_entry_attrs(attrs, bins.entry_gauss, bins.entry_valid, s)
        return RZ.rasterize_tiles(a16, bins.tile_offsets, ntx, nty, s)

    def stage_grads(params, salt):
        p2 = {**params, "means": params["means"] + salt}
        img, d_params, aux, _ = compute_param_grads(
            scene.with_params(p2), cam, target, w, h, cfg, s,
            parity_sh=True, entry_capacity=cap)
        return d_params

    stages = [("projection", stage_proj), ("bin", stage_bin),
              ("pack", stage_pack), ("raster_fwd", stage_fwd),
              ("full_grads", stage_grads)]
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
