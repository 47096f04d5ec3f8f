"""A/B tuning bench: chained train steps (one sync) across RenderSettings
variants.  Usage: python scripts/tune_bench.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.core.scene import scene_from_arrays
    from webdgs_tpu.ops.adam import init_adam_state
    from webdgs_tpu.render.renderer import render
    from webdgs_tpu.train.step import train_step

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

    variants = [
        ("chunk128_avg12", RenderSettings(chunk=128)),
        ("chunk256_avg12", RenderSettings(chunk=256)),
        ("chunk128_avg8", RenderSettings(chunk=128,
                                         avg_tiles_per_gaussian=8)),
        ("chunk128_cap768k", RenderSettings(chunk=128), 786432),
        ("chunk256_cap768k", RenderSettings(chunk=256), 786432),
    ]

    for entry in variants:
        name, settings = entry[0], entry[1]
        cap = entry[2] if len(entry) > 2 else None
        try:
            target = jax.jit(lambda sc: render(sc, cam, w, h,
                settings).image)(scene)
            opt = init_adam_state(scene.params())
            s, o, m = train_step(scene, opt, cam, target, img_w=w, img_h=h,
                                 settings=settings, entry_capacity=cap)
            _ = float(jnp.sum(s.means))
            t0 = time.perf_counter()
            for _ in range(20):
                s, o, m = train_step(s, o, cam, target, img_w=w, img_h=h,
                                     settings=settings, entry_capacity=cap)
            _ = float(jnp.sum(s.means))
            dt = (time.perf_counter() - t0) / 20
            print(f"{name:20s} {dt*1e3:7.1f} ms/step  "
                  f"({1/dt:5.1f} it/s)  entries={int(m['tile_entries'])}",
                  flush=True)
        except Exception as e:
            print(f"{name:20s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
