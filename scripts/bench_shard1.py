"""Sharded-path overhead on a 1-device mesh (VERDICT r4 task 4, carried
from r3 task 3): run `dp_train_step` and `gs_train_step` on a mesh of the
single real chip at the headline bench shape and report it/s against the
plain `train_step`.

The sharded machinery (shard_map, the gs path's all_to_all/ppermute with
one participant, the exchange pack/unpack) should cost <10% over the plain
step; anything more means the multi-chip code path taxes every deployment
that compiles it with d=1.

One JSON line per variant.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from webdgs_tpu.config import RenderSettings, enable_compilation_cache
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.core.scene import scene_from_arrays
    from webdgs_tpu.ops.adam import init_adam_state
    from webdgs_tpu.parallel.sharding import (dp_train_step, gs_train_step,
                                              make_mesh)
    from webdgs_tpu.render.renderer import render_compiled
    from webdgs_tpu.train.step import train_step

    enable_compilation_cache()
    n = 100_000
    w, h = 800, 600
    rng = np.random.default_rng(0)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scene = scene_from_arrays(
        rng.normal(0, 1.5, (n, 3)).astype(np.float32),
        quats=quats,
        log_scales=rng.uniform(-4.5, -2.5, (n, 3)).astype(np.float32),
        opacity_logits=rng.uniform(-1, 3, (n,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
    )
    settings = RenderSettings()
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    target = render_compiled(scene, cam, img_w=w, img_h=h,
                             settings=settings).image

    # the bench's adaptive capacity (1.2x observed), shared by all variants
    probe = jax.jit(functools.partial(train_step, img_w=w, img_h=h,
                                      settings=settings))
    _, _, m0 = probe(scene, init_adam_state(scene.params()), cam, target)
    observed = float(m0["tile_entries"])
    cap = max(-int(-observed * 1.2 // settings.chunk) * settings.chunk,
              settings.chunk * 8)

    def time_step(fn, s0, o0, iters=20):
        s, o, _ = fn(s0, o0)
        jax.block_until_ready(s.means)
        t0 = time.perf_counter()
        for _ in range(iters):
            s, o, _ = fn(s, o)
        jax.block_until_ready(s.means)
        return (time.perf_counter() - t0) / iters

    results = {}

    opt = init_adam_state(scene.params())
    # NO donation anywhere: the three variants share `scene`, and the
    # comparison is internal (overhead identical across variants)
    plain = jax.jit(functools.partial(
        train_step, img_w=w, img_h=h, settings=settings,
        entry_capacity=cap))
    dt = time_step(lambda s, o: plain(s, o, cam, target), scene, opt)
    results["plain"] = dt

    # dp on a 1-device mesh: batch axis of exactly one view
    mesh = make_mesh(axis_name="dp")
    cams1 = jax.tree.map(lambda x: jnp.stack([x]), cam)
    tgts1 = target[None]
    opt = init_adam_state(scene.params())
    dp = jax.jit(functools.partial(
        dp_train_step, mesh=mesh, img_w=w, img_h=h, settings=settings,
        entry_capacity=cap))
    dt = time_step(lambda s, o: dp(s, o, cams1, tgts1), scene, opt)
    results["dp_1dev"] = dt

    # gs on a 1-device mesh: capacity already divisible by 1
    meshb = make_mesh(axis_name="band")
    opt = init_adam_state(scene.params())
    gs = jax.jit(functools.partial(
        gs_train_step, mesh=meshb, img_w=w, img_h=h, settings=settings,
        entry_capacity=cap))
    dt = time_step(lambda s, o: gs(s, o, cam, target), scene, opt)
    results["gs_1dev"] = dt

    base = results["plain"]
    for k, dt in results.items():
        print(json.dumps({
            "variant": k,
            "ms_per_step": round(dt * 1e3, 2),
            "iters_per_sec": round(1.0 / dt, 2),
            "overhead_vs_plain_pct": round((dt / base - 1.0) * 100.0, 1),
        }))


if __name__ == "__main__":
    main()
