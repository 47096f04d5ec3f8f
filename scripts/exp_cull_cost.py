"""On-chip cost breakdown of the tile-cull binning path."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = 10


def main():
    import jax
    import jax.numpy as jnp

    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.core.scene import scene_from_arrays
    from webdgs_tpu.ops import binning as B
    from webdgs_tpu.ops.projection import project_gaussians

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
    attrs, aux = jax.jit(lambda p: project_gaussians(
        p, scene.alive, cam, w, h, 0, s, detach_color=True))(scene.params())
    jax.block_until_ready((attrs, aux))

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:32s} {(time.perf_counter() - t0) / R * 1e3:7.3f} ms")

    def loop(stage):
        def run(a, at):
            acc = jnp.float32(0)
            for _ in range(R):
                out = stage(a._replace(depth=a.depth + acc * 1e-30), at)
                acc = acc + sum(jnp.sum(x.astype(jnp.float32).ravel()[:4])
                                for x in jax.tree.leaves(out)[:3])
            return acc
        return run

    timed("bin_splats no-cull", loop(
        lambda a, at: B.bin_splats(a, w, h, s, capacity=cap)), aux, attrs)
    timed("bin_splats cull", loop(
        lambda a, at: B.bin_splats(a, w, h, s, capacity=cap, attrs=at)),
        aux, attrs)
    timed("expand no-cull", loop(
        lambda a, at: B.expand_entries(a, 25, cap)), aux, attrs)
    timed("expand cull", loop(
        lambda a, at: B.expand_entries(a, 25, cap, attrs=at, settings=s)),
        aux, attrs)

    key, g, counts, total, keep = jax.jit(
        lambda a, at: B.expand_entries(a, 25, cap, attrs=at, settings=s)
    )(aux, attrs)
    sk = jax.lax.sort((key,), num_keys=1)[0]
    jax.block_until_ready(sk)
    bounds = (jnp.arange(25 * 38 + 1, dtype=jnp.uint32) << 16)

    def ss(sk, b):
        acc = jnp.float32(0)
        for i in range(R):
            o = jnp.searchsorted(sk, b + jnp.uint32(0) + (acc * 0).astype(
                jnp.uint32), side="left")
            acc = acc + jnp.sum(o[:4].astype(jnp.float32))
        return acc

    timed("searchsorted 951x786k", ss, sk, bounds)


if __name__ == "__main__":
    main()
