"""Sub-profile binning internals and the backward path, chained in-graph."""

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
    from webdgs_tpu.core.scene import scene_from_arrays
    from webdgs_tpu.ops import binning as B
    from webdgs_tpu.ops import rasterize as RZ
    from webdgs_tpu.ops.loss import LossConfig, pixel_loss_gradient
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
    ntx, nty = B.tile_grid(w, h, s)
    cfg = LossConfig()

    attrs, aux = jax.jit(lambda p: project_gaussians(
        p, scene.alive, cam, w, h, 0, s))(scene.params())
    bins = jax.jit(lambda a: B.bin_splats(a, w, h, s, capacity=cap))(aux)
    a16 = jax.jit(lambda at, bi: RZ.pack_entry_attrs(
        at, bi.entry_gauss, bi.entry_valid, s))(attrs, bins)
    fwd_out = jax.jit(lambda a, o: RZ.rasterize_tiles(a, o, ntx, nty, s))(
        a16, bins.tile_offsets)
    gpix = fwd_out * 1e-3

    total_tiles = ntx * nty
    chunk = s.chunk
    e_cap = cap
    pad_cap = total_tiles * chunk

    def leaf_sum(o):
        return jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32).ravel()[:4])

    def bench(name, stage, arg):
        def run(x):
            acc = jnp.float32(0)
            for _ in range(R):
                out = stage(x, acc * 1e-30)
                acc = acc + leaf_sum(out)
            return acc
        f = jax.jit(run)
        _ = float(f(arg))
        t0 = time.perf_counter()
        _ = float(f(arg))
        print(f"{name:26s} {(time.perf_counter()-t0)/R*1e3:7.2f} ms",
              flush=True)

    # binning sub-stages (salt perturbs depth to defeat CSE)
    def sub_expand(aux_in, salt):
        aux2 = aux_in._replace(depth=aux_in.depth + salt)
        counts = jnp.where(jnp.cumsum(aux2.num_tiles) <= e_cap,
                           aux2.num_tiles, 0)
        g = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                       total_repeat_length=e_cap)
        return g

    def sub_expand_gather(aux_in, salt):
        aux2 = aux_in._replace(depth=aux_in.depth + salt)
        counts = jnp.where(jnp.cumsum(aux2.num_tiles) <= e_cap,
                           aux2.num_tiles, 0)
        cum = jnp.cumsum(counts)
        g = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                       total_repeat_length=e_cap)
        fields = jnp.stack([cum - counts, aux2.tile_min[:, 0],
                            aux2.tile_min[:, 1], aux2.tile_dims[:, 0],
                            aux2.depth.astype(jnp.int32)], axis=1)
        return fields[g]

    key0 = jnp.asarray(rng.integers(0, 2**31 - 1, e_cap + pad_cap)
                       .astype(np.uint32))
    payload = jnp.asarray(rng.integers(0, n, e_cap + pad_cap)
                          .astype(np.int32))

    def sub_sort(k, salt):
        kk = k ^ salt.astype(jnp.uint32)
        return jax.lax.sort((kk, payload), num_keys=1)[1]

    def sub_full_bin(aux_in, salt):
        aux2 = aux_in._replace(depth=aux_in.depth + salt)
        return B.bin_splats(aux2, w, h, s, capacity=cap)

    bench("bin: expand(repeat)", sub_expand, aux)
    bench("bin: expand+gather", sub_expand_gather, aux)
    bench("bin: sort 1.05M", sub_sort, key0)
    bench("bin: full", sub_full_bin, aux)

    # backward sub-stages (salt perturbs attrs)
    def sub_bwd_kernel(a, salt):
        return RZ._backward_impl(a + salt, bins.tile_offsets, fwd_out, gpix,
                                 ntx, nty, s)

    def sub_pack_vjp(a, salt):
        _, vjp = jax.vjp(lambda at: RZ.pack_entry_attrs(
            at._replace(opacity=at.opacity + salt), bins.entry_gauss,
            bins.entry_valid, s), attrs)
        return vjp(a16)[0]

    def sub_loss_grad(img, salt):
        return pixel_loss_gradient(img + salt, jnp.zeros_like(img), cfg)

    img0 = jnp.zeros((h, w, 3), jnp.float32)

    def sub_proj_vjp(p, salt):
        p2 = {**p, "means": p["means"] + salt}
        a, vjp, _ = jax.vjp(lambda pp: project_gaussians(
            pp, scene.alive, cam, w, h, 0, s), p2, has_aux=True)
        return vjp(a)[0]

    bench("bwd: kernel", sub_bwd_kernel, a16)
    bench("bwd: pack-vjp scatter", sub_pack_vjp, a16)
    bench("bwd: loss grad", sub_loss_grad, img0)
    bench("bwd: proj vjp", sub_proj_vjp, scene.params())


if __name__ == "__main__":
    main()
