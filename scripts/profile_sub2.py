"""Decompose the two hot stages: binning internals and backward internals."""

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
    from webdgs_tpu.ops.projection import project_gaussians
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
    total_tiles = ntx * nty
    pad_cap = total_tiles * s.chunk

    params = scene.params()
    attrs, aux = jax.jit(
        lambda p: project_gaussians(p, scene.alive, cam, w, h, 0, s,
                                    detach_color=True))(params)
    attrs = jax.tree.map(lambda x: jax.block_until_ready(x), attrs)
    bins = jax.jit(lambda a: B.bin_splats(a, w, h, s, capacity=cap))(aux)
    bins = jax.tree.map(jax.block_until_ready, bins)
    a16 = jax.jit(lambda at, b: RZ.pack_entry_attrs(
        at, b.entry_gauss, b.entry_valid, s))(attrs, bins)
    fwd_out = jax.jit(lambda a, b: RZ.rasterize_tiles(
        a, b.tile_offsets, ntx, nty, s))(a16, bins)
    gpix = jnp.ones_like(fwd_out) * 1e-3

    def leaf_sum(o):
        leaves = [x for x in jax.tree.leaves(o)
                  if hasattr(x, "dtype") and x.dtype != jnp.bool_]
        return sum(jnp.sum(x.astype(jnp.float32).ravel()[:4])
                   for x in leaves[:3])

    def chained(stage, arg0):
        def run(x):
            acc = jnp.float32(0)
            for _ in range(R):
                out = stage(x, acc * 1e-30)
                acc = acc + leaf_sum(out)
            return acc
        f = jax.jit(run)
        _ = float(f(arg0))
        t0 = time.perf_counter()
        _ = float(f(arg0))
        return (time.perf_counter() - t0) / R * 1e3

    # --- binning pieces (operating on aux, salted via depth) ---
    def salted(auxv, salt):
        return auxv._replace(depth=auxv.depth + salt)

    def p_repeat(auxv, salt):
        a2 = salted(auxv, salt)
        counts = jnp.where(jnp.cumsum(a2.num_tiles) <= cap, a2.num_tiles, 0)
        return jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                          total_repeat_length=cap)

    def p_fields(auxv, salt):
        a2 = salted(auxv, salt)
        counts = jnp.where(jnp.cumsum(a2.num_tiles) <= cap, a2.num_tiles, 0)
        g = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                       total_repeat_length=cap)
        offsets = jnp.cumsum(counts) - counts
        fields = jnp.stack([
            offsets, a2.tile_min[:, 0], a2.tile_min[:, 1],
            a2.tile_dims[:, 0],
            B._ordered_depth16(a2.depth).astype(jnp.int32)], axis=1)
        return fields[g]

    def p_hist(auxv, salt):
        a2 = salted(auxv, salt)
        keep = jnp.cumsum(a2.num_tiles) <= cap
        return B._tile_histogram(a2, keep, ntx, nty)

    def p_keys(auxv, salt):
        # everything up to (but not including) the sort
        a2 = salted(auxv, salt)
        b2 = B.bin_splats(a2, w, h, s, capacity=cap)
        return b2  # includes sort; separate below

    def p_sort_only(keys, salt):
        k2 = keys + (salt * 1e-30).astype(jnp.uint32)
        payload = jnp.arange(k2.shape[0], dtype=jnp.int32)
        return jax.lax.sort((k2, payload), num_keys=1)

    keys_arr = jnp.concatenate([
        jnp.arange(cap, dtype=jnp.uint32),
        jnp.full((pad_cap,), 0xFFFFFFFF, jnp.uint32)])

    print(f"bin/repeat      {chained(p_repeat, aux):7.2f} ms", flush=True)
    print(f"bin/rep+gather  {chained(p_fields, aux):7.2f} ms", flush=True)
    print(f"bin/hist        {chained(p_hist, aux):7.2f} ms", flush=True)
    print(f"bin/full        {chained(p_keys, aux):7.2f} ms", flush=True)
    print(f"sort_only(A={cap+pad_cap}) {chained(p_sort_only, keys_arr):7.2f} ms",
          flush=True)

    # --- backward pieces ---
    def p_bwd_kernel(a, salt):
        a2 = a + salt
        return RZ._backward_impl(a2, bins.tile_offsets,
                                 gpix[:, :RZ.NUM_GPIX],
                                 ntx, nty, s)

    def p_img_to_tiles(img, salt):
        return RZ.image_to_tiles(img + salt, ntx, nty, s)

    def p_scatter(dattr, salt):
        # the transpose of the entry gather: (A,16) rows scatter-added
        # into (N,16) — the default per-Gaussian grad accumulation
        rows = (dattr + salt).T
        out = jnp.zeros((n, 16), jnp.float32)
        idx = bins.entry_gauss
        rows = jnp.where(bins.entry_valid[:, None], rows, 0.0)
        return out.at[idx].add(rows)

    img = jnp.ones((h, w, 3), jnp.float32)
    dattr = jnp.ones_like(a16)
    print(f"bwd/kernel      {chained(p_bwd_kernel, a16):7.2f} ms", flush=True)
    print(f"bwd/img2tiles   {chained(p_img_to_tiles, img):7.2f} ms", flush=True)
    print(f"bwd/scatter     {chained(p_scatter, dattr):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
