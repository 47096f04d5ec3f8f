"""On-chip ablation of the rasterizer kernels' per-chunk work.

Monkeypatches the module-level helpers the kernel bodies call
(_chunk_alpha, _lane_cumsum, _dot_general_tiered) with cheap stubs and
times _forward_impl/_backward_impl on bench-shape inputs.  The deltas
attribute the kernels' time to alpha math / prefix scans / MXU
contractions / everything-else (DMA + reductions + stores).

The scene uses LOW opacity so the saturation early-exit never fires —
work is the full chunk count in every variant (stubs corrupt the math,
which would otherwise change the early-exit point and skew timings).
"""

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
    from webdgs_tpu.ops import rasterize as RZ
    from webdgs_tpu.ops.projection import project_gaussians

    n = 100_000
    w, h = 800, 600
    rng = np.random.default_rng(0)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scene = scene_from_arrays(
        rng.normal(0, 1.5, (n, 3)).astype(np.float32), quats=quats,
        log_scales=rng.uniform(-4.5, -2.5, (n, 3)).astype(np.float32),
        # low opacity: no saturation early-exit anywhere
        opacity_logits=rng.uniform(-5, -3, (n,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    s = RenderSettings(chunk=128,
                       dma_group=int(os.environ.get("EXP_DMA_GROUP", "4")))
    cap = 786432
    ntx, nty = B.tile_grid(w, h, s)

    params = scene.params()
    attrs, aux = jax.jit(
        lambda p: project_gaussians(p, scene.alive, cam, w, h, 0, s,
                                    detach_color=True))(params)
    bins = jax.jit(lambda a: B.bin_splats(a, w, h, s, capacity=cap))(aux)
    a16 = jax.jit(lambda at, b: RZ.pack_entry_attrs(
        at, b.entry_gauss, b.entry_valid, s))(attrs, bins)
    offs = bins.tile_offsets
    fwd_out = jax.jit(lambda a, o: RZ._forward_impl(a, o, ntx, nty, s,
                                                    False))(a16, offs)
    gpix = fwd_out * 1e-3
    jax.block_until_ready((a16, offs, fwd_out, gpix))

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / R * 1e3
        print(f"{name:34s} {dt:7.3f} ms")
        return dt

    def run_fwd(a, o):
        acc = jnp.float32(0)
        for i in range(R):
            out = RZ._forward_impl(a + acc * 1e-30, o, ntx, nty, s, False)
            acc = acc + jnp.sum(out.ravel()[:4])
        return acc

    def run_bwd(a, o, f, g):
        acc = jnp.float32(0)
        for i in range(R):
            out = RZ._backward_impl(a + acc * 1e-30, o, g[:, :RZ.NUM_GPIX],
                                    ntx, nty, s)
            acc = acc + jnp.sum(out.ravel()[:4])
        return acc

    orig_alpha = RZ._chunk_alpha
    orig_cumsum = RZ._lane_cumsum
    orig_dot = RZ._dot_general_tiered

    def stub_alpha(scr, pxf, pyf, settings, mask=None):
        op = scr[RZ.ROW_OP:RZ.ROW_OP + 1, :]
        a = (pxf * 0.0 + op) * 1e-3
        if mask is not None:
            a = jnp.where(mask, a, 0.0)
        z = a * 0.5
        return a, z, z, z, z, z

    def stub_cumsum(x, k):
        return x * 1.0001

    def stub_dot(a, b, dims, settings):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)

    variants = [
        ("baseline", {}),
    ] if os.environ.get("EXP_BASELINE_ONLY") else [
        ("baseline", {}),
        ("no alpha math", {"_chunk_alpha": stub_alpha}),
        ("no lane cumsum", {"_lane_cumsum": stub_cumsum}),
        ("1-pass bf16 dots", {"_dot_general_tiered": stub_dot}),
        ("all stubs", {"_chunk_alpha": stub_alpha,
                       "_lane_cumsum": stub_cumsum,
                       "_dot_general_tiered": stub_dot}),
    ]
    for name, patches in variants:
        for k, v in patches.items():
            setattr(RZ, k, v)
        try:
            timed(f"fwd [{name}]", run_fwd, a16, offs)
            timed(f"bwd [{name}]", run_bwd, a16, offs, fwd_out, gpix)
        finally:
            RZ._chunk_alpha = orig_alpha
            RZ._lane_cumsum = orig_cumsum
            RZ._dot_general_tiered = orig_dot


if __name__ == "__main__":
    main()
