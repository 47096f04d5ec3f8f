"""Measure tile-binning over-coverage: what fraction of (gaussian, tile)
entries can contribute NO pixel above alpha_min in their tile?

The reference (and this port) bins by the SnugBox rect — conservative.
An exact convex-quadratic min over the tile's pixel box identifies pairs
whose max alpha over the whole tile is < 1/255: the rasterizer's alpha_min
mask already zeroes every pixel of such pairs, so culling them at binning
time changes NOTHING in the image but shrinks every O(entries) stage.

Also reports the EXTENT-box refinement (intersect the tile box with the
SnugBox before the quadratic min — the kernel also masks |dx|>ex), and
the per-tile count distribution impact (kernel time follows the max/total
chunk count, not just E).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    ckpt = os.environ.get("WEBDGS_CULL_CHECKPOINT")
    if ckpt:
        from webdgs_tpu.io.checkpoint import load_checkpoint
        scene, _, _ = load_checkpoint(ckpt)
        n = scene.means.shape[0]
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    s = RenderSettings(chunk=128)
    ntx, nty = B.tile_grid(w, h, s)

    params = scene.params()
    attrs, aux = project_gaussians(params, scene.alive, cam, w, h, 0, s,
                                   detach_color=True)
    e_cap = 786432
    key, g, counts, total, keep, _ = B.expand_entries(aux, ntx, e_cap)
    total = int(total)
    key = np.asarray(key)[:total]
    g = np.asarray(g)[:total]
    tile = (key >> 16).astype(np.int64)
    tx, ty = tile % ntx, tile // ntx

    cx = np.asarray(attrs.center_px)[g]  # (E, 2)
    con = np.asarray(attrs.conic)[g]  # (E, 3)
    op = np.asarray(attrs.opacity)[g]
    ex = np.asarray(attrs.extents)[g]

    # tile pixel-center box
    x0 = tx * s.tile_w + 0.5
    x1 = x0 + (s.tile_w - 1)
    y0 = ty * s.tile_h + 0.5
    y1 = y0 + (s.tile_h - 1)
    # intersect with the SnugBox extent box (kernel masks |dx|>ex too)
    x0e = np.maximum(x0, cx[:, 0] - ex[:, 0])
    x1e = np.minimum(x1, cx[:, 0] + ex[:, 0])
    y0e = np.maximum(y0, cx[:, 1] - ex[:, 1])
    y1e = np.minimum(y1, cx[:, 1] + ex[:, 1])
    empty_box = (x0e > x1e) | (y0e > y1e)

    def qmin(bx0, bx1, by0, by1):
        """Exact min of a*dx^2+2b*dxdy+c*dy^2 over box (relative coords)."""
        a, b, c = con[:, 0], con[:, 1], con[:, 2]
        dx0, dx1 = bx0 - cx[:, 0], bx1 - cx[:, 0]
        dy0, dy1 = by0 - cx[:, 1], by1 - cx[:, 1]
        inside_x = (dx0 <= 0) & (dx1 >= 0)
        inside_y = (dy0 <= 0) & (dy1 >= 0)
        best = np.where(inside_x & inside_y, 0.0, np.inf)

        def edge_x(dxf):  # dx fixed, minimize over dy in [dy0, dy1]
            dy = np.clip(-b * dxf / np.maximum(c, 1e-12), dy0, dy1)
            return a * dxf * dxf + 2 * b * dxf * dy + c * dy * dy

        def edge_y(dyf):
            dx = np.clip(-b * dyf / np.maximum(a, 1e-12), dx0, dx1)
            return a * dx * dx + 2 * b * dx * dyf + c * dyf * dyf

        for v in (edge_x(dx0), edge_x(dx1), edge_y(dy0), edge_y(dy1)):
            best = np.minimum(best, v)
        return best

    # pure tile box (no extent intersection)
    q_tile = qmin(x0, x1, y0, y1)
    amax_tile = np.minimum(op * np.exp(-0.5 * q_tile), s.alpha_max)
    cull_q = amax_tile < s.alpha_min

    q_ext = qmin(x0e, x1e, y0e, y1e)
    amax_ext = np.where(empty_box, 0.0,
                        np.minimum(op * np.exp(-0.5 * q_ext), s.alpha_max))
    cull_qe = amax_ext < s.alpha_min

    print(f"entries (rect binning):        {total}")
    print(f"culled by tile-box qmin:       {cull_q.sum()} "
          f"({100.0 * cull_q.mean():.1f}%)")
    print(f"culled by extent+tile qmin:    {cull_qe.sum()} "
          f"({100.0 * cull_qe.mean():.1f}%)")

    # per-tile totals before/after (kernel chunk count follows these)
    t_before = np.bincount(tile, minlength=ntx * nty)
    t_after = np.bincount(tile[~cull_qe], minlength=ntx * nty)
    kc = lambda c: int(np.sum(-(-c // s.chunk)))
    print(f"chunk count before/after:      {kc(t_before)} / {kc(t_after)}"
          f" ({100.0 * kc(t_after) / max(kc(t_before), 1):.1f}%)")
    print(f"max tile count before/after:   {t_before.max()} / {t_after.max()}")


if __name__ == "__main__":
    main()
