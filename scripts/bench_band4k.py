"""Render a real 3840x2160 (4K) frame through the serial-band renderer on
chip and record wall time (VERDICT r4 task 6).

A 4K frame at the default 32x16 tiles is 120x135 = 16,200 tiles — under
the 16-bit ceiling at these defaults, so the interesting sizes are forced:
  * 3840x2160 at 16x16 tiles (240x135 = 32,400 tiles, still under), and
  * 7680x4320 at 16x16 (480x270 = 129,600 tiles — over the ceiling; the
    reference simply cannot render this, tiled-forward.wgsl:133-136).
To exercise the banded path at actual 4K we force bands explicitly, which
is also what a tile-key-limited configuration would do.  One JSON line per
configuration.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from webdgs_tpu.config import RenderSettings, enable_compilation_cache
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.core.scene import scene_from_arrays
    from webdgs_tpu.ops import binning as binning_ops
    from webdgs_tpu.render.renderer import render_banded

    enable_compilation_cache()
    n = 100_000
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

    configs = [
        # (w, h, tile_w, tile_h, bands)  bands=None -> auto
        (3840, 2160, 32, 16, None),   # native 4K, auto (single band grid ok)
        (3840, 2160, 32, 16, 4),      # 4K forced through 4 bands
        (7680, 4320, 16, 16, None),   # 8K at 16x16: above the ceiling, auto
    ]
    for w, h, tw, th, bands in configs:
        settings = RenderSettings(tile_w=tw, tile_h=th)
        ntx, nty = binning_ops.tile_grid(w, h, settings)
        cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
        img, ent = render_banded(scene, cam, w, h, settings, bands=bands,
                                 return_entries=True)
        np.asarray(img)  # compile + first render
        t0 = time.perf_counter()
        frames = 5
        for _ in range(frames):
            img = render_banded(scene, cam, w, h, settings, bands=bands)
            if hasattr(img, "block_until_ready"):
                img.block_until_ready()
        dt = (time.perf_counter() - t0) / frames
        arr = np.asarray(img)
        print(json.dumps({
            "size": f"{w}x{h}", "tiles": f"{ntx}x{nty}",
            "total_tiles": ntx * nty,
            "over_key_ceiling": ntx * nty >= binning_ops.TILE_KEY_LIMIT,
            "bands": ("auto" if bands is None else bands),
            "ms_per_frame": round(dt * 1e3, 1),
            "mpix_per_sec": round(w * h / 1e6 / dt, 2),
            "max_band_entries": int(ent) if ent is not None else None,
            "finite": bool(np.isfinite(arr).all()),
            "mean": round(float(arr.mean()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
