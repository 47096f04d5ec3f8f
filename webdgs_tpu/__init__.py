"""webdgs_tpu — a TPU-native differentiable 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of WebDGS
(krispy-kenay/WebDGS), a browser WebGPU 3DGS trainer/viewer.  The WGSL
compute pipeline of the reference maps here to:

* fused, vectorized JAX projection (EWA splatting, SH color, tile extents),
* `jax.lax.sort`-based tile/depth binning (replacing a hand-rolled radix
  sort + prefix scan),
* a Pallas TPU tile rasterizer whose per-pixel front-to-back compositing is
  reformulated as MXU triangular matmuls over log-transmittance prefixes,
  with a custom VJP backward kernel,
* pure-JAX Adam / densify / prune with capacity-padded static shapes,
* `shard_map` view-parallel & tile-sharded execution over TPU meshes.

See ARCHITECTURE.md for the design and SURVEY.md for the reference analysis.
"""

from webdgs_tpu.version import __version__


def __getattr__(name):
    """Lazy top-level API (keeps `import webdgs_tpu` free of jax startup)."""
    api = {
        "GaussianScene": ("webdgs_tpu.core.scene", "GaussianScene"),
        "Camera": ("webdgs_tpu.core.camera", "Camera"),
        "make_camera": ("webdgs_tpu.core.camera", "make_camera"),
        "RenderSettings": ("webdgs_tpu.config", "RenderSettings"),
        "render": ("webdgs_tpu.render.renderer", "render"),
        "Viewer": ("webdgs_tpu.render.viewer", "Viewer"),
        "Trainer": ("webdgs_tpu.train.trainer", "Trainer"),
        "TrainerConfig": ("webdgs_tpu.train.config", "TrainerConfig"),
        "load_point_cloud": ("webdgs_tpu.io.ply", "load_point_cloud"),
        "save_ply": ("webdgs_tpu.io.ply", "save_ply"),
        "load_cameras": ("webdgs_tpu.io.colmap", "load_cameras"),
        "load_images": ("webdgs_tpu.io.images", "load_images"),
    }
    if name in api:
        import importlib
        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'webdgs_tpu' has no attribute {name!r}")


__all__ = ["__version__", "GaussianScene", "Camera", "make_camera",
           "RenderSettings", "render", "Viewer", "Trainer", "TrainerConfig",
           "load_point_cloud", "save_ply", "load_cameras", "load_images"]
