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

__all__ = ["__version__"]
