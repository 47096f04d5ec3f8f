"""Global runtime configuration.

The reference keeps its render settings in a `RenderSettings` uniform
(reference: src/shaders/common.wgsl:10-18, defaults at
src/renderers/tiled-forward-pass.ts:174-182).  We mirror those defaults here
as a frozen dataclass that is threaded through the render/train functions.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render settings (shapes/behavior of the compiled pipeline).

    Mirrors the reference's RenderSettings uniform defaults
    (src/renderers/tiled-forward-pass.ts:174-182):
      gaussian_scaling=1.0, point_size_px=3.0, gaussian_mode=1 ('gaussian'),
      max_splat_radius_px=128.0; tile 16x16
      (src/renderers/tiled-forward-pass.ts:18-19).
    """

    # Tile size is an execution parameter, not a semantics one: the final
    # image is identical for any tiling (pixel contributions are decided
    # by the per-splat extent/alpha tests, not by tile membership).  The
    # reference uses 16x16 (tiled-forward-pass.ts:18-19); the on-chip
    # sweep measured 32x16 ~15% faster end to end on a v5e chip (fewer
    # tiles -> fewer entries and ranges; (512, K) VPU/MXU blocks) —
    # 35.3 vs 30.7 it/s at 100k/800x600 — and it halves the tile count
    # against the 16-bit tile-key ceiling.
    tile_w: int = 32
    tile_h: int = 16
    # Splat-size multiplier — the reference's "Gaussian scale" slider
    # (index.html:246, main.ts:369-372).  Its tiled path declares but never
    # reads the uniform; here it multiplies the decoded stddev.
    gaussian_scaling: float = 1.0
    # Screen-space radius cap in pixels; <=0 disables (reference default 128).
    max_splat_radius_px: float = 128.0
    # Reference enforces <=2048 tiles touched per Gaussian
    # (src/shaders/tiled-forward.wgsl:275).
    max_tiles_per_gaussian: int = 2048
    # Sizing heuristic for the padded tile-entry capacity: avg tiles/Gaussian.
    # The reference budgets 30 (src/renderers/tiled-forward-pass.ts:137); we
    # default to 12 because every O(capacity) op (sort, gathers, kernels)
    # pays for the padding, and trained scenes average well below this.
    # Gaussians beyond the budget are dropped whole for that frame.
    avg_tiles_per_gaussian: int = 12
    # Hard cap on tile entries, like the reference's 128MB key-buffer /
    # prefix-sum limits (src/renderers/tiled-forward-pass.ts:147-152).
    max_tile_entries: int = 2 ** 25  # 32M entries
    # Background color composited behind the splats
    # (src/shaders/tiled-rasterizer.wgsl:58: black).
    background: tuple[float, float, float] = (0.0, 0.0, 0.0)
    # Splats per chunk processed by the rasterizer kernel (MXU K dimension).
    # The on-chip sweep: 128 > 256 > 512 end to end (30.7 / 29.0 / 23.4
    # it/s at 16x16 tiles) — the prefix matmul's K^2 cost outgrows the
    # fewer-iterations win.
    chunk: int = 128
    # Tiles processed per Pallas grid step in the rasterizer/importance
    # kernels (the tile grid is padded to a multiple; padding tiles have
    # empty ranges).  Measured on a v5e chip at 800x600/100k: g=8 is
    # SLOWER than g=1 (31.0 vs 29.0 ms full step) — grid-step overhead is
    # negligible for these kernels (their DMA pipelines hide it), and
    # grouping delays the output block's write-out.  Kept as a sweep knob.
    tiles_per_step: int = 1
    # Entry chunks fetched per DMA in the rasterizer kernels.  Measured on
    # a v5e chip at 786k entries (scripts/exp_bwd_ablate.py, low-opacity
    # scene, no early exit): fwd/bwd 7.60/9.00 ms at gd=1, 7.81/9.54 at 2,
    # 8.21/11.29 at 4, 10.40/16.23 at 8 — batching strictly HURTS.  The
    # kernels are VPU-compute-bound (~15-20 (P,K) ops survive even with
    # alpha/cumsum/dot stubs, ~1.1 us/chunk), so the 8 KB chunk DMAs
    # already hide behind compute and grouping only adds VMEM pressure and
    # a bigger unrolled body.  Kept as a sweep knob; the group path clamps
    # the last window to the entry buffer and masks lanes below the
    # group's nominal start, so no caller-side capacity alignment is
    # required at any value.
    dma_group: int = 1
    # Early-termination transmittance threshold. The reference skips a splat
    # once accumulated alpha exceeds 0.99 (tiled-rasterizer.wgsl:224), i.e.
    # T < 0.01.
    t_threshold: float = 0.01
    # Minimum alpha for a splat to contribute; the reference uses 1/255 for
    # contributor tracking and backward skipping
    # (tiled-rasterizer.wgsl:238, tiled-backward-rasterize.wgsl:116).
    alpha_min: float = 1.0 / 255.0
    # Alpha clamp (tiled-rasterizer.wgsl:233).
    alpha_max: float = 0.99
    # Entry capacity above which per-Gaussian gradient accumulation uses the
    # prefix-sum segment reduction in expansion order instead of an XLA
    # scatter-add (see ops/rasterize.pack_entry_attrs).  Measured on v5e:
    # the scatter costs 16.4 ms at 530k entries into 100k Gaussians (XLA
    # serializes row updates) and 289 ms at 3.5M into 1M; the prefix path
    # costs 7.2 ms / ~45 ms — so it is the default at every scale (0).
    grad_reduce_threshold: int = 0
    # Precision tier for the rasterizer kernels' general (K-contraction)
    # matmuls: "bf16x3" = manual hi+lo bf16 split, 3 single-pass MXU matmuls
    # with ~f16-class error (the same class as the reference's f16 splat
    # attributes); "highest" = Mosaic's HIGHEST (6 passes, f32-exact).
    # The compositing prefix always uses the exact hi+lo split (the 0/1
    # triangle factor is exact in bf16, so 2 passes suffice there).
    matmul_precision: str = "bf16x3"
    # Cull (gaussian, tile) pairs whose maximum alpha over the tile's pixel
    # box is provably < alpha_min (exact convex-quadratic min over the box,
    # conservatively rounded).  The rasterizer's alpha_min mask already
    # zeroes every pixel of such pairs, so the image and gradients are
    # unchanged; the reference's SnugBox rect binning
    # (tiled-forward.wgsl:298-354) over-covers by ~24% at the bench scene
    # and every O(entries) stage (sort, gathers, kernels, adaptive
    # capacity) shrinks with the cull.  Off = reference-exact rect binning.
    # Epsilon-class assumption: the cull's conservatism margins
    # (qthr*(1+1e-5)+1e-4, qmin*(1-2^-12), 1e-3 px extent slack;
    # ops/binning.py:_cull_bitmask) are empirical slack against the
    # kernel's independently-rounded f32 alpha evaluation, not derived
    # error bounds — a pair whose max alpha sits within ~2^-12 of
    # alpha_min could in principle be culled while the kernel would have
    # kept it at one pixel (an alpha_min-scale contribution).  A
    # randomized sweep of opacities through the alpha_min boundary
    # (tests/test_binning.py::test_tile_cull_image_identical_near_threshold)
    # empirically bounds the margin: no discrepancy observed.
    tile_cull: bool = True
    # Gather the backward pass's per-entry gradient rows at f16 width in
    # the expansion-order permutation (ops/rasterize.py:
    # segment_reduce_entries).  Round-5 on-chip A/B (10k iters, 800x600,
    # identical seeds): f16 costs ~1.5 dB of holdout PSNR (16.69 vs
    # 18.28) at IDENTICAL trained-scene speed once the segsum kernel
    # removed the downstream (E,16) traffic — so the default is the f32
    # gather (also closer to the reference's ~1e-6-resolution fixed-point
    # accumulators, common.wgsl:110-121, than f16's 1e-3 relative
    # quantization).  True = the opt-in speed mode: the half-width
    # permutation gather saves ~2 ms/step at 6-figure splat counts
    # (clamped to +-65000 before the cast — unclamped f16 overflow
    # DIVERGED real training, RESULTS.md round-5 capture 2).
    grad_rows_f16: bool = False
    # Accumulate per-Gaussian gradient sums with the Pallas block-matmul
    # segment-sum kernel (ops/segsum.py) instead of the XLA
    # convert + (E, C) cumsum + boundary-difference chain, whose every
    # (E, C) materialization is lane-padded 16 -> 128 on TPU (8x phantom
    # HBM traffic; ~2.3 ms of the 16.7 ms round-5 step at the bench
    # shape).  Applies to the f16 row tier only; False restores the XLA
    # prefix-difference path.
    segsum_kernel: bool = True
    # Run the ragged per-Gaussian expansion (counts -> per-entry ids +
    # binning words) as the Pallas kernel in ops/expand.py instead of the
    # XLA scatter+cummax repeat + lane-padded (E, 5) row-gather chain
    # (~2.5 ms of the round-5 step).  False restores the XLA path.
    expand_kernel: bool = True
    # Exchange packed entry rows as f16 over ICI in the gaussian-sharded
    # paths (halves all_to_all bytes: 32B -> 16B per entry + 4B key).
    # Centers are encoded tile-relative before the cast so the f16 mantissa
    # covers sub-pixel detail at any frame size — the same f16 class the
    # reference stores ALL its splat attributes in
    # (src/utils/load-pointcloud.ts:5-12, update-gaussians.wgsl).
    exchange_f16: bool = True

    @property
    def tile_px(self) -> int:
        return self.tile_w * self.tile_h


DEFAULT_SETTINGS = RenderSettings()


def quantize_budget(want: int | float, chunk: int, floor: int) -> int:
    """Round a capacity request UP to a coarse geometric ladder (~8 rungs
    per octave), in ``chunk`` multiples.

    Every distinct value of a static budget is a separate XLA compilation
    (20-40 s on a real chip), so a budget that tracks a steadily-growing
    observation (entry counts during densification, the viewer's per-frame
    capacity during live training) must move in rungs, not chunk steps —
    chunk-granular growth would retrigger a recompile at nearly every
    adaptation interval while the scene grows.  Rung spacing ~16% costs at
    most that much extra buffer over the exact request."""
    want = max(int(want), floor, chunk)
    g = max(1 << max(want.bit_length() - 3, 0), chunk)
    return -(-(-(-want // g) * g) // chunk) * chunk


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for this process.

    Entry points (CLI, bench, profiling scripts) call this so FRESH
    processes reuse compiled executables — the TPU tunnel flaps, the
    capture scripts probe from fresh subprocesses, and re-paying 20-40 s
    first-compiles per window wastes most of a short window.  The cache
    key hashes the HLO, so stale code never produces stale executables.

    ``WEBDGS_COMP_CACHE=0`` disables; ``WEBDGS_COMP_CACHE=<dir>``
    overrides the location (default ``~/.cache/webdgs_jax``)."""
    env = os.environ.get("WEBDGS_COMP_CACHE", "")
    if env in ("0", "false", "False"):
        return
    cache_dir = path or env or os.path.expanduser("~/.cache/webdgs_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: cache is an optimization only


@functools.cache
def use_interpret_mode() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    TPU backends compile the kernels; CPU (tests, virtual-device meshes) runs
    them interpreted.  Override with WEBDGS_INTERPRET=0/1.
    """
    env = os.environ.get("WEBDGS_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "tpu"
