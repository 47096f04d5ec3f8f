"""Cross-lower the Pallas compute paths for TPU without a TPU.

``jax.export`` with ``platforms=['tpu']`` runs the full Pallas -> Mosaic
MLIR pipeline at lowering time, so layout/op-support errors in the hand
-written kernels (the class of failure that otherwise only surfaces on the
first on-chip run and burns a chip window) are caught here on the CPU-only
CI box.  The later Mosaic->machine-code stage (VMEM budgeting, register
allocation) still needs real hardware — ``WEBDGS_TEST_TPU=1`` covers it.

The reference has no analogue: its WGSL kernels can only be validated by a
real WebGPU device (SURVEY.md section 4 — its intended browser-mode tests
were never committed).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def compiled_kernels():
    """Force interpret=False so pallas_call lowers through Mosaic."""
    from webdgs_tpu.config import use_interpret_mode

    old = os.environ.get("WEBDGS_INTERPRET")
    os.environ["WEBDGS_INTERPRET"] = "0"
    use_interpret_mode.cache_clear()
    yield
    if old is None:
        os.environ.pop("WEBDGS_INTERPRET", None)
    else:
        os.environ["WEBDGS_INTERPRET"] = old
    use_interpret_mode.cache_clear()


def _scene(n, seed=0):
    from webdgs_tpu.core.scene import scene_from_arrays

    rng = np.random.default_rng(seed)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return scene_from_arrays(
        rng.normal(0, 1.5, (n, 3)).astype(np.float32), quats=quats,
        log_scales=rng.uniform(-4.5, -2.5, (n, 3)).astype(np.float32),
        opacity_logits=rng.uniform(-1, 3, (n,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32))


def _export_tpu(fn, *args):
    import jax.export as jexp

    exported = jexp.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert "tpu" in exported.platforms
    return exported


def test_render_lowers_for_tpu(compiled_kernels):
    """Forward path: binning + the Pallas _fwd_kernel."""
    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.render.renderer import render

    w = h = 128
    settings = RenderSettings(chunk=128)
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    scene = _scene(1024)

    _export_tpu(lambda s: render(s, cam, w, h, settings).image, scene)


@pytest.mark.parametrize("chunk,tile_w,tile_h", [
    (128, 16, 16),  # bench default
    (512, 16, 16),  # sweep upper chunk
    (128, 32, 16),  # sweep wide tile
])
def test_train_step_lowers_for_tpu(compiled_kernels, chunk, tile_w, tile_h):
    """Full step: fwd + bwd rasterizer kernels, tile-space loss kernels,
    packed Adam.  The frame is big enough that supports_tile_loss is true,
    so this exercises the tile-loss Pallas kernels, not the image-space
    fallback.  Parameterized over the on-chip sweep's chunk/tile combos
    (scripts/onchip_r2.sh sweep stage) so the sweep cannot hit a fresh
    Mosaic lowering error mid-window."""
    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.ops.adam import init_adam_state
    from webdgs_tpu.ops.tile_loss import supports_tile_loss
    from webdgs_tpu.train.step import train_step

    w = h = 128
    settings = RenderSettings(chunk=chunk, tile_w=tile_w, tile_h=tile_h)
    assert supports_tile_loss(w, h, settings)
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    scene = _scene(1024)
    target = jnp.zeros((h, w, 3), jnp.float32)
    opt = init_adam_state(scene.params())

    def step(s, o):
        r = train_step(s, o, cam, target, img_w=w, img_h=h,
                       settings=settings, entry_capacity=4096)
        return r.scene.means, r.metrics["loss"]

    _export_tpu(step, scene, opt)


def test_band_tile_loss_lowers_for_tpu(compiled_kernels):
    """The band-sharded tile-loss variant (gs_train_step's loss path) has
    its own BlockSpec set (halo edge inputs are separate arrays)."""
    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.ops.loss import LossConfig
    from webdgs_tpu.ops.rasterize import NUM_OUT
    from webdgs_tpu.ops.tile_loss import HALF, band_tile_loss_gradient

    settings = RenderSettings(chunk=128)
    w = h = 64
    ntx, rows = 4, 2
    p_px = settings.tile_px
    eb = HALF * settings.tile_w
    out = jnp.zeros((rows * ntx, NUM_OUT, p_px), jnp.float32)
    halo = jnp.zeros((ntx, NUM_OUT, eb), jnp.float32)
    target = jnp.zeros((h, w, 3), jnp.float32)

    def f(out, halo_top, halo_bot, target, row_base):
        return band_tile_loss_gradient(out, halo_top, halo_bot, target,
                                       row_base, w, h, ntx, rows,
                                       LossConfig(), settings)

    _export_tpu(f, out, halo, halo, target, jnp.int32(0))


def test_importance_lowers_for_tpu(compiled_kernels):
    """Densify metric path: the double-buffered importance replay kernel."""
    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.ops.importance import view_importance_counts

    w = h = 64
    settings = RenderSettings(chunk=128)
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    scene = _scene(512)
    target = jnp.zeros((h, w, 3), jnp.float32)

    def counts(params, alive):
        return view_importance_counts(params, alive, scene.sh_deg, cam,
                                      target, w, h, 0.5, settings)

    _export_tpu(counts, scene.params(), scene.alive)
