"""Tile-space loss kernel vs the image-space oracle path.

The oracle (ops/loss.py pixel_loss_gradient + loss_metrics on the cropped,
composited image, with the tiles->image VJP for the cotangent) is the
already-verified reproduction of the reference's loss.wgsl; the kernel must
match it everywhere, including ragged crop edges and border replication.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webdgs_tpu.config import RenderSettings
from webdgs_tpu.ops import rasterize as raster_ops
from webdgs_tpu.ops.loss import LossConfig, loss_metrics, pixel_loss_gradient
from webdgs_tpu.ops.tile_loss import supports_tile_loss, tile_loss_gradient

SETTINGS = RenderSettings()


def _oracle(out, target, img_w, img_h, ntx, nty, cfg):
    def f(o):
        tiles = raster_ops.tiles_to_image(o, ntx, nty, img_w, img_h,
                                          SETTINGS)
        return raster_ops.composite_background(tiles, SETTINGS)

    image, vjp = jax.vjp(f, out)
    pgrad = pixel_loss_gradient(image, target, cfg)
    (dpix,) = vjp(pgrad)
    return dpix, loss_metrics(image, target, cfg)


@pytest.mark.parametrize("img_w,img_h", [
    (64, 64), (70, 52), (48, 48),
    (33, 20),   # minimum legal frame: ntx=3 with a 1-px-wide last column
    (49, 33),   # fractional tiles on both axes, ntx=4 boundary
])
def test_tile_loss_matches_oracle(img_w, img_h):
    cfg = LossConfig()
    ntx = -(-img_w // SETTINGS.tile_w)
    nty = -(-img_h // SETTINGS.tile_h)
    assert supports_tile_loss(img_w, img_h, SETTINGS)

    rng = np.random.default_rng(7)
    n_tiles = ntx * nty
    out = np.zeros((n_tiles, raster_ops.NUM_OUT, SETTINGS.tile_px),
                   np.float32)
    out[:, 0:3, :] = rng.random((n_tiles, 3, SETTINGS.tile_px)) * 0.9
    out[:, 3, :] = rng.random((n_tiles, SETTINGS.tile_px))
    out[:, raster_ops.OUT_T, :] = rng.random((n_tiles, SETTINGS.tile_px))
    target = rng.random((img_h, img_w, 3)).astype(np.float32)

    out = jnp.asarray(out)
    target = jnp.asarray(target)

    dpix_ref, met_ref = _oracle(out, target, img_w, img_h, ntx, nty, cfg)
    dpix, met = tile_loss_gradient(out, target, img_w, img_h, ntx, nty,
                                   cfg, SETTINGS)

    np.testing.assert_allclose(np.asarray(dpix), np.asarray(dpix_ref),
                               rtol=1e-5, atol=1e-6)
    for k in ("l1", "l2", "dssim", "loss", "psnr"):
        np.testing.assert_allclose(float(met[k]), float(met_ref[k]),
                                   rtol=1e-5, err_msg=k)


def test_tile_loss_zero_diff_zero_l1l2():
    """pred == target: l1/l2 vanish; the dssim term may not (ssim != 1 at
    nonuniform patches is a property of the formula, same in the oracle)."""
    cfg = LossConfig(lambda_l1=1.0, lambda_l2=1.0, lambda_dssim=0.0)
    img_w = img_h = 64
    ntx = nty = 4
    rng = np.random.default_rng(3)
    target = rng.random((img_h, img_w, 3)).astype(np.float32)
    # build tiles whose composited value equals the target exactly
    tiles = raster_ops.image_to_tiles(jnp.asarray(target), ntx, nty,
                                      SETTINGS)
    out = jnp.zeros((ntx * nty, raster_ops.NUM_OUT, SETTINGS.tile_px),
                    jnp.float32)
    bg = jnp.asarray(SETTINGS.background)
    # image_to_tiles yields channel-minor (T, P, 3); the planar buffer
    # wants (T, 3, P)
    out = out.at[:, 0:3, :].set(jnp.transpose(tiles, (0, 2, 1))
                                - bg[:, None] * 0.0)
    dpix, met = tile_loss_gradient(out, jnp.asarray(target), img_w, img_h,
                                   ntx, nty, cfg, SETTINGS)
    assert float(met["l1"]) < 1e-6
    assert float(met["l2"]) < 1e-10
    np.testing.assert_allclose(np.asarray(dpix[:, 1, :]), 0.0, atol=1e-6)


def test_train_step_tile_path_matches_image_path():
    """Full train_step at a tile-loss-supported size vs a manually-composed
    image-space step: same scene update, same metrics."""
    from tests.test_render_forward import random_scene
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.ops.adam import AdamHyperparameters, adam_step, \
        init_adam_state
    from webdgs_tpu.train.step import compute_param_grads, train_step
    from webdgs_tpu.ops.tile_loss import supports_tile_loss

    w, h = 70, 52
    assert supports_tile_loss(w, h, SETTINGS)
    scene = random_scene(64, seed=11)
    cam = default_camera(w, h, position=(0.0, 0.0, -5.0))
    rng = np.random.default_rng(5)
    target = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
    opt = init_adam_state(scene.params())
    cfg = LossConfig()
    hp = AdamHyperparameters()

    res = train_step(scene, opt, cam, target, img_w=w, img_h=h,
                     loss_cfg=cfg, hp=hp, settings=SETTINGS)

    image, d_params, aux, _ = compute_param_grads(
        scene, cam, target, w, h, cfg, SETTINGS, parity_sh=True)
    ref_params, ref_opt = adam_step(scene.params(), d_params, opt, hp,
                                    aux.num_tiles)
    ref_metrics = loss_metrics(image, target, cfg)

    for k in scene.params():
        np.testing.assert_allclose(
            np.asarray(res.scene.params()[k]),
            np.asarray(ref_params[k]), rtol=1e-4, atol=1e-7, err_msg=k)
    for k in ("loss", "l1", "psnr"):
        np.testing.assert_allclose(float(res.metrics[k]),
                                   float(ref_metrics[k]), rtol=1e-5,
                                   err_msg=k)


def test_band_tile_loss_matches_full():
    """Band-sharded tile loss (2-pixel boundary slices from the vertical
    neighbors) must reproduce the full-frame kernel bit for bit on every
    band — including a ragged bottom edge and garbage halos at the frame
    borders (the clamped selects must never read them)."""
    from webdgs_tpu.ops.tile_loss import (band_tile_loss_gradient,
                                          halo_slices)

    cfg = LossConfig()
    img_w, img_h = 70, 52
    ntx = -(-img_w // SETTINGS.tile_w)   # 5
    nty = -(-img_h // SETTINGS.tile_h)   # 4
    d, rows = 4, 1
    assert nty == d * rows

    rng = np.random.default_rng(17)
    n_tiles = ntx * nty
    out = np.zeros((n_tiles, raster_ops.NUM_OUT, SETTINGS.tile_px),
                   np.float32)
    out[:, 0:3, :] = rng.random((n_tiles, 3, SETTINGS.tile_px)) * 0.9
    out[:, raster_ops.OUT_T, :] = rng.random((n_tiles, SETTINGS.tile_px))
    target = rng.random((img_h, img_w, 3)).astype(np.float32)
    out = jnp.asarray(out)
    target = jnp.asarray(target)

    dpix_full, met_full = tile_loss_gradient(out, target, img_w, img_h,
                                             ntx, nty, cfg, SETTINGS)

    eb = 2 * SETTINGS.tile_w  # HALF * tile_w boundary slice
    garbage = jnp.asarray(
        rng.random((ntx, raster_ops.NUM_OUT, eb)) * 5.0, jnp.float32)
    dpix_bands, sums_bands = [], []
    for b in range(d):
        lo, hi = b * rows * ntx, (b + 1) * rows * ntx
        bot_above, _ = halo_slices(out[lo - ntx:lo], ntx, SETTINGS)
        _, top_below = halo_slices(out[hi:hi + ntx], ntx, SETTINGS)
        halo_top = bot_above if b > 0 else garbage
        halo_bot = top_below if b < d - 1 else garbage
        dpix_b, sums_b = band_tile_loss_gradient(
            out[lo:hi], halo_top, halo_bot, target,
            jnp.int32(b * rows), img_w, img_h, ntx, rows, cfg, SETTINGS)
        dpix_bands.append(np.asarray(dpix_b))
        sums_bands.append(np.asarray(sums_b))

    np.testing.assert_array_equal(
        np.concatenate(dpix_bands, axis=0), np.asarray(dpix_full))
    from webdgs_tpu.ops.tile_loss import metrics_from_sums
    tot = jnp.asarray(np.concatenate(sums_bands, axis=0).sum(axis=0))
    met = metrics_from_sums(tot, cfg)
    for k in ("l1", "l2", "dssim", "loss", "psnr"):
        np.testing.assert_allclose(float(met[k]), float(met_full[k]),
                                   rtol=1e-6, err_msg=k)
