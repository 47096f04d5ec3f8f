"""Serial-band rendering above the 16-bit tile-key ceiling.

The reference's key layout caps tile ids at 16 bits
(src/shaders/tiled-forward.wgsl:133-136) and has no fallback; the
single-chip banded renderer must produce pixel-identical frames to the
plain path while never building a band above the ceiling.
"""

import numpy as np
import pytest

from webdgs_tpu.config import DEFAULT_SETTINGS
from webdgs_tpu.core.camera import default_camera
from webdgs_tpu.ops import binning as binning_ops
from webdgs_tpu.render.renderer import render, render_banded

from tests.test_render_forward import random_scene


def _camera(w, h):
    return default_camera(w, h, position=(0.0, 0.0, -5.0))


@pytest.mark.parametrize("bands", [2, 3])
def test_banded_matches_plain(bands):
    scene = random_scene(97, seed=11)
    w, h = 64, 96
    cam = _camera(w, h)
    ref = np.asarray(render(scene, cam, w, h, DEFAULT_SETTINGS).image)
    got = np.asarray(render_banded(scene, cam, w, h, DEFAULT_SETTINGS,
                                   bands=bands))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_banded_auto_single_band_is_plain():
    scene = random_scene(50, seed=3)
    w, h = 64, 48
    cam = _camera(w, h)
    ref = np.asarray(render(scene, cam, w, h, DEFAULT_SETTINGS).image)
    got = np.asarray(render_banded(scene, cam, w, h, DEFAULT_SETTINGS))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_band_count_math():
    """Auto band count keeps every band under the ceiling and covers the
    grid, including a 7680x4320 (8K) frame at 16x16 tiles (129,600 tiles —
    double the ceiling; raises in the plain path today)."""
    import dataclasses
    s = dataclasses.replace(DEFAULT_SETTINGS, tile_w=16, tile_h=16)
    for w, h in [(7680, 4320), (4096, 4096), (3840, 2160)]:
        ntx, nty = binning_ops.tile_grid(w, h, s)
        rows_max = max(0xFFFE // ntx, 1)
        bands = -(-nty // rows_max)
        rows = -(-nty // bands)
        assert ntx * rows < 0xFFFF
        assert bands * rows >= nty
        if ntx * nty >= 0xFFFF:
            assert bands > 1
            with pytest.raises(ValueError):
                binning_ops.check_tile_key_limit(ntx * nty)


def test_banded_nonuniform_last_band():
    """Band rows that do not divide the grid evenly: the tail band is
    padded and cropped, not wrapped."""
    scene = random_scene(64, seed=7)
    w, h = 64, 80  # nty=5 tile rows at 16 -> bands of 2 rows, last has 1
    cam = _camera(w, h)
    ref = np.asarray(render(scene, cam, w, h, DEFAULT_SETTINGS).image)
    got = np.asarray(render_banded(scene, cam, w, h, DEFAULT_SETTINGS,
                                   bands=3))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
