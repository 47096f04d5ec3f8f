"""Pallas ragged-expansion kernel (ops/expand.py) vs the XLA repeat+gather
path: identical per-entry words, ids, and sort keys on every valid slot."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from webdgs_tpu.config import DEFAULT_SETTINGS
from webdgs_tpu.ops.expand import NWORDS, expand_fields


@pytest.mark.parametrize("n,e_cap,seed", [
    (100, 512, 0),
    (700, 2048, 1),      # several blocks
    (1300, 4096, 2),     # ragged, blocks > 2
    (40, 512, 3),        # n << block
])
def test_expand_fields_matches_repeat(n, e_cap, seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 9, n).astype(np.int32)
    while counts.sum() > e_cap:
        counts[rng.integers(0, n)] = 0
    total = int(counts.sum())
    words = rng.integers(-2**31, 2**31 - 1, (NWORDS, n),
                         dtype=np.int64).astype(np.int32)
    ew, ids = expand_fields(jnp.asarray(words), jnp.asarray(counts), e_cap)
    ew, ids = np.asarray(ew), np.asarray(ids)
    ids_ref = np.repeat(np.arange(n, dtype=np.int32), counts)
    np.testing.assert_array_equal(ids[:total], ids_ref)
    for wi in range(NWORDS):
        np.testing.assert_array_equal(ew[wi, :total], words[wi][ids_ref],
                                      err_msg=f"word {wi}")


@pytest.mark.parametrize("cull", [True, False])
def test_expand_entries_kernel_matches_xla(cull):
    """Full expand_entries: keys/ids/counts identical between the kernel
    and XLA paths on valid slots (invalid slots carry sentinel keys in
    both)."""
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.ops.binning import expand_entries
    from webdgs_tpu.ops.projection import project_gaussians

    from tests.test_render_forward import random_scene

    scene = random_scene(300, seed=5)
    w = h = 96
    cam = default_camera(w, h, position=(0.0, 0.0, -5.0))
    s_k = dataclasses.replace(DEFAULT_SETTINGS, expand_kernel=True,
                              tile_cull=cull)
    s_x = dataclasses.replace(DEFAULT_SETTINGS, expand_kernel=False,
                              tile_cull=cull)
    attrs, aux = project_gaussians(scene.params(), scene.alive, cam, w, h,
                                   scene.sh_deg, s_k)
    ntx = -(-w // s_k.tile_w)
    e_cap = 2048
    k_out = expand_entries(aux, ntx, e_cap, attrs=attrs, settings=s_k)
    x_out = expand_entries(aux, ntx, e_cap, attrs=attrs, settings=s_x)
    key_k, g_k, counts_k, total_k, keep_k, demand_k = k_out
    key_x, g_x, counts_x, total_x, keep_x, demand_x = x_out
    total = int(total_k)
    assert total == int(total_x) and total > 0
    np.testing.assert_array_equal(np.asarray(counts_k), np.asarray(counts_x))
    np.testing.assert_array_equal(np.asarray(key_k)[:total],
                                  np.asarray(key_x)[:total])
    # sentinel tail in BOTH paths (key is where(valid)-masked)
    np.testing.assert_array_equal(np.asarray(key_k)[total:],
                                  np.full(e_cap - total, 0xFFFFFFFF,
                                          np.uint32))
    np.testing.assert_array_equal(np.asarray(g_k)[:total],
                                  np.asarray(g_x)[:total])
    assert int(demand_k) == int(demand_x)
