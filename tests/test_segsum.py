"""Pallas block-matmul segment-sum (ops/segsum.py): per-Gaussian gradient
accumulation.  The reference accumulates the same sums via 1e-6 fixed-point
atomics (src/shaders/common.wgsl:110-121); here the sums must be exact f32
reductions of the f16 rows, equal to a numpy groupby."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from webdgs_tpu.config import DEFAULT_SETTINGS
from webdgs_tpu.ops.rasterize import segment_reduce_entries
from webdgs_tpu.ops.segsum import segment_sum_rows


def _ref_segsum(rows, ids, n):
    out = np.zeros((n, rows.shape[1]), np.float32)
    np.add.at(out, ids, rows.astype(np.float32))
    return out


@pytest.mark.parametrize("n,e_cap,cols,seed", [
    (100, 512, 16, 0),      # e_len == CHUNK exactly
    (700, 2048, 16, 1),     # several blocks, ragged counts
    (37, 256, 16, 2),       # e_len < CHUNK (pad branch)
    (1201, 4096, 1, 3),     # single-column (importance counts shape)
])
def test_segment_sum_rows_matches_groupby(n, e_cap, cols, seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 9, n).astype(np.int32)
    while counts.sum() > e_cap:
        counts[rng.integers(0, n)] = 0
    total = int(counts.sum())
    ids_real = np.repeat(np.arange(n, dtype=np.int32), counts)
    # padding slots repeat the last id (as _repeat_ids emits) with zero rows
    pad_id = ids_real[-1] if total else 0
    ids = np.concatenate([ids_real,
                          np.full(e_cap - total, pad_id, np.int32)])
    rows = (rng.standard_normal((e_cap, cols)) * 8).astype(np.float16)
    rows[total:] = 0
    out = np.asarray(segment_sum_rows(jnp.asarray(rows.T), jnp.asarray(ids),
                                      jnp.asarray(counts)))
    ref = _ref_segsum(rows[:total], ids_real, n)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert out.shape == (n, cols)


def test_segment_reduce_kernel_matches_xla_path():
    """segment_reduce_entries with segsum_kernel on vs off: identical
    per-Gaussian sums through the full sorted->expansion machinery."""
    rng = np.random.default_rng(7)
    n, e_cap = 300, 1024
    counts = rng.integers(0, 7, n).astype(np.int32)
    while counts.sum() > e_cap:
        counts[rng.integers(0, n)] = 0
    total = int(counts.sum())
    exp_gauss = np.repeat(np.arange(n, dtype=np.int32), counts)
    exp_gauss = np.concatenate([
        exp_gauss, np.full(e_cap - total, exp_gauss[-1] if total else 0,
                           np.int32)])
    # a random permutation plays the depth sort: slot s holds expansion
    # index perm[s]
    perm = rng.permutation(e_cap).astype(np.int32)
    entry_source = perm
    entry_valid = perm < total  # valid slots = real expansion indices
    rows = (rng.standard_normal((e_cap, 16)) * 5).astype(np.float32)
    rows[~entry_valid] = 123.0  # garbage in invalid slots must not leak

    args = (jnp.asarray(rows), jnp.asarray(entry_valid),
            jnp.asarray(entry_source), jnp.asarray(counts))
    s_on = dataclasses.replace(DEFAULT_SETTINGS, grad_rows_f16=True,
                               segsum_kernel=True)
    s_off = dataclasses.replace(DEFAULT_SETTINGS, grad_rows_f16=True,
                                segsum_kernel=False)
    out_on = np.asarray(segment_reduce_entries(
        e_cap, *args, s_on, jnp.asarray(exp_gauss)))
    out_off = np.asarray(segment_reduce_entries(e_cap, *args, s_off))
    np.testing.assert_allclose(out_on, out_off, rtol=1e-4, atol=1e-4)
    # and both match the direct groupby of the f16-quantized valid rows
    rows_f16 = rows[np.argsort(perm)][:total].astype(np.float16)
    ref = _ref_segsum(rows_f16, exp_gauss[:total], n)
    np.testing.assert_allclose(out_on, ref, rtol=1e-4, atol=1e-4)


def test_segment_sum_rows_pre_split_bf16():
    """bf16 pre-split input (the f32 tier's half-width gather route) sums
    bit-identically to the f32 input path."""
    rng = np.random.default_rng(11)
    n, e_cap, cols = 300, 1024, 16
    counts = rng.integers(0, 7, n).astype(np.int32)
    while counts.sum() > e_cap:
        counts[rng.integers(0, n)] = 0
    total = int(counts.sum())
    ids = np.repeat(np.arange(n, dtype=np.int32), counts)
    ids = np.concatenate([ids, np.full(e_cap - total,
                                       ids[-1] if total else 0, np.int32)])
    rows = (rng.standard_normal((e_cap, cols)) * 3).astype(np.float32)
    rows[total:] = 0
    r_hi = rows.astype(jnp.bfloat16)
    r_lo = (rows - np.asarray(r_hi, np.float32)).astype(jnp.bfloat16)
    pre = jnp.concatenate([jnp.asarray(r_hi).T, jnp.asarray(r_lo).T], axis=0)
    out_pre = np.asarray(segment_sum_rows(pre, jnp.asarray(ids),
                                          jnp.asarray(counts)))
    out_f32 = np.asarray(segment_sum_rows(jnp.asarray(rows.T),
                                          jnp.asarray(ids),
                                          jnp.asarray(counts)))
    np.testing.assert_array_equal(out_pre, out_f32)
    assert out_pre.shape == (n, cols)
