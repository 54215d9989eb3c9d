"""Pallas kernel tests (interpret mode on the CPU mesh; the real-TPU path is
exercised by bench.py / verification drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_toolbelt_tpu.ops import pallas_accumulate_tiles, pallas_available
from pytorch_toolbelt_tpu.inference import ImageSlicer, accumulate_tiles


@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
def test_pallas_tile_merge_matches_xla():
    rng = np.random.RandomState(0)
    image = rng.rand(200, 180, 3).astype(np.float32)
    tiler = ImageSlicer(image.shape, tile_size=(64, 64), tile_step=(32, 32), weight="pyramid")
    tiles = np.stack(tiler.split(image))
    coords_yx = np.stack([tiler.crops[:, 1], tiler.crops[:, 0]], axis=1).astype(np.int32)

    h, w = tiler.target_shape
    weight = jnp.asarray(tiler.weight.astype(np.float32))[..., None]

    canvas_x = jnp.zeros((h, w, 3))
    norm_x = jnp.zeros((h, w, 1))
    canvas_x, norm_x = accumulate_tiles(canvas_x, norm_x, jnp.asarray(tiles), jnp.asarray(coords_yx), weight)

    canvas_p = jnp.zeros((h, w, 3))
    norm_p = jnp.zeros((h, w, 1))
    canvas_p, norm_p = pallas_accumulate_tiles(
        canvas_p, norm_p, jnp.asarray(tiles), jnp.asarray(coords_yx), weight, interpret=True
    )

    np.testing.assert_allclose(np.asarray(canvas_p), np.asarray(canvas_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(norm_p), np.asarray(norm_x), atol=1e-4)

    merged = np.asarray(canvas_p / jnp.maximum(norm_p, 1e-8))
    merged = tiler.crop_to_orignal_size(merged)
    np.testing.assert_allclose(merged, image, atol=1e-4)


def test_pallas_merge_supported_alignment():
    from pytorch_toolbelt_tpu.ops import pallas_merge_supported

    good = np.array([[0, 0], [128, 256], [8, 128]], dtype=np.int32)
    assert pallas_merge_supported(good, tile_h=256, tile_w=256, channels=1)
    # misaligned row offset
    bad_row = np.array([[3, 0]], dtype=np.int32)
    assert not pallas_merge_supported(bad_row, 256, 256, 1)
    # col*C not lane aligned
    bad_col = np.array([[0, 64]], dtype=np.int32)
    assert not pallas_merge_supported(bad_col, 256, 256, 1)
    # but fine when channels=4 makes 64*4=256 lane-aligned... (needs tw*1 aligned too)
    assert not pallas_merge_supported(bad_col, 256, 250, 4)


def test_tile_merger_pallas_path_interpret():
    """TileMerger(use_pallas=True) path via interpret-mode kernel on CPU."""
    import pytorch_toolbelt_tpu.ops.tile_merge as tm
    from pytorch_toolbelt_tpu.inference import ImageSlicer, TileMerger
    from functools import partial

    rng = np.random.RandomState(0)
    image = rng.rand(512, 512, 1).astype(np.float32)
    tiler = ImageSlicer(image.shape, tile_size=(128, 128), tile_step=(128, 128), weight="mean")
    tiles = np.stack(tiler.split(image))

    orig = tm.pallas_accumulate_tiles
    tm.pallas_accumulate_tiles = partial(orig, interpret=True)
    try:
        merger = TileMerger(tiler.target_shape, 1, tiler.weight, use_pallas=True)
        merger.integrate_batch(jnp.asarray(tiles), tiler.crops)
        merged = tiler.crop_to_orignal_size(np.asarray(merger.merge()))
        np.testing.assert_allclose(merged, image, atol=1e-5)
    finally:
        tm.pallas_accumulate_tiles = orig


# ---------------------------------------------------------------------------
# Chunked bitonic sort (ops/sort.py)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
@pytest.mark.parametrize(
    "rows,n,chunk",
    [(3, 4096, 512)]
    + [pytest.param(*c, marks=pytest.mark.slow) for c in [(1, 2048, 256), (5, 1024, 512)]],
)
def test_chunked_sort_matches_lax_sort(rows, n, chunk):
    from pytorch_toolbelt_tpu.ops import bitonic_sort_chunked

    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randn(rows, n).astype(np.float32))
    payload = jnp.asarray(np.tile(np.arange(n, dtype=np.int32), (rows, 1)))

    ks, ps = bitonic_sort_chunked(keys, payload, chunk_size=chunk, interpret=True)
    ref_k, ref_p = jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref_p))


@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
def test_chunked_sort_int_keys_and_fallback():
    from pytorch_toolbelt_tpu.ops import bitonic_sort_chunked

    rng = np.random.RandomState(1)
    # int32 keys carrying f32 payload (the Lovasz backward configuration)
    perm = np.stack([rng.permutation(512).astype(np.int32) for _ in range(2)])
    w = rng.randn(2, 512).astype(np.float32)
    ks, ps = bitonic_sort_chunked(jnp.asarray(perm), jnp.asarray(w), chunk_size=256, interpret=True)
    ref_k, ref_p = jax.lax.sort((jnp.asarray(perm), jnp.asarray(w)), dimension=-1, num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref_p))

    # non-power-of-two rows fall back to lax.sort
    keys = jnp.asarray(rng.randn(2, 1500).astype(np.float32))
    payload = jnp.zeros((2, 1500), jnp.int32)
    ks, _ = bitonic_sort_chunked(keys, payload, chunk_size=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(np.asarray(keys), axis=-1))


@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
@pytest.mark.parametrize("rows,n,chunk", [(3, 4096, 512), (1, 2048, 256)])
def test_split_sort_matches_lax_sort(rows, n, chunk):
    """Hybrid lax.sort-per-chunk + bitonic cross-merge (ops/sort.py
    split_sort) must reproduce lax.sort exactly (distinct keys)."""
    from pytorch_toolbelt_tpu.ops import split_sort

    rng = np.random.RandomState(7)
    keys = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(rows)]).astype(np.float32)
    )
    payload = jnp.asarray(np.tile(np.arange(n, dtype=np.int32), (rows, 1)))

    ks, ps = split_sort(keys, payload, chunk_size=chunk, interpret=True)
    ref_k, ref_p = jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref_p))


@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
@pytest.mark.parametrize("chunk,merge_chunk", [(2048, 512), (1024, 256)])
def test_split_sort_decoupled_merge_granularity(chunk, merge_chunk):
    """merge_chunk < chunk_size exercises the start_bit>1 entry into the
    global merge (the production TPU configuration: 2^20 lax.sort chunks,
    2^17 Pallas merge chunks — a 2^20 merge sweep exceeds v5e VMEM)."""
    from pytorch_toolbelt_tpu.ops import split_sort

    rng = np.random.RandomState(11)
    n = 8192
    keys = jnp.asarray(np.stack([rng.permutation(n) for _ in range(2)]).astype(np.float32))
    payload = jnp.asarray(np.tile(np.arange(n, dtype=np.int32), (2, 1)))
    ks, ps = split_sort(keys, payload, chunk_size=chunk, merge_chunk=merge_chunk, interpret=True)
    ref_k, ref_p = jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref_p))


@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
def test_split_sort_int_keys_and_fallback():
    from pytorch_toolbelt_tpu.ops import split_sort

    rng = np.random.RandomState(8)
    # int32 keys + f32 payload (the Lovasz backward configuration)
    perm = np.stack([rng.permutation(1024).astype(np.int32) for _ in range(2)])
    w = rng.randn(2, 1024).astype(np.float32)
    ks, ps = split_sort(jnp.asarray(perm), jnp.asarray(w), chunk_size=256, interpret=True)
    ref_k, ref_p = jax.lax.sort((jnp.asarray(perm), jnp.asarray(w)), dimension=-1, num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref_p))

    # non-power-of-two rows fall back to lax.sort
    keys = jnp.asarray(rng.randn(2, 1500).astype(np.float32))
    ks, _ = split_sort(keys, jnp.zeros((2, 1500), jnp.int32), chunk_size=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(np.asarray(keys), axis=-1))


@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
def test_lovasz_split_sort_path_matches_exact():
    """lovasz_softmax routed through split_sort must equal the lax.sort
    path (value and gradient) — the rows here qualify for the split path
    when the backend is TPU; in CI we call the sort directly in interpret
    mode on the same packed operands the loss builds."""
    import pytorch_toolbelt_tpu.losses.lovasz as lovasz_mod
    from pytorch_toolbelt_tpu.ops import split_sort

    rng = np.random.RandomState(9)
    errors = jnp.asarray(rng.rand(4, 2048).astype(np.float32))
    iota = jax.lax.broadcasted_iota(jnp.int32, errors.shape, 1)
    fg = jnp.asarray((rng.rand(4, 2048) > 0.7).astype(np.int32))
    packed = jnp.where(fg > 0, iota | (1 << lovasz_mod._FG_BIT), iota)
    ks, ps = split_sort(-errors, packed, chunk_size=512, interpret=True)
    ref_k, ref_p = jax.lax.sort((-errors, packed), dimension=-1, num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref_p))


@pytest.mark.slow
@pytest.mark.skipif(not pallas_available(), reason="pallas not importable")
def test_chunked_sort_hierarchical_levels():
    """Exercise the multi-level phase-1 path (base sort + range-merge kernel)
    by shrinking the base chunk below chunk_size."""
    import pytorch_toolbelt_tpu.ops.sort as srt

    rng = np.random.RandomState(3)
    # distinct keys: payload order under ties is unspecified (unstable sort,
    # same as lax.sort), so exact-equality oracles need collision-free keys
    keys = jnp.asarray(
        np.stack([rng.permutation(16384) for _ in range(2)]).astype(np.float32)
    )
    payload = jnp.asarray(np.tile(np.arange(16384, dtype=np.int32), (2, 1)))
    old = srt._BASE
    srt._BASE = 1024
    try:
        ks, ps = srt.bitonic_sort_chunked(keys, payload, chunk_size=8192, interpret=True)
    finally:
        srt._BASE = old
    ref_k, ref_p = jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref_p))
