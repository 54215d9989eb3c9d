"""Tiled inference on huge images (parity target:
pytorch_toolbelt/inference/tiles.py:16-350).

Host side, ``ImageSlicer`` reproduces the reference's margin/grid math and
numpy split/merge exactly (round-trip identity oracles from
tests/test_tiles.py hold bit-for-bit).

Device side, the TPU-native redesign replaces the reference's python
``for``-loop of strided ``+=`` (tiles.py:321-339) with:

* ``accumulate_tiles``  — jitted lax.scan of dynamic-update-slices (the
  read-modify-write XLA lowers to in-place fusions, already HBM-bandwidth
  bound), used by the streaming ``TileMerger``;
* ``tiled_apply``       — the WHOLE pipeline (pad -> slice -> model ->
  weighted overlap-add -> normalize) as ONE jit program.  The tile grid is
  static, so the normalization mask is precomputed on host and folded in as
  a constant, halving the scatter traffic.
"""

import math
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "ImageSlicer",
    "TileMerger",
    "compute_pyramid_patch_weight_loss",
    "accumulate_tiles",
    "tiled_apply",
    "tiled_apply_d4_tta",
    "clear_tiled_cache",
]


def compute_pyramid_patch_weight_loss(width: int, height: int) -> np.ndarray:
    """Center-weighted pyramid window W = alpha * De / (Dc + De)
    (reference tiles.py:16-50). Returns (W, Dc, De)."""
    xc = width * 0.5
    yc = height * 0.5

    Dcx = np.square(np.arange(width) - xc + 0.5)
    Dcy = np.square(np.arange(height) - yc + 0.5)
    Dc = np.sqrt(Dcx[np.newaxis].transpose() + Dcy)

    De_l = np.square(np.arange(width) + 0.5) + np.square(0.5)
    De_r = np.square(np.arange(width) - width + 0.5) + np.square(0.5)
    De_b = np.square(0.5) + np.square(np.arange(height) + 0.5)
    De_t = np.square(0.5) + np.square(np.arange(height) - height + 0.5)

    De_x = np.sqrt(np.minimum(De_l, De_r))
    De_y = np.sqrt(np.minimum(De_b, De_t))
    De = np.minimum(De_x[np.newaxis].transpose(), De_y)

    alpha = (width * height) / np.sum(np.divide(De, np.add(Dc, De)))
    W = alpha * np.divide(De, np.add(Dc, De))
    return W, Dc, De


class ImageSlicer:
    """Slice an image into overlapping tiles and merge them back
    (host-side numpy; semantics identical to reference tiles.py:53-287).

    Images are HWC numpy arrays.
    """

    def __init__(self, image_shape, tile_size, tile_step=0, image_margin=0, weight="mean"):
        self.image_height = image_shape[0]
        self.image_width = image_shape[1]

        if isinstance(tile_size, (np.ndarray, tuple, list)):
            if len(tile_size) != 2:
                raise ValueError(f"tile_size must be an int or an (h, w) pair; got {tile_size!r}")
            self.tile_size = int(tile_size[0]), int(tile_size[1])
        else:
            self.tile_size = int(tile_size), int(tile_size)

        if isinstance(tile_step, (np.ndarray, tuple, list)):
            if len(tile_step) != 2:
                raise ValueError(f"tile_step must be an int or an (h, w) pair; got {tile_step!r}")
            self.tile_step = int(tile_step[0]), int(tile_step[1])
        else:
            self.tile_step = int(tile_step), int(tile_step)

        weights = {"mean": self._mean, "pyramid": self._pyramid}
        self.weight = weight if isinstance(weight, np.ndarray) else weights[weight](self.tile_size)

        if self.tile_step[0] < 1 or self.tile_step[0] > self.tile_size[0]:
            raise ValueError()
        if self.tile_step[1] < 1 or self.tile_step[1] > self.tile_size[1]:
            raise ValueError()

        overlap = (self.tile_size[0] - self.tile_step[0], self.tile_size[1] - self.tile_step[1])

        if image_margin == 0:
            nw = max(1, math.ceil((self.image_width - overlap[1]) / self.tile_step[1]))
            nh = max(1, math.ceil((self.image_height - overlap[0]) / self.tile_step[0]))
            extra_w = self.tile_step[1] * nw - (self.image_width - overlap[1])
            extra_h = self.tile_step[0] * nh - (self.image_height - overlap[0])
            self.margin_left = extra_w // 2
            self.margin_right = extra_w - self.margin_left
            self.margin_top = extra_h // 2
            self.margin_bottom = extra_h - self.margin_top
        else:
            if isinstance(image_margin, (tuple, list)):
                self.margin_left, self.margin_right, self.margin_top, self.margin_bottom = image_margin
            else:
                self.margin_left = self.margin_right = self.margin_top = self.margin_bottom = image_margin

        crops = []
        bbox_crops = []
        for y in range(
            0, self.image_height + self.margin_top + self.margin_bottom - self.tile_size[0] + 1, self.tile_step[0]
        ):
            for x in range(
                0, self.image_width + self.margin_left + self.margin_right - self.tile_size[1] + 1, self.tile_step[1]
            ):
                crops.append((x, y, self.tile_size[1], self.tile_size[0]))
                bbox_crops.append((x - self.margin_left, y - self.margin_top, self.tile_size[1], self.tile_size[0]))

        self.crops = np.array(crops)
        self.bbox_crops = np.array(bbox_crops)

    # -- host-side split/merge ------------------------------------------------

    # cv2.BORDER_* int codes and their string names -> numpy pad modes
    # (reference iter_split/split take cv2 border_type, tiles.py:144-191)
    _BORDER_MODES = {
        0: "constant", "constant": "constant",
        1: "edge", "replicate": "edge",
        2: "symmetric", "reflect": "symmetric",
        3: "wrap", "wrap": "wrap",
        4: "reflect", "reflect101": "reflect", "reflect_101": "reflect",
    }

    @classmethod
    def _np_pad(cls, array: np.ndarray, pad, border_type, value):
        try:
            mode = cls._BORDER_MODES[border_type]
        except KeyError:
            raise ValueError(
                f"Unsupported border_type {border_type!r}; use a cv2.BORDER_* code or one of "
                "'constant', 'replicate', 'reflect', 'wrap', 'reflect101'"
            ) from None
        if mode == "constant":
            return np.pad(array, pad, mode="constant", constant_values=value)
        return np.pad(array, pad, mode=mode)

    def _pad_image(self, image: np.ndarray, value=0, border_type="constant") -> np.ndarray:
        pad = [(self.margin_top, self.margin_bottom), (self.margin_left, self.margin_right)]
        if image.ndim == 3:
            pad.append((0, 0))
        return self._np_pad(image, pad, border_type, value)

    def split(self, image: np.ndarray, value=0, border_type="constant") -> List[np.ndarray]:
        assert image.shape[0] == self.image_height
        assert image.shape[1] == self.image_width
        orig_ndim = image.ndim
        image = self._pad_image(image, value, border_type)
        if image.ndim != orig_ndim:
            image = np.expand_dims(image, axis=-1)

        tiles = []
        for x, y, tile_width, tile_height in self.crops:
            tile = image[y : y + tile_height, x : x + tile_width]
            assert tile.shape[0] == self.tile_size[0]
            assert tile.shape[1] == self.tile_size[1]
            tiles.append(tile)
        return tiles

    def iter_split(self, image: np.ndarray, value=0, border_type="constant"):
        """Yield (tile, coords) one at a time without padding the whole image
        (reference tiles.py:144-175)."""
        if image.shape[0] != self.image_height or image.shape[1] != self.image_width:
            raise ValueError()
        for coords, crop_coords in zip(self.crops, self.bbox_crops):
            yield self.cut_patch_by_bbox(image, crop_coords, value, border_type), coords

    def cut_patch(self, image: np.ndarray, slice_index: int, value=0, border_type="constant") -> np.ndarray:
        assert image.shape[0] == self.image_height
        assert image.shape[1] == self.image_width
        return self.cut_patch_by_bbox(image, self.bbox_crops[slice_index], value, border_type)

    def cut_patch_by_bbox(self, image: np.ndarray, crop_coords, value=0, border_type="constant") -> np.ndarray:
        x, y, tile_width, tile_height = crop_coords
        x1, y1 = max(x, 0), max(y, 0)
        x2 = min(image.shape[1], x + tile_width)
        y2 = min(image.shape[0], y + tile_height)
        orig_ndim = image.ndim
        tile = image[y1:y2, x1:x2]
        if x < 0 or y < 0 or (x + tile_width) > image.shape[1] or (y + tile_height) > image.shape[0]:
            pad = [
                (max(0, -y), max(0, y + tile_height - image.shape[0])),
                (max(0, -x), max(0, x + tile_width - image.shape[1])),
            ]
            if tile.ndim == 3:
                pad.append((0, 0))
            tile = self._np_pad(tile, pad, border_type, value)
            if tile.ndim != orig_ndim:
                tile = np.expand_dims(tile, axis=-1)
        return tile

    @property
    def target_shape(self) -> Tuple[int, int]:
        return (
            self.image_height + self.margin_bottom + self.margin_top,
            self.image_width + self.margin_right + self.margin_left,
        )

    def merge(self, tiles: List[np.ndarray], dtype=np.float32) -> np.ndarray:
        """Weighted overlap-add on host (float64 accumulators like the
        reference, tiles.py:244-269)."""
        if len(tiles) != len(self.crops):
            raise ValueError

        channels = 1 if tiles[0].ndim == 2 else tiles[0].shape[2]
        target_shape = self.target_shape + (channels,)

        image = np.zeros(target_shape, dtype=np.float64)
        norm_mask = np.zeros(target_shape, dtype=np.float64)
        w = np.dstack([self.weight] * channels)

        for tile, (x, y, tile_width, tile_height) in zip(tiles, self.crops):
            tile = tile if tile.ndim == 3 else tile[..., None]
            image[y : y + tile_height, x : x + tile_width] += tile * w
            norm_mask[y : y + tile_height, x : x + tile_width] += w

        norm_mask = np.clip(norm_mask, a_min=np.finfo(norm_mask.dtype).eps, a_max=None)
        normalized = np.divide(image, norm_mask).astype(dtype)
        return self.crop_to_orignal_size(normalized)

    def crop_to_orignal_size(self, image: np.ndarray) -> np.ndarray:
        # (sic) name kept for reference API compatibility
        assert image.shape[0] == self.target_shape[0]
        assert image.shape[1] == self.target_shape[1]
        crop = image[
            self.margin_top : self.image_height + self.margin_top,
            self.margin_left : self.image_width + self.margin_left,
        ]
        assert crop.shape[0] == self.image_height
        assert crop.shape[1] == self.image_width
        return crop

    crop_to_original_size = crop_to_orignal_size

    def _mean(self, tile_size) -> np.ndarray:
        return np.ones((tile_size[0], tile_size[1]), dtype=np.float32)

    def _pyramid(self, tile_size) -> np.ndarray:
        w, _, _ = compute_pyramid_patch_weight_loss(tile_size[0], tile_size[1])
        return w


# ---------------------------------------------------------------------------
# Device-side accumulation
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0, 1))
def _accumulate_scan(canvas, norm_mask, tiles, coords_yx, weight):
    """Sequential weighted scatter-add of tiles into the canvas.

    canvas [H, W, C], norm_mask [H, W, 1], tiles [N, th, tw, C],
    coords_yx [N, 2] int32 (row, col), weight [th, tw, 1].
    """
    th, tw = tiles.shape[1], tiles.shape[2]
    c = canvas.shape[-1]

    def body(carry, inp):
        canvas, norm_mask = carry
        tile, yx = inp
        y, x = yx[0], yx[1]
        region = lax.dynamic_slice(canvas, (y, x, 0), (th, tw, c))
        canvas = lax.dynamic_update_slice(canvas, region + tile * weight, (y, x, 0))
        nregion = lax.dynamic_slice(norm_mask, (y, x, 0), (th, tw, 1))
        norm_mask = lax.dynamic_update_slice(norm_mask, nregion + weight, (y, x, 0))
        return (canvas, norm_mask), None

    (canvas, norm_mask), _ = lax.scan(body, (canvas, norm_mask), (tiles, coords_yx))
    return canvas, norm_mask


@jax.jit
def _accumulate_scan_no_donate(canvas, norm_mask, tiles, coords_yx, weight):
    return _accumulate_scan.__wrapped__(canvas, norm_mask, tiles, coords_yx, weight)


def accumulate_tiles(canvas, norm_mask, tiles, coords_yx, weight, donate: bool = False):
    """Weighted overlap-add of a batch of tiles (functional; returns new
    accumulators; the inputs stay valid). Pass ``donate=True`` to allow the
    input buffers to be reused in place (the caller must not touch them
    afterwards — this is what TileMerger does internally)."""
    if donate:
        return _accumulate_scan(canvas, norm_mask, tiles, coords_yx, weight)
    return _accumulate_scan_no_donate(canvas, norm_mask, tiles, coords_yx, weight)


class TileMerger:
    """Device-resident accumulator (reference tiles.py:290-350).

    Accepts NHWC tile batches + (x, y, w, h) crop coords from ImageSlicer.

    Merge strategy (``use_pallas``):

    * ``"auto"`` (default): when the FIRST ``integrate_batch`` call delivers a
      complete regular tile grid on a fresh canvas (the ImageSlicer
      one-shot-merge pattern) and the geometry is lane-aligned, use the
      gather-formulation Pallas kernel (``ops.pallas_grid_merge`` — canvas
      written once, ~1.8x the XLA scan); otherwise fall back to the XLA
      scan-of-DUS scatter path.
    * ``False``: always the XLA scatter path.
    * ``True``: force the Pallas scatter kernel (arbitrary aligned coords;
      slower than XLA — kept for streaming experiments).
    """

    def __init__(self, image_shape, channels: int, weight: np.ndarray, dtype=jnp.float32,
                 use_pallas="auto"):
        self.image_height = int(image_shape[0])
        self.image_width = int(image_shape[1])
        self.channels = int(channels)
        self.weight = jnp.asarray(weight, dtype=dtype)[..., None]  # [th, tw, 1]
        self.image = jnp.zeros((self.image_height, self.image_width, channels), dtype=dtype)
        self.norm_mask = jnp.zeros((self.image_height, self.image_width, 1), dtype=dtype)
        self.use_pallas = use_pallas
        self._touched = False

    def accumulate_single(self, tile: jnp.ndarray, coords) -> None:
        """tile [th, tw, C]; coords (x, y, w, h)."""
        self.integrate_batch(tile[None], np.asarray(coords)[None])

    def integrate_batch(self, batch: jnp.ndarray, crop_coords) -> None:
        """batch [B, th, tw, C]; crop_coords [B, 4] of (x, y, w, h)."""
        if len(batch) != len(crop_coords):
            raise ValueError("Number of images in batch does not correspond to number of coordinates")
        batch = jnp.asarray(batch, dtype=self.image.dtype)
        coords = np.asarray(crop_coords)
        coords_yx_np = coords[:, [1, 0]].astype(np.int32)
        th, tw = int(batch.shape[1]), int(batch.shape[2])

        if self.use_pallas == "auto" and not self._touched:
            from ..ops.tile_merge import grid_merge_supported, pallas_grid_merge

            if grid_merge_supported(
                coords_yx_np, th, tw, self.channels,
                (self.image_height, self.image_width), 1,
            ):
                self.image, self.norm_mask = pallas_grid_merge(
                    batch, coords_yx_np, self.weight,
                    (self.image_height, self.image_width),
                    dtype=self.image.dtype,
                )
                self._touched = True
                return
        self._touched = True

        coords_yx = jnp.asarray(coords_yx_np)
        if self.use_pallas is True:
            from ..ops.tile_merge import pallas_accumulate_tiles, pallas_merge_supported

            if not pallas_merge_supported(coords_yx_np, th, tw, self.channels, 1):
                raise ValueError(
                    "Tile geometry does not satisfy Pallas DMA alignment; "
                    "use the default XLA merge path"
                )
            self.image, self.norm_mask = pallas_accumulate_tiles(
                self.image, self.norm_mask, batch, coords_yx, self.weight
            )
        else:
            # donate=True: the old accumulators are reassigned immediately
            self.image, self.norm_mask = accumulate_tiles(
                self.image, self.norm_mask, batch, coords_yx, self.weight, donate=True
            )

    def merge(self) -> jnp.ndarray:
        return self.image / self.norm_mask

    def merge_(self) -> jnp.ndarray:
        self.image = self.image / self.norm_mask
        return self.image


# ---------------------------------------------------------------------------
# Fully-fused on-device tiled inference
# ---------------------------------------------------------------------------


from functools import lru_cache


def _stack_batches(coords_yx_np: np.ndarray, batch_size: int):
    """Split a [N, 2] (row, col) coord list into BALANCED batches: stacked
    main batches [num_batches, B_eff, 2] plus at most one remainder batch
    [r, 2] with r < B_eff.

    Two rules, both measured on the bench config (benchmarks/RESULTS.md):

    * No padding tiles — a padded slot still runs the full model on
      garbage data, and the four d4 parity groups padded to a batch-32
      multiple wasted ~15% of all model compute (416 slots for 361 tiles).
    * Balanced batch size — ``B_eff = ceil(N / ceil(N / B))``, so a group
      of 100 at B=32 runs 4 x 25 instead of 3 x 32 plus a straggler batch
      of 4 whose tiny program runs at poor MXU efficiency.  The remainder
      program (when N doesn't divide) is within one tile of B_eff."""
    coords = np.asarray(coords_yx_np, dtype=np.int32)
    n_tiles = len(coords)
    # ensure_compile_time_eval: these are host constants that get memoized in
    # the plan lru_cache — if a caller traces over tiled_apply* (nesting it
    # under their own jit), plain jnp.asarray would cache TRACERS and poison
    # every later eager call with an UnexpectedTracerError.
    with jax.ensure_compile_time_eval():
        if n_tiles == 0:
            return jnp.asarray(coords.reshape(0, max(batch_size, 1), 2)), jnp.asarray(coords)
        total_batches = -(-n_tiles // batch_size)
        b_eff = -(-n_tiles // total_batches)
        num_full = n_tiles // b_eff
        main = coords[: num_full * b_eff].reshape(num_full, b_eff, 2)
        rem = coords[num_full * b_eff :]
        return jnp.asarray(main), jnp.asarray(rem)


@lru_cache(maxsize=4)
def _get_tiled_plan(h, w, tile_size, tile_step, weight, batch_size, partition="none"):
    """Host grid math + DEVICE-RESIDENT constants for a tiling config,
    computed once and cached.  Keeping coords/weight/inv-norm on device
    matters: host->device transfers are expensive (axon relay), and the
    1/norm canvas alone is ~4 bytes/pixel — which is also why maxsize is
    small (each full-resolution entry pins ~H*W*4 bytes of HBM; call
    ``clear_tiled_cache()`` to release them all).

    ``partition='none'`` yields one tile group; ``'parity2x2'`` yields four
    groups keyed by grid parity ((row//step_h) % 2, (col//step_w) % 2) so
    that, at step = size/2, the up-to-4 tiles covering any pixel land in 4
    distinct groups (the basis for spreading TTA views across the overlap).
    """
    slicer = ImageSlicer((h, w), tile_size, tile_step, weight=weight)
    th, tw = slicer.tile_size
    coords = slicer.crops  # (x, y, w, h) numpy, static
    coords_yx_np = np.stack([coords[:, 1], coords[:, 0]], axis=1).astype(np.int32)

    if partition == "none":
        group_coords_np = [coords_yx_np]
    elif partition == "parity2x2":
        step_h, step_w = slicer.tile_step
        parity = (coords_yx_np[:, 0] // step_h) % 2 * 2 + (coords_yx_np[:, 1] // step_w) % 2
        group_coords_np = [coords_yx_np[parity == g] for g in range(4)]
    else:
        raise ValueError(f"Unknown tile partition {partition!r}")

    groups = tuple(_stack_batches(g, batch_size) for g in group_coords_np)
    group_coords = tuple(g[0] for g in groups)
    group_rem = tuple(g[1] for g in groups)

    weight_np = slicer.weight.astype(np.float32)

    # normalization mask is static -> precompute on host, fold in as constant
    norm = np.zeros(slicer.target_shape, dtype=np.float64)
    for x, y, _, _ in coords:
        norm[y : y + th, x : x + tw] += weight_np
    norm = np.clip(norm, np.finfo(np.float64).eps, None).astype(np.float32)

    # concrete even under an enclosing trace — see _stack_batches
    with jax.ensure_compile_time_eval():
        weight_dev = jnp.asarray(weight_np)[..., None]
        inv_norm = jnp.asarray(1.0 / norm)[..., None]
    return slicer, group_coords, group_rem, weight_dev, inv_norm


@lru_cache(maxsize=8)
def _build_tiled_runner(model_fns, tgt_h, tgt_w, th, tw, out_channels, batch_size, acc_dtype):
    """Compile (once per config) the pad->slice->model->merge program.

    ``model_fns`` is a tuple of callables; the runner takes one
    (coords, remainder) pair of batches per callable and scans each group
    with its own model function (this is how parity-partitioned TTA assigns
    different view subsets to different tile groups).  Full batches run
    under one lax.scan; the exact-size remainder batch (when the group size
    is not a batch multiple) runs as one additional step — no padding tiles
    ever execute the model.

    NOTE: keyed on the ``model_fns`` identities (like jax.jit itself) —
    callers must pass STABLE callables; a fresh lambda per call forces a
    recompile.  maxsize is small because each entry pins the closures'
    parameters and a compiled executable; ``clear_tiled_cache()`` drops all
    entries."""

    @jax.jit
    def run(padded, group_coords, group_rem, weight_dev, inv_norm):
        canvas = jnp.zeros((tgt_h, tgt_w, out_channels), dtype=acc_dtype)
        # keep the weighted-update arithmetic in the accumulator dtype so a
        # bf16 canvas stays bf16 through the DUS (the final inv_norm multiply
        # below still normalizes in fp32)
        weight_acc = weight_dev.astype(acc_dtype)

        def accumulate_batch(model_fn, canvas, batch_coords):
            n = batch_coords.shape[0]
            tiles = jax.vmap(
                lambda yx: lax.dynamic_slice(padded, (yx[0], yx[1], 0), (th, tw, padded.shape[-1]))
            )(batch_coords)
            preds = model_fn(tiles).astype(acc_dtype)

            def inner(i, canvas):
                y, x = batch_coords[i, 0], batch_coords[i, 1]
                region = lax.dynamic_slice(canvas, (y, x, 0), (th, tw, out_channels))
                update = region + preds[i] * weight_acc
                return lax.dynamic_update_slice(canvas, update, (y, x, 0))

            return lax.fori_loop(0, n, inner, canvas)

        for model_fn, coords_dev, rem_dev in zip(model_fns, group_coords, group_rem):
            if coords_dev.shape[0] > 0:
                canvas, _ = lax.scan(
                    lambda c, bc, fn=model_fn: (accumulate_batch(fn, c, bc), None),
                    canvas,
                    coords_dev,
                )
            if rem_dev.shape[0] > 0:
                canvas = accumulate_batch(model_fn, canvas, rem_dev)
        return canvas * inv_norm

    return run


def clear_tiled_cache() -> None:
    """Release everything pinned by the ``tiled_apply`` caches: device-resident
    tiling plans (coords / weight window / 1-per-pixel inverse-norm canvas, up
    to ~4 bytes/pixel each) and compiled runners (each pins the model closure's
    full parameter tree plus an executable).  Call between unrelated models or
    image geometries to avoid silently accumulating HBM."""
    _get_tiled_plan.cache_clear()
    _build_tiled_runner.cache_clear()


def tiled_apply(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    tile_size: Union[int, Tuple[int, int]],
    tile_step: Union[int, Tuple[int, int]],
    weight: str = "pyramid",
    batch_size: int = 8,
    out_channels: Optional[int] = None,
    accumulator_dtype=jnp.float32,
) -> jnp.ndarray:
    """Run ``model_fn`` over overlapping tiles of a huge image, entirely on
    device, and return the merged full-resolution prediction.

    This is the TPU-native form of the reference's ImageSlicer + DataLoader +
    TileMerger pipeline (README.md:196-227): pad, slice (gather), batched
    model forwards (lax.scan), weighted overlap-add (in-place DUS), and
    normalization — one XLA program, no host round-trips.

    Safe to call either eagerly (the pipeline is jitted internally) or from
    inside a caller's own ``jax.jit`` (the tiling plan's constants are built
    with ``ensure_compile_time_eval``, so tracing over this function composes
    it into the enclosing program; the image extent must still be static).

    Args:
        model_fn: maps [B, th, tw, C] -> [B, th, tw, K]. Must be shape-preserving
            in the spatial dims, and must be a STABLE callable (define it once
            and reuse it across calls) — the compiled pipeline is cached on
            its identity, exactly like jax.jit; a fresh lambda per call
            recompiles everything.
        image: [H, W, C] array.
        weight: 'mean' | 'pyramid' | ndarray [th, tw].

    Returns:
        [H, W, K] merged prediction.
    """
    return _tiled_apply_grouped(
        (model_fn,), image, tile_size, tile_step, weight, batch_size, out_channels,
        accumulator_dtype, partition="none",
    )


def _tiled_apply_grouped(
    model_fns: tuple,
    image: jnp.ndarray,
    tile_size,
    tile_step,
    weight,
    batch_size: int,
    out_channels: Optional[int],
    accumulator_dtype,
    partition: str,
) -> jnp.ndarray:
    h, w = int(image.shape[0]), int(image.shape[1])
    plan_fn = _get_tiled_plan.__wrapped__ if isinstance(weight, np.ndarray) else _get_tiled_plan
    slicer, group_coords, group_rem, weight_dev, inv_norm = plan_fn(
        h, w,
        tile_size if isinstance(tile_size, int) else tuple(tile_size),
        tile_step if isinstance(tile_step, int) else tuple(tile_step),
        weight, batch_size, partition,
    )
    th, tw = slicer.tile_size
    if len(group_coords) != len(model_fns):
        raise ValueError(
            f"Partition {partition!r} produced {len(group_coords)} tile groups "
            f"but {len(model_fns)} model functions were supplied"
        )

    pad_spec = [
        (slicer.margin_top, slicer.margin_bottom),
        (slicer.margin_left, slicer.margin_right),
        (0, 0),
    ]
    padded = jnp.pad(image, pad_spec)
    tgt_h, tgt_w = slicer.target_shape

    probe = jax.eval_shape(
        model_fns[0], jax.ShapeDtypeStruct((batch_size, th, tw, image.shape[-1]), image.dtype)
    )
    out_dtype = probe.dtype
    if out_channels is None:
        out_channels = probe.shape[-1]

    runner = _build_tiled_runner(
        model_fns, tgt_h, tgt_w, th, tw, int(out_channels), batch_size, accumulator_dtype
    )
    merged = runner(padded, group_coords, group_rem, weight_dev, inv_norm)
    return merged[
        slicer.margin_top : slicer.margin_top + h,
        slicer.margin_left : slicer.margin_left + w,
    ].astype(out_dtype)


# The d4 group has 8 elements; at 2x overlap (step = size/2) every interior
# pixel is covered by exactly 4 tiles, one from each grid-parity class.
# Assigning each parity class a DISJOINT pair of d4 views makes every interior
# pixel an average over all 8 views while computing each view ONCE per pixel
# instead of 4 times — a 4x cut in model FLOPs and HBM traffic for the same
# TTA ensemble (view weights follow the blend window instead of being
# uniform; border pixels see the views of the tiles that cover them).
_D4_PARITY_VIEW_PAIRS = ((0, 2), (1, 3), (4, 6), (5, 7))


@lru_cache(maxsize=8)
def _sparse_d4_fns(model_fn):
    """Stable per-parity callables (cached on model_fn identity so repeated
    tiled_apply_d4_tta calls reuse the compiled runner)."""
    from .tta import d4_image_augment_views, d4_image_deaugment_views

    def make(views):
        def fn(tiles):
            return d4_image_deaugment_views(model_fn(d4_image_augment_views(tiles, views)), views)

        return fn

    return tuple(make(views) for views in _D4_PARITY_VIEW_PAIRS)


@lru_cache(maxsize=8)
def _full_d4_fn(model_fn):
    from .tta import d4_image2mask

    def fn(tiles):
        return d4_image2mask(model_fn, tiles)

    return fn


def tiled_apply_d4_tta(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    tile_size: Union[int, Tuple[int, int]],
    tile_step: Union[int, Tuple[int, int]],
    weight: str = "pyramid",
    batch_size: int = 8,
    out_channels: Optional[int] = None,
    accumulator_dtype=jnp.float32,
    mode: str = "distributed",
) -> jnp.ndarray:
    """Tiled inference with d4 test-time augmentation, fused on device.

    mode='full': every tile runs all 8 d4 views (identical numerics to
        ``tiled_apply`` of ``d4_image2mask(model_fn, .)``).
    mode='distributed': requires step == size/2 on both axes.  Each of the 4
        grid-parity tile classes computes a disjoint PAIR of d4 views
        (identity+rot180 / rot90+rot270 / transpose+anti-transpose rotations),
        so every interior pixel still averages all 8 d4 views — blended by the
        overlap window — at 1/4 the model compute of mode='full'.  Border
        pixels average the views of however many tiles cover them.

    ``model_fn`` must be a STABLE callable (see ``tiled_apply``).
    """
    ts = (tile_size, tile_size) if isinstance(tile_size, int) else tuple(tile_size)
    st = (tile_step, tile_step) if isinstance(tile_step, int) else tuple(tile_step)
    if mode == "full":
        return _tiled_apply_grouped(
            (_full_d4_fn(model_fn),), image, tile_size, tile_step, weight, batch_size,
            out_channels, accumulator_dtype, partition="none",
        )
    if mode != "distributed":
        raise ValueError(f"Unknown d4 TTA mode {mode!r}")
    if ts[0] != 2 * st[0] or ts[1] != 2 * st[1]:
        raise ValueError(
            "mode='distributed' needs tile_step == tile_size/2 (4-fold overlap) "
            f"so the parity classes tile the d4 group; got size={ts} step={st}"
        )
    return _tiled_apply_grouped(
        _sparse_d4_fns(model_fn), image, tile_size, tile_step, weight, batch_size,
        out_channels, accumulator_dtype, partition="parity2x2",
    )
