"""Utils / optimization / datasets layer tests (reference
test_ddp_utils.py, test_filesystem_utils.py, test_optimizer.py,
test_visualization.py styles)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import pytorch_toolbelt_tpu.utils as U
import pytorch_toolbelt_tpu.optimization as O
import pytorch_toolbelt_tpu.datasets as D


# --- bucket assignment (reference test_ddp_utils.py:12-36) -----------------


def test_bucket_assignment_balancing():
    rng = np.random.RandomState(42)
    costs = rng.randint(1, 100, size=64).astype(np.float64)
    naive = U.naive_bucket_assignment(costs, 4)
    rnd = U.random_bucket_assignment(costs, 4, max_iterations=50, rng=np.random.RandomState(0))
    filler = U.filler_bucket_assignment(costs, 4)
    s_naive = U.compute_bucket_imbalance_score(costs, naive)
    s_filler = U.compute_bucket_imbalance_score(costs, filler)
    assert len(np.unique(filler)) == 4
    assert s_filler <= s_naive
    for a in (naive, rnd, filler):
        assert a.shape == costs.shape


# --- rle --------------------------------------------------------------------


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(32, 24) > 0.6).astype(np.uint8)
    rle = U.rle_encode(mask)
    decoded = U.rle_decode(U.rle_to_string(rle), mask.shape, mask.dtype)
    np.testing.assert_array_equal(decoded, mask)


def test_rle_edges():
    mask = np.ones((4, 4), dtype=np.uint8)
    decoded = U.rle_decode(U.rle_to_string(U.rle_encode(mask)), mask.shape, mask.dtype)
    np.testing.assert_array_equal(decoded, mask)


# --- tensor utils -----------------------------------------------------------


def test_count_parameters():
    params = {"encoder": {"w": jnp.zeros((3, 3, 4, 8))}, "head": {"b": jnp.zeros((10,))}}
    counts = U.count_parameters(params)
    assert counts["total"] == 3 * 3 * 4 * 8 + 10
    assert counts["encoder"] == 288
    human = U.count_parameters(params, human_friendly=True)
    assert isinstance(human["total"], str)


def test_image_tensor_roundtrip():
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    t = U.image_to_tensor(img)
    assert t.shape == (16, 16, 3)
    back = U.rgb_image_from_tensor(t.astype(jnp.float32) / 255.0, mean=0.0, std=1.0)
    np.testing.assert_array_equal(back, img)


def test_transfer_weights():
    target = {"a": jnp.zeros((4, 4)), "b": jnp.zeros((2,)), "c": jnp.zeros((3,))}
    source = {"a": jnp.ones((4, 4)), "b": jnp.ones((5,)), "d": jnp.ones((9,))}
    new, transferred, skipped = U.transfer_weights(target, source)
    np.testing.assert_array_equal(np.asarray(new["a"]), np.ones((4, 4)))
    np.testing.assert_array_equal(np.asarray(new["b"]), np.zeros((2,)))  # shape mismatch kept
    assert len(transferred) == 1 and len(skipped) == 2


def test_describe_outputs():
    desc = U.describe_outputs({"mask": jnp.zeros((2, 4, 4, 1))})
    assert desc["mask"]["shape"] == (2, 4, 4, 1)


def test_logit_sigmoid_threshold():
    x = jnp.asarray([0.25, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(U.logit(x))), np.asarray(x), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(U.sigmoid_with_threshold(jnp.asarray([-5.0, 5.0]), 0.5)), [0.0, 1.0]
    )


# --- fs ---------------------------------------------------------------------


def test_fs_helpers(tmp_path):
    (tmp_path / "a.png").write_bytes(b"")
    (tmp_path / "b.jpg").write_bytes(b"")
    (tmp_path / "c.txt").write_bytes(b"")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "d.png").write_bytes(b"")

    images = U.find_images_in_dir(str(tmp_path))
    assert [os.path.basename(f) for f in images] == ["a.png", "b.jpg"]
    rec = U.find_images_in_dir_recursive(str(tmp_path))
    assert len(rec) == 3
    assert U.id_from_fname("/x/y/lena.png") == "lena"
    assert U.change_extension("img.png", ".jpg") == "img.jpg"
    assert U.auto_file("d.png", where=str(tmp_path)).endswith("d.png")
    with pytest.raises(FileNotFoundError):
        U.auto_file("missing.png", where=str(tmp_path))


# --- bboxes -----------------------------------------------------------------


def test_match_bboxes_perfect():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float32)
    labels = np.array([0, 1])
    scores = np.array([0.9, 0.8])
    result = U.match_bboxes(boxes, labels, scores, boxes, labels, num_classes=2)
    np.testing.assert_array_equal(result.true_positives, [1, 1])
    assert result.false_positives.sum() == 0 and result.false_negatives.sum() == 0
    assert result.confusion_matrix[0, 0] == 1 and result.confusion_matrix[1, 1] == 1


def test_match_bboxes_class_mismatch_and_misses():
    pred_boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float32)
    pred_labels = np.array([1, 0])
    pred_scores = np.array([0.9, 0.8])
    true_boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    true_labels = np.array([0, 0])
    result = U.match_bboxes(pred_boxes, pred_labels, pred_scores, true_boxes, true_labels, num_classes=2)
    # matched box with wrong class: FP[1] + FN[0]; unmatched pred: FP[0]; unmatched true: FN[0]
    assert result.true_positives.sum() == 0
    assert result.false_positives[1] == 1 and result.false_positives[0] == 1
    assert result.false_negatives[0] == 2

    hung = U.match_bboxes_hungarian(pred_boxes, pred_labels, true_boxes, true_labels, num_classes=2)
    assert hung.true_positives.sum() == 0


def test_match_bboxes_empty():
    empty = np.zeros((0, 4), dtype=np.float32)
    none = np.zeros((0,), dtype=int)
    r = U.match_bboxes(empty, none, none.astype(np.float32), empty, none, num_classes=3)
    assert r.confusion_matrix.sum() == 0


# --- visualization ----------------------------------------------------------


def test_plot_confusion_matrix(tmp_path):
    cm = np.array([[5, 1], [2, 7]])
    f = U.plot_confusion_matrix(cm, ["cat", "dog"], figsize=(4, 4), noshow=True,
                                fname=str(tmp_path / "cm.png"))
    img = U.render_figure_to_tensor(f)
    assert img.ndim == 3 and img.shape[2] == 3
    assert (tmp_path / "cm.png").exists()


def test_plot_heatmap_variants(tmp_path):
    """Float values, NaN cells (rendered 'N/A'), string cmap, and the
    compressed (annotation-free) confusion matrix all render."""
    cm = np.array([[0.5, np.nan], [0.25, 1.0]], dtype=np.float64)
    f = U.plot_heatmap(cm, title="t", x_ticks=["a", "b"], y_ticks=["c", "d"],
                       figsize=(3, 3), noshow=True, cmap="viridis")
    img = U.render_figure_to_tensor(f)
    assert img.ndim == 3 and img.shape[2] == 3
    f2 = U.plot_compressed_confusion_matrix(
        np.eye(50, dtype=np.int64), figsize=(3, 3), noshow=True,
        fname=str(tmp_path / "ccm.png"))
    U.render_figure_to_tensor(f2)
    assert (tmp_path / "ccm.png").exists()


def test_stack_helpers():
    a = np.zeros((10, 20, 3), dtype=np.uint8)
    b = np.zeros((15, 10, 3), dtype=np.uint8)
    assert U.hstack_autopad([a, b]).shape == (15, 30, 3)
    assert U.vstack_autopad([a, b]).shape == (25, 20, 3)
    assert U.grid_stack([a, a, a, a], rows=2, cols=2).shape == (20, 40, 3)
    titled = U.vstack_header(a, "hello")
    assert titled.shape[0] == 10 + 36


# --- schedules & param groups ----------------------------------------------


def test_schedules_shapes():
    s = O.once_cycle_schedule(1.0, 100, min_lr_factor=0.01)
    values = [s(i) for i in range(100)]
    assert max(values) == pytest.approx(1.0, rel=1e-6)
    assert values[0] == pytest.approx(0.01, rel=1e-6)

    s = O.poly_schedule(1.0, 100, gamma=0.9)
    assert s(0) == 1.0 and s(99) < 0.02

    s = O.flat_cosine_annealing_schedule(1.0, t_max=100, t_flat=50)
    assert s(25) == pytest.approx(1.0)
    assert s(100) == pytest.approx(0.0, abs=1e-6)

    s = O.cosine_annealing_with_decay_schedule(1.0, t_max=20, gamma=0.99)
    assert s(0) == pytest.approx(1.0)

    warm = O.gradual_warmup_schedule(1.0, multiplier=1.0, total_epoch=10,
                                     after_schedule=O.poly_schedule(1.0, 100))
    assert warm(5) == pytest.approx(0.5)
    assert warm(11) == pytest.approx(1.0 - 1 / 100, rel=0.2)


def test_build_param_groups_and_optimizer():
    params = {
        "encoder": {"Conv_0": {"kernel": jnp.zeros((3, 3, 3, 8)), "bias": jnp.zeros((8,))},
                    "BatchNorm_0": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}},
        "head": {"Conv_0": {"kernel": jnp.zeros((1, 1, 8, 2)), "bias": jnp.zeros((2,))}},
    }
    labels, groups, defaults = O.build_optimizer_param_groups(
        params,
        learning_rate={"encoder": 1e-4, "_default_": 1e-3},
        weight_decay=1e-2,
        apply_weight_decay_on_norm=False,
        apply_weight_decay_on_bias=False,
    )
    assert defaults == {"lr": 1e-3, "weight_decay": 1e-2}
    assert labels["encoder"]["Conv_0"]["kernel"] == "encoder_default"
    assert labels["encoder"]["BatchNorm_0"]["scale"] == "encoder_no_wd_on_norm"
    assert labels["encoder"]["BatchNorm_0"]["bias"] == "encoder_no_wd_on_norm"
    assert labels["head"]["Conv_0"]["bias"] == "default_no_wd_on_bias"
    total = sum(g["count"] for g in groups.values())
    assert total == O.count_optimizable_parameters(params)

    tx = O.make_optimizer(params, learning_rate={"encoder": 1e-4, "_default_": 1e-3},
                          weight_decay=1e-2)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert jax.tree_util.tree_structure(updates) == jax.tree_util.tree_structure(params)


def test_missing_default_raises():
    with pytest.raises(RuntimeError):
        O.build_optimizer_param_groups({"a": jnp.zeros(1)}, {"enc": 1e-3}, 0.0)


# --- datasets ---------------------------------------------------------------


def test_name_for_stride():
    assert D.name_for_stride("TARGET_MASK_KEY", 4) == "TARGET_MASK_KEY_STRIDE_4"
    assert D.name_for_stride("X", None) == "X"


def test_mask_targets():
    mask = (np.random.RandomState(0).rand(8, 8) > 0.5).astype(np.uint8)
    bce = D.mask_to_bce_target(mask)
    assert bce.shape == (8, 8, 1) and bce.dtype == np.float32
    ce = D.mask_to_ce_target(mask[..., None])
    assert ce.shape == (8, 8) and ce.dtype == np.int32


def test_compute_weight_mask():
    mask = np.zeros((32, 32), dtype=np.uint8)
    mask[8:24, 8:24] = 1
    w = D.compute_weight_mask(mask, edge_weight=4)
    assert w.shape == (32, 32)
    assert w.max() > 1.5  # edges emphasized
    assert w.min() >= 0.9


def test_block_reduce_dominant_label():
    x = np.array([[[0, 0, 1], [1, 1, 1]], [[2, 2, 2], [0, 1, 2]]])
    reduced = D.block_reduce_dominant_label(x)
    assert reduced.shape == (2, 2)
    assert reduced[0, 0] == 0 and reduced[0, 1] == 1 and reduced[1, 0] == 2


def test_random_subset_datasets():
    base = list(range(100))
    ds = D.RandomSubsetDataset(base, num_samples=10)
    assert len(ds) == 10
    assert all(0 <= ds[i] < 100 for i in range(10))

    weighted = D.RandomSubsetDataset(base, 10, weights=np.ones(100))
    assert 0 <= weighted[0] < 100

    mask = np.zeros(100, dtype=bool)
    mask[42] = True
    masked = D.RandomSubsetWithMaskDataset(base, mask, num_samples=5)
    assert all(masked[i] == 42 for i in range(5))

    with pytest.raises(ValueError):
        D.RandomSubsetWithMaskDataset(base, np.zeros(100, dtype=bool), 5)


def test_mean_std_calculator():
    calc = D.DatasetMeanStdCalculator(num_channels=3)
    rng = np.random.RandomState(0)
    images = [rng.rand(16, 16, 3) for _ in range(10)]
    for img in images:
        calc.accumulate(img)
    mean, std = calc.compute()
    stacked = np.stack(images).reshape(-1, 3)
    np.testing.assert_allclose(mean, stacked.mean(0), atol=1e-2)
    np.testing.assert_allclose(std, stacked.std(0), atol=2e-2)


def test_namesgenerator_and_seed():
    name = U.get_random_name()
    assert "_" in name
    key = U.set_manual_seed(42)
    assert key.shape == (2,) or key.dtype  # a jax PRNG key
    state = U.get_rng_state()
    a = np.random.rand()
    U.set_rng_state(state)
    b = np.random.rand()
    assert a == b


def test_python_utils():
    assert U.maybe_eval("$1+1") == 2
    assert U.maybe_eval("plain") == "plain"
    assert U.without({"a": 1, "b": 2}, "a") == {"b": 2}
    assert U.as_tuple_of_two(512) == (512, 512)
    assert U.as_tuple_of_two((1, 2)) == (1, 2)


# --- profiling & checkpoint ---------------------------------------------------


def test_benchmark_and_timer():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((128, 128))
    stats = U.benchmark(f, x, iters=3, warmup=1)
    assert stats["mean_s"] > 0 and stats["best_s"] <= stats["mean_s"]
    with U.Timer() as t:
        pass
    assert t.elapsed >= 0


def test_describe_compile():
    f = lambda a, b: a @ b
    a = jnp.ones((64, 64))
    stats = U.describe_compile(f, a, a)
    assert "flops" in stats


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt")
    U.save_checkpoint(path, state)
    assert U.checkpoint_exists(path)
    restored = U.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"]))
    assert int(np.asarray(restored["step"])) == 7


def test_default_collate_and_discovery():
    samples = [
        {"image": np.zeros((4, 4, 3)), "label": 1, "id": "a"},
        {"image": np.ones((4, 4, 3)), "label": 2, "id": "b"},
    ]
    batch = D.default_collate(samples)
    assert batch["image"].shape == (2, 4, 4, 3)
    assert batch["label"].tolist() == [1, 2]
    assert batch["id"] == ["a", "b"]

    class WithCollate:
        def get_collate_fn(self):
            return lambda b: "custom"

    assert D.get_collate_for_dataset(WithCollate())([1]) == "custom"
    assert D.get_collate_for_dataset(object()) is D.default_collate

    class Concat:
        datasets = [WithCollate(), WithCollate()]

    # different lambda instances -> inconsistent
    with pytest.raises(ValueError):
        D.get_collate_for_dataset(Concat())


def test_benchmark_zero_warmup():
    f = jax.jit(lambda x: x + 1)
    stats = U.benchmark(f, jnp.ones((8,)), iters=2, warmup=0)
    assert stats["mean_s"] > 0


def test_read_images_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "img.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    loaded = U.read_rgb_image(path)
    np.testing.assert_array_equal(loaded, img)
    as_is = U.read_image_as_is(path)
    assert as_is.shape == (16, 16, 3)

    mask = (np.random.RandomState(1).rand(16, 16) > 0.5).astype(np.uint8) * 200
    mpath = str(tmp_path / "mask.png")
    cv2.imwrite(mpath, mask)
    binary = D.read_binary_mask(mpath)
    np.testing.assert_array_equal(binary, (mask > 0).astype(np.uint8))


def test_prefetch_to_device_sharded():
    """prefetch_to_device: order preserved, leaves on device, optional mesh
    sharding applied, short iterables handled."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_toolbelt_tpu.datasets import prefetch_to_device
    from pytorch_toolbelt_tpu.distributed import make_mesh

    batches = [{"x": np.full((8, 4), i, np.float32), "y": np.arange(8) + i} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i
        assert isinstance(b["x"], jax.Array)

    mesh = make_mesh(jax.devices(), data_parallel=8)
    sharding = NamedSharding(mesh, P("data"))
    out = list(prefetch_to_device(iter(batches[:3]), size=4, sharding=sharding))
    assert len(out) == 3
    assert out[0]["x"].sharding == sharding

    assert list(prefetch_to_device(iter([]), size=2)) == []


def test_enable_compile_cache(tmp_path):
    # Warm jax's persistent-cache singleton on dir A, then re-point to
    # dir B and assert entries actually land in B.  Regression: before
    # round 5, once ANY compile had initialized the singleton (e.g. any
    # earlier test), a later enable_compile_cache(new_dir) was a silent
    # no-op — config changed, writes kept going to the old dir.  This
    # test is therefore order-independent by construction: it always
    # starts from an initialized singleton.
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        first = U.enable_compile_cache(
            str(tmp_path / "xla_a"), min_compile_time_secs=0.0
        )
        jax.jit(lambda x: jnp.sin(x).sum())(
            jnp.ones((32, 32), jnp.float32)
        ).block_until_ready()

        path = U.enable_compile_cache(
            str(tmp_path / "xla_b"), min_compile_time_secs=0.0
        )
        assert path != first and os.path.isdir(path)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
        assert os.listdir(path), "no cache entry written after re-point"
        # idempotent re-enable of the same dir
        assert U.enable_compile_cache(str(tmp_path / "xla_b")) == path
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        # Drop the tmp-dir singleton so later tests see the restored config.
        U.compile_cache._reset_cache_singleton()
