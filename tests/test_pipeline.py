"""Input pipeline tests: jit augmentation semantics, sampler behavior,
and loader batching over real record files."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.data import (
    SegExample, etl, loader, make_example, pipeline, sampler, tfrecord)


class TestGenerateMask:
    def test_semantics(self):
        labels = jnp.array([[0, 5, 255], [255, 18, 2]], dtype=jnp.int32)
        clean, mask = pipeline.generate_mask(labels)
        np.testing.assert_array_equal(
            np.asarray(clean), [[0, 5, 0], [0, 18, 2]])
        np.testing.assert_array_equal(
            np.asarray(mask), [[1, 1, 0], [0, 1, 1]])


def _make_stack(batch=2, h=16, w=24, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    stack = rng.integers(0, 255, (batch, h, w, channels + 1),
                         dtype=np.uint8)
    stack[..., channels] = rng.integers(0, 6, (batch, h, w))
    stack[0, 0, 0, channels] = 255  # one ignore pixel
    return stack


class TestAugmentBatch:
    def test_shapes_and_ranges(self):
        stack = _make_stack()
        heights = np.array([16, 12], np.int32)
        widths = np.array([24, 20], np.int32)
        img, img_dist, label, mask = pipeline.augment_batch(
            stack, heights, widths, jax.random.PRNGKey(0),
            crop_hw=(8, 12))
        assert img.shape == (2, 8, 12, 3) and img.dtype == jnp.float32
        assert img_dist.shape == (2, 8, 12, 3)
        assert label.shape == (2, 8, 12) and label.dtype == jnp.int32
        assert mask.shape == (2, 8, 12)
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
        assert float(img_dist.min()) >= 0.0 and float(img_dist.max()) <= 1.0

    def test_crop_stays_in_valid_region(self):
        # Put sentinel garbage in the padding; valid region is all zeros.
        stack = np.full((1, 16, 16, 4), 200, dtype=np.uint8)
        stack[0, :8, :8, :] = 0
        heights = np.array([8], np.int32)
        widths = np.array([8], np.int32)
        for seed in range(10):
            img, _d, label, _m = pipeline.augment_batch(
                stack, heights, widths, jax.random.PRNGKey(seed),
                crop_hw=(8, 8))
            assert float(jnp.max(img)) == 0.0
            assert int(jnp.max(label)) == 0

    def test_deterministic_given_key(self):
        stack = _make_stack()
        h = np.array([16, 16], np.int32)
        w = np.array([24, 24], np.int32)
        a = pipeline.augment_batch(stack, h, w, jax.random.PRNGKey(3),
                                   crop_hw=(8, 8))
        b = pipeline.augment_batch(stack, h, w, jax.random.PRNGKey(3),
                                   crop_hw=(8, 8))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_raw_vs_distorted_differ_only_by_channel_scale(self):
        stack = _make_stack()
        h = np.array([16, 16], np.int32)
        w = np.array([24, 24], np.int32)
        img, img_dist, _l, _m = pipeline.augment_batch(
            stack, h, w, jax.random.PRNGKey(1), crop_hw=(8, 8))
        img, img_dist = np.asarray(img), np.asarray(img_dist)
        # Per example & channel the (unclipped) ratio is constant.
        for b in range(2):
            for c in range(3):
                sel = (img[b, :, :, c] > 0.01) & (img_dist[b, :, :, c] < 0.99)
                if sel.sum() < 10:
                    continue
                ratios = img_dist[b, :, :, c][sel] / img[b, :, :, c][sel]
                assert ratios.std() < 1e-4
                assert 0.8 <= ratios.mean() <= 1.4


class TestScoreBatch:
    def test_matches_augment_raw(self):
        """The label-free scoring crop must be bit-identical to the
        train path's raw crop for the same key (shared PRNG path)."""
        stack = _make_stack()
        h = np.array([16, 12], np.int32)
        w = np.array([24, 20], np.int32)
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            raw, _d, _l, _m = pipeline.augment_batch(
                stack, h, w, key, crop_hw=(8, 12))
            scored = pipeline.score_batch(
                stack[..., :3], h, w, key, crop_hw=(8, 12))
            assert scored.shape == (2, 8, 12, 3)
            np.testing.assert_array_equal(np.asarray(scored),
                                          np.asarray(raw))

    def test_channels_slice_guards_oversized_stack(self):
        """An explicit channels arg keeps parity with augment_batch
        even when the scoring stack carries extra planes."""
        stack = _make_stack()  # 4 planes: 3 image + label
        h = np.array([16, 12], np.int32)
        w = np.array([24, 20], np.int32)
        key = jax.random.PRNGKey(3)
        raw, _d, _l, _m = pipeline.augment_batch(
            stack, h, w, key, crop_hw=(8, 12))
        scored = pipeline.score_batch(
            stack, h, w, key, crop_hw=(8, 12), channels=3)
        assert scored.shape == (2, 8, 12, 3)
        np.testing.assert_array_equal(np.asarray(scored),
                                      np.asarray(raw))


class TestScoreBatchIndexed:
    def test_invariant_to_batch_chunking(self):
        """Per-example crop keys: an example's crop/flip depend only on
        (pass_key, global index), so scores can't change when the pool
        is re-chunked (size buckets, grouped dispatch)."""
        rng = np.random.default_rng(0)
        stack = rng.integers(0, 255, (4, 16, 24, 3), np.uint8)
        h = np.array([16, 12, 16, 10], np.int32)
        w = np.array([24, 20, 18, 24], np.int32)
        key = jax.random.PRNGKey(7)
        idx = np.arange(4, dtype=np.int32)
        full = np.asarray(pipeline.score_batch_indexed(
            stack, h, w, key, idx, crop_hw=(8, 12)))
        # same rows re-chunked (reversed pairs) must crop identically
        order = np.array([2, 3, 0, 1])
        re = np.asarray(pipeline.score_batch_indexed(
            stack[order], h[order], w[order], key, idx[order],
            crop_hw=(8, 12)))
        np.testing.assert_array_equal(re, full[order])
        # different pass keys change the crops (randomness is real)
        other = np.asarray(pipeline.score_batch_indexed(
            stack, h, w, jax.random.PRNGKey(8), idx, crop_hw=(8, 12)))
        assert not np.array_equal(other, full)

    def test_channels_slice(self):
        stack = _make_stack()
        out = pipeline.score_batch_indexed(
            stack, np.array([16, 12], np.int32),
            np.array([24, 20], np.int32), jax.random.PRNGKey(0),
            np.arange(2, dtype=np.int32), crop_hw=(8, 12), channels=3)
        assert out.shape == (2, 8, 12, 3)


class TestSizeBuckets:
    def test_partition_and_windows(self):
        dims = np.array([[32, 48]] * 5 + [[64, 96]] * 5)
        plan, saving = loader.size_buckets(dims, 3, min_hw=(32, 48))
        assert len(plan) == 2  # equal-window groups merge
        sizes = sorted((tuple(hw), len(idx)) for idx, hw in plan)
        assert sizes == [((32, 48), 5), ((64, 96), 5)]
        all_idx = np.sort(np.concatenate([idx for idx, _ in plan]))
        np.testing.assert_array_equal(all_idx, np.arange(10))
        # bytes saved vs the global 64x96 window
        assert saving == pytest.approx(
            1 - (5 * 32 * 48 + 5 * 64 * 96) / (10 * 64 * 96))

    def test_min_hw_clamps_windows(self):
        dims = np.array([[8, 8]] * 4 + [[64, 96]] * 4)
        plan, _ = loader.size_buckets(dims, 2, min_hw=(32, 48))
        assert plan[0][1] == (32, 48)  # clamped up to the crop window

    def test_small_saving_degenerates_to_one_bucket(self):
        dims = np.array([[30, 46]] * 5 + [[32, 48]] * 5)
        plan, saving = loader.size_buckets(dims, 3, min_hw=(30, 46))
        assert len(plan) == 1 and saving == 0.0
        assert plan[0][1] == (32, 48)
        np.testing.assert_array_equal(plan[0][0], np.arange(10))

    def test_uniform_sizes_single_bucket(self):
        dims = np.array([[32, 48]] * 7)
        plan, saving = loader.size_buckets(dims, 3)
        assert len(plan) == 1 and saving == 0.0

    def test_loader_caches_record_dims(self, record_dir):
        files = sorted(
            str(record_dir / f) for f in record_dir.iterdir()
            if str(f).endswith(".tfrecord"))
        ld = loader.RecordLoader(files, 2)
        assert ld.record_dims is not None
        assert ld.record_dims.shape == (len(files), 2)
        assert tuple(ld.record_dims.max(axis=0)) == ld.storage_hw


class TestEvalBatch:
    def test_center_crop(self):
        stack = np.zeros((1, 16, 16, 4), dtype=np.uint8)
        stack[0, 6:10, 6:10, 0] = 100  # center block
        img, label, mask = pipeline.eval_batch(
            stack, np.array([16], np.int32), np.array([16], np.int32),
            crop_hw=(4, 4))
        np.testing.assert_allclose(np.asarray(img[0, :, :, 0]),
                                   np.full((4, 4), 100 / 255.0), atol=1e-6)


class TestIndexSampler:
    def test_full_range_default(self):
        s = sampler.IndexSampler(["a", "b", "c"],
                                 rng=np.random.default_rng(0))
        assert s.size == 3
        assert sorted(s.epoch_order().tolist()) == [0, 1, 2]

    def test_subset_plus_sample(self):
        s = sampler.IndexSampler([f"f{i}" for i in range(10)],
                                 rng=np.random.default_rng(0))
        s.set_indices(np.array([0, 1, 2]))
        s.set_sample_size(4)
        assert s.size == 7
        order = s.epoch_order()
        assert len(order) == 7
        assert {0, 1, 2} <= set(order.tolist())
        # sampled indices come from the complement, no duplicates
        extra = [i for i in order if i not in (0, 1, 2)]
        assert len(set(extra)) == 4
        assert all(3 <= i <= 9 for i in extra)

    def test_sample_capped_at_pool(self):
        s = sampler.IndexSampler(list("abcd"), rng=np.random.default_rng(1))
        s.set_indices(np.array([0, 1, 2]))
        s.set_sample_size(10)
        assert len(s.epoch_order()) == 4

    def test_reset(self):
        s = sampler.IndexSampler(list("abcd"))
        s.set_indices(np.array([1]))
        s.set_sample_size(2)
        s.set_indices(None)
        assert s.size == 4


@pytest.fixture
def record_dir(tmp_path):
    rng = np.random.default_rng(7)
    for i in range(5):
        img = rng.integers(0, 255, (12, 18, 3), dtype=np.uint8)
        lbl = rng.integers(0, 6, (12, 18), dtype=np.uint8)
        blob = make_example(SegExample(
            file_id=f"ex{i}", height=12, width=18,
            label=etl.encode_png(lbl) if i != 4 else None,
            modalities={"image": (etl.encode_png(img), "png", 3)}))
        tfrecord.write_record_file(str(tmp_path / f"ex{i}.tfrecord"), blob)
    return tmp_path


class TestRecordLoader:
    def test_batching_and_padding(self, record_dir):
        files = sorted(str(p) for p in record_dir.glob("*.tfrecord"))
        ld = loader.RecordLoader(files, batch_size=2)
        assert ld.storage_hw == (12, 18)
        batches = list(ld.batches())
        assert len(batches) == 3
        for b in batches[:2]:
            assert b["stack"].shape == (2, 12, 18, 4)
            assert b["valid"].all()
        last = batches[2]
        assert last["valid"].tolist() == [True, False]
        assert last["index"].tolist() == [4, 4]
        # ex4 has no label -> plane filled with 255
        assert (last["stack"][0, :, :, 3] == 255).all()
        assert not last["has_label"][0]

    def test_global_batch_layout_mirrors_global_batches(self,
                                                        record_dir):
        """The host-side layout helper must reproduce global_batches'
        row placement exactly: for every process, local row j of batch
        g is layout index [p*local+j] (padding rows invalid) — the
        multi-host AL ranking pass scatters fetched scores with it."""
        files = sorted(str(p) for p in record_dir.glob("*.tfrecord"))
        order = np.array([3, 0, 4, 2, 1])
        global_bs, nproc = 4, 2
        ld = loader.RecordLoader(files, batch_size=global_bs // nproc)
        layouts = list(loader.RecordLoader.global_batch_layout(
            order, global_bs, nproc))
        assert len(layouts) == 2
        local = global_bs // nproc
        for p in range(nproc):
            for g, b in enumerate(ld.global_batches(
                    order, global_bs, p, nproc)):
                gidx, gval = layouts[g]
                sl = slice(p * local, (p + 1) * local)
                np.testing.assert_array_equal(
                    np.where(b["valid"], b["index"], -1),
                    np.where(gval[sl], gidx[sl], -1))
                np.testing.assert_array_equal(b["valid"], gval[sl])
        # every example appears exactly once across valid slots
        all_idx = np.concatenate([gi[gv] for gi, gv in layouts])
        assert sorted(all_idx.tolist()) == sorted(order.tolist())

    def test_label_free_loader(self, record_dir):
        """with_label=False drops the label plane but leaves the image
        channels byte-identical (pool-ranking fast path)."""
        files = sorted(str(p) for p in record_dir.glob("*.tfrecord"))
        full = loader.RecordLoader(files, batch_size=2)
        lean = loader.RecordLoader(files, batch_size=2,
                                   with_label=False)
        for bf, bl in zip(full.batches(), lean.batches()):
            assert bl["stack"].shape == bf["stack"].shape[:3] + (3,)
            np.testing.assert_array_equal(bl["stack"],
                                          bf["stack"][..., :3])
            np.testing.assert_array_equal(bl["valid"], bf["valid"])
            np.testing.assert_array_equal(bl["index"], bf["index"])
        # the pure-Python decode path must agree too (native may or
        # may not be built in this environment)
        py = loader.RecordLoader(files, batch_size=2, use_native=False,
                                 with_label=False)
        for bf, bl in zip(full.batches(), py.batches()):
            np.testing.assert_array_equal(bl["stack"],
                                          bf["stack"][..., :3])

    def test_abandoned_iterator_reaps_producer(self, record_dir):
        """Closing batches() mid-iteration must unblock and join the
        producer thread (it used to stay parked forever in a full
        queue's put, pinning the worker pool and prefetched stacks)."""
        import threading
        files = sorted(str(p) for p in record_dir.glob("*.tfrecord"))
        ld = loader.RecordLoader(files, batch_size=1, prefetch=1)
        before = set(threading.enumerate())
        it = ld.batches()
        next(it)          # producer now blocked on the full out_q
        it.close()        # GeneratorExit -> stop event + join
        leaked = [t for t in threading.enumerate()
                  if t not in before and t.is_alive()]
        assert not leaked, f"producer threads leaked: {leaked}"

    def test_invalid_prefetch_rejected(self, record_dir):
        """prefetch=0 would make the producer queue unbounded (decode
        the whole epoch ahead); it must be rejected at construction."""
        files = sorted(str(p) for p in record_dir.glob("*.tfrecord"))
        with pytest.raises(ValueError, match="prefetch"):
            loader.RecordLoader(files, batch_size=2, prefetch=0)

    def test_forced_native_fails_fast(self, record_dir, monkeypatch):
        """use_native=True without the library must fail at
        construction, not from the producer thread at the first
        batch."""
        from semanticsegmentationactivelearning_tpu.data import native
        monkeypatch.setattr(native, "available", lambda: False)
        files = sorted(str(p) for p in record_dir.glob("*.tfrecord"))
        with pytest.raises(ValueError, match="native"):
            loader.RecordLoader(files, batch_size=2, use_native=True)

    def test_label_dim_mismatch_raises(self, tmp_path):
        """A label plane whose dimensions differ from the image must
        raise the loader's descriptive error (same contract as the
        modality planes), not broadcast-error or silently misalign."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (12, 18, 3), dtype=np.uint8)
        lbl = rng.integers(0, 6, (6, 18), dtype=np.uint8)  # wrong H
        blob = make_example(SegExample(
            file_id="bad", height=12, width=18,
            label=etl.encode_png(lbl),
            modalities={"image": (etl.encode_png(img), "png", 3)}))
        path = tmp_path / "bad.tfrecord"
        tfrecord.write_record_file(str(path), blob)
        with pytest.raises(ValueError, match="label.*6x18|6x18.*label"):
            loader.load_stack(str(path), (12, 18))

    def test_legacy_record_without_channels_header(self, tmp_path):
        """Records missing the image/channels feature (legacy writers)
        default to RGB in every header probe instead of poisoning the
        loader with channels=-1."""
        from semanticsegmentationactivelearning_tpu.data import (
            example, proto)
        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (12, 18, 3), dtype=np.uint8)
        blob = proto.encode_example({
            "height": [12], "width": [18], "id": [b"legacy"],
            "image/data": [etl.encode_png(img)],
            "image/encoding": [b"png"],
        })
        path = tmp_path / "legacy.tfrecord"
        tfrecord.write_record_file(str(path), blob)
        assert example.peek_dims(str(path)) == (12, 18, 3)
        assert loader.probe_channels(str(path)) == 3
        assert example.image_channels(example.read_example(str(path))) == 3
        ld = loader.RecordLoader([str(path)], batch_size=1,
                                 use_native=False)
        assert ld.channels == 3
        batch = next(iter(ld.batches()))
        assert batch["stack"].shape == (1, 12, 18, 4)

    def test_order_respected(self, record_dir):
        files = sorted(str(p) for p in record_dir.glob("*.tfrecord"))
        ld = loader.RecordLoader(files, batch_size=2)
        order = np.array([3, 1, 0, 2])
        got = [b["index"].tolist() for b in ld.batches(order)]
        assert got == [[3, 1], [0, 2]]

    def test_mixed_size_records_no_cropping(self, tmp_path):
        """Vistas-style per-record arbitrary H x W: the storage window
        is sized to the max over ALL records (not the first), so no
        valid pixels are cropped (reference handled dynamic shapes,
        input.py:246-287)."""
        rng = np.random.default_rng(8)
        sizes = [(8, 10), (20, 6), (12, 24)]
        imgs = []
        for i, (h, w) in enumerate(sizes):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            imgs.append(img)
            blob = make_example(SegExample(
                file_id=f"mix{i}", height=h, width=w,
                label=etl.encode_png(
                    rng.integers(0, 6, (h, w), dtype=np.uint8)),
                modalities={"image": (etl.encode_png(img), "png", 3)}))
            tfrecord.write_record_file(
                str(tmp_path / f"mix{i}.tfrecord"), blob)
        files = sorted(str(p) for p in tmp_path.glob("*.tfrecord"))
        ld = loader.RecordLoader(files, batch_size=3)
        assert ld.storage_hw == (20, 24)
        (b,) = list(ld.batches())
        for i, (h, w) in enumerate(sizes):
            assert (b["heights"][i], b["widths"][i]) == (h, w)
            np.testing.assert_array_equal(b["stack"][i, :h, :w, :3],
                                          imgs[i])
            # outside the valid window: zero image, 255 ignore label
            assert (b["stack"][i, h:, :, 3] == 255).all()
            assert (b["stack"][i, :, w:, :3] == 0).all()

    def test_decode_error_propagates(self, tmp_path):
        bad = tmp_path / "bad.tfrecord"
        bad.write_bytes(b"")
        # a bad FIRST record already fails fast at construction
        # (channel probe reads its header)
        with pytest.raises(ValueError):
            loader.RecordLoader([str(bad)], batch_size=1,
                                storage_hw=(4, 4))
        # a bad record mid-stream must propagate out of the producer
        # thread to the consuming iterator
        ld = loader.RecordLoader([str(bad)], batch_size=1,
                                 storage_hw=(4, 4), channels=3)
        with pytest.raises(ValueError):
            list(ld.batches())


class TestDevicePrefetch:
    def test_prefetch_preserves_order_and_contents(self):
        from semanticsegmentationactivelearning_tpu.data import \
            device_prefetch
        batches = [{"stack": np.full((2, 4, 4, 4), i, np.uint8),
                    "index": np.array([2 * i, 2 * i + 1])}
                   for i in range(5)]
        out = list(device_prefetch.device_prefetch(iter(batches)))
        assert len(out) == 5
        for i, b in enumerate(out):
            # large key transferred to device, metadata left as numpy
            assert hasattr(b["stack"], "devices")
            assert isinstance(b["index"], np.ndarray)
            np.testing.assert_array_equal(np.asarray(b["stack"]),
                                          batches[i]["stack"])

    def test_empty_iterator(self):
        from semanticsegmentationactivelearning_tpu.data import \
            device_prefetch
        assert list(device_prefetch.device_prefetch(iter([]))) == []

    def test_invalid_depth_rejected(self):
        from semanticsegmentationactivelearning_tpu.data import \
            device_prefetch
        with pytest.raises(ValueError, match="depth"):
            next(device_prefetch.device_prefetch(iter([]), depth=0))

    def test_early_exit_closes_wrapped_iterator(self):
        """Abandoning device_prefetch mid-iteration must close() the
        wrapped generator deterministically (RecordLoader.batches stops
        its producer thread in response), not wait for GC."""
        from semanticsegmentationactivelearning_tpu.data import \
            device_prefetch
        closed = []

        def gen():
            try:
                for i in range(10):
                    yield {"stack": np.zeros((1, 2, 2, 1), np.uint8),
                           "i": i}
            finally:
                closed.append(True)

        it = device_prefetch.device_prefetch(gen())
        next(it)
        it.close()
        assert closed == [True]

    def test_sharded_prefetch(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from semanticsegmentationactivelearning_tpu.data import \
            device_prefetch
        from semanticsegmentationactivelearning_tpu.parallel import \
            make_mesh
        mesh = make_mesh(8)
        sh = NamedSharding(mesh, P("data"))
        batches = [{"stack": np.zeros((8, 4, 4, 4), np.uint8)}]
        out = list(device_prefetch.device_prefetch(iter(batches),
                                                   sharding=sh))
        assert len(out[0]["stack"].sharding.device_set) == 8
