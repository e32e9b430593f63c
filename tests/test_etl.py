"""ETL tests: TF1-compatible resize semantics (vs TF oracle), label
bit-matching, and the end-to-end generate_dataset CLI on a synthetic
Freiburg tree."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from semanticsegmentationactivelearning_tpu import datasets
from semanticsegmentationactivelearning_tpu.data import etl, example

try:
    import tensorflow as tf
    HAVE_TF = True
except ImportError:  # pragma: no cover
    HAVE_TF = False


class TestResize:
    @pytest.mark.skipif(not HAVE_TF, reason="needs TF oracle")
    def test_nearest_matches_tf_legacy(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (37, 53, 1), dtype=np.uint8)
        ours = etl.resize_nearest(img, (20, 48))
        # TF1 legacy kernel == v2 kernel with half_pixel_centers=False
        ref = tf.compat.v1.image.resize_nearest_neighbor(
            img[None], (20, 48), align_corners=False,
            half_pixel_centers=False).numpy()[0]
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.skipif(not HAVE_TF, reason="needs TF oracle")
    def test_bilinear_matches_tf_legacy(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (41, 67, 3), dtype=np.uint8)
        ours = etl.resize_bilinear(img, (100, 160))
        ref = tf.compat.v1.image.resize_bilinear(
            img[None].astype(np.float32), (100, 160),
            align_corners=False, half_pixel_centers=False).numpy()[0]
        # tolerance covers float accumulation-order differences only
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_identity(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        np.testing.assert_array_equal(etl.resize_nearest(img, (3, 4)), img)

    def test_center_crop_aspect(self):
        img = np.arange(4 * 12).reshape(4, 12).astype(np.uint8)
        out = etl.center_crop_aspect(img, 2.0)
        assert out.shape == (4, 8)
        np.testing.assert_array_equal(out, img[:, 2:10])
        # under the limit: untouched
        np.testing.assert_array_equal(etl.center_crop_aspect(img, 4.0), img)


class TestLabelProcessing:
    def test_label_pipeline_bit_match(self, tmp_path):
        """Raw cityscapes-style labelIds -> resize -> LUT must equal the
        composition applied by the reference graph."""
        ds = datasets.Cityscapes()
        rng = np.random.default_rng(2)
        raw = rng.integers(0, 34, (64, 128), dtype=np.uint8)
        p = str(tmp_path / "raw.png")
        Image.fromarray(raw).save(p)

        png, shape = etl.process_label(p, ds.embedding, width=64,
                                       max_aspect=-1.0)
        assert shape == (32, 64, 1)
        import io
        decoded = np.asarray(Image.open(io.BytesIO(png)))
        expected = ds.embedding[etl.resize_nearest(raw, (32, 64))]
        np.testing.assert_array_equal(decoded, expected)


@pytest.fixture
def freiburg_tree(tmp_path):
    """Synthetic Freiburg Forest tree with real PNG/JPG files."""
    root = tmp_path / "freiburg"
    rng = np.random.default_rng(3)
    colors = np.array([(170, 170, 170), (0, 255, 0), (102, 102, 51),
                       (0, 120, 255), (0, 0, 0)], dtype=np.uint8)
    for split, n in [("train", 4), ("test", 2)]:
        (root / split / "GT_color").mkdir(parents=True)
        (root / split / "rgb").mkdir(parents=True)
        for i in range(n):
            idx = rng.integers(0, len(colors), (32, 48))
            Image.fromarray(colors[idx]).save(
                root / split / "GT_color" / f"{split[0]}{i:03d}_Clipped.png")
            img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                root / split / "rgb" / f"{split[0]}{i:03d}.png")
    return root


class TestGenerateDatasetCLI:
    def test_end_to_end(self, freiburg_tree, tmp_path):
        out = tmp_path / "records"
        res = subprocess.run(
            [sys.executable, "generate_dataset.py",
             "-d", str(freiburg_tree), "-t", "freiburg",
             "-o", str(out)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        # strided val split moves t000 into val
        assert sorted(os.listdir(out)) == ["test", "train", "val"]
        train_recs = sorted(os.listdir(out / "train"))
        assert len(train_recs) == 3 and train_recs[0].endswith(".tfrecord")

        ex = example.read_example(str(out / "train" / train_recs[0]))
        assert (ex.height, ex.width) == (32, 48)
        assert ex.modalities["image"][1] == "png"
        assert ex.modalities["image"][2] == 3
        # label decodes to valid trainIds
        label = etl.decode_image(ex.label)
        assert label.shape == (32, 48)
        assert set(np.unique(label)) <= set(range(6)) | {255}
        # image passes through unmodified (no resize requested)
        img_name = train_recs[0].replace(".tfrecord", "")
        raw = open(freiburg_tree / "train" / "rgb" / f"{img_name}.png",
                   "rb").read()
        assert ex.modalities["image"][0] == raw

    def test_shape_mismatch_raises(self, tmp_path):
        ds = datasets.Freiburg()
        (tmp_path / "x").mkdir()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "x" / "lbl.png")
        Image.fromarray(np.zeros((8, 10, 3), np.uint8)).save(
            tmp_path / "x" / "img.png")
        with pytest.raises(ValueError, match="Incompatible shapes"):
            etl.write_example(
                "x", {"label": str(tmp_path / "x" / "lbl.png"),
                      "image": str(tmp_path / "x" / "img.png")},
                ds.embedding, str(tmp_path / "out"))
