"""Image observability tests (reference wrote TB image summaries,
train.py:178-206, active_learning.py:367-388)."""

import numpy as np

from semanticsegmentationactivelearning_tpu.utils import images


def _colormap():
    cmap = np.zeros((256, 3), np.uint8)
    cmap[0] = (10, 20, 30)
    cmap[1] = (40, 50, 60)
    cmap[255] = (255, 255, 255)
    return cmap


def test_colorize():
    lbl = np.array([[0, 1], [255, 0]], np.uint8)
    rgb = images.colorize(lbl, _colormap())
    np.testing.assert_array_equal(rgb[0, 0], (10, 20, 30))
    np.testing.assert_array_equal(rgb[0, 1], (40, 50, 60))
    np.testing.assert_array_equal(rgb[1, 0], (255, 255, 255))


def test_dump_summaries(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(3, 8, 10, 3)).astype(np.float32)
    lbls = rng.integers(0, 2, (3, 8, 10)).astype(np.uint8)
    preds = rng.integers(0, 2, (3, 8, 10)).astype(np.int32)
    written = images.dump_summaries(
        str(tmp_path), "val", 7, imgs, lbls, preds,
        colormap=_colormap(), count=2)
    # 2 examples x (input, label, pred)
    assert len(written) == 6
    names = sorted(p.name for p in (tmp_path / "images").glob("*.png"))
    assert names == [
        "val-00007-0-input.png", "val-00007-0-label.png",
        "val-00007-0-pred.png", "val-00007-1-input.png",
        "val-00007-1-label.png", "val-00007-1-pred.png"]
    lbl_png = np.asarray(Image.open(tmp_path / "images" /
                                    "val-00007-0-label.png"))
    np.testing.assert_array_equal(lbl_png,
                                  images.colorize(lbls[0], _colormap()))
    inp = np.asarray(Image.open(tmp_path / "images" /
                                "val-00007-0-input.png"))
    assert inp.shape == (8, 10, 3)


def test_dump_pseudo_with_mask(tmp_path):
    preds = np.ones((1, 4, 4), np.int32)
    mask = np.zeros((1, 4, 4), np.float32)
    mask[0, :2] = 1.0
    written = images.dump_summaries(
        str(tmp_path), "pseudo-iter1", 100, preds=preds, masks=mask,
        colormap=_colormap(), count=1)
    from PIL import Image
    arr = np.asarray(Image.open(written[0]))
    # masked-out rows are blacked
    assert (arr[:2] == (40, 50, 60)).all()
    assert (arr[2:] == 0).all()
