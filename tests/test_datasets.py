"""Golden-value tests for dataset metadata tables (SURVEY.md §4b).

Spot values are the public Cityscapes/Vistas/Freiburg definitions; the
LUT construction semantics mirror reference datasets/*.py.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast CI lane (pytest -m quick)

from semanticsegmentationactivelearning_tpu import datasets
from semanticsegmentationactivelearning_tpu.datasets.base import (
    embed_label_image)


class TestCityscapes:
    ds = datasets.Cityscapes()

    def test_num_classes(self):
        assert self.ds.num_classes == 19

    def test_embedding_spot_values(self):
        emb = self.ds.embedding
        assert emb.shape == (256,) and emb.dtype == np.uint8
        # road id=7 -> 0, sidewalk 8 -> 1, car 26 -> 13, bicycle 33 -> 18
        assert emb[7] == 0
        assert emb[8] == 1
        assert emb[26] == 13
        assert emb[33] == 18
        # void ids -> 255
        assert emb[0] == 255 and emb[4] == 255 and emb[14] == 255
        # unused raw values -> 255
        assert emb[34] == 255 and emb[200] == 255

    def test_embedding_reversed_roundtrip(self):
        emb, rev = self.ds.embedding, self.ds.embedding_reversed
        for train_id in range(19):
            assert emb[rev[train_id]] == train_id

    def test_colormap(self):
        cmap = self.ds.colormap
        assert cmap.shape == (256, 3)
        assert tuple(cmap[0]) == (128, 64, 128)    # road
        assert tuple(cmap[13]) == (0, 0, 142)      # car
        assert tuple(cmap[255]) == (0, 0, 0)       # first void label wins
        assert tuple(cmap[19]) == (255, 255, 255)  # unmapped stays white

    def test_name_embedding(self):
        names = self.ds.name_embedding
        assert len(names) == 19
        assert names[0] == "road" and names[13] == "car"

    def test_file_associations(self, tmp_path):
        # Synthetic cityscapes tree
        for city in ["aachen", "bochum"]:
            img = tmp_path / "leftImg8bit" / "train" / city
            lbl = tmp_path / "gtFine" / "train" / city
            img.mkdir(parents=True)
            lbl.mkdir(parents=True)
            stem = f"{city}_000000_000019"
            (img / f"{stem}_leftImg8bit.png").touch()
            (lbl / f"{stem}_gtFine_labelIds.png").touch()
            (lbl / f"{stem}_gtFine_instanceIds.png").touch()
            (lbl / f"{stem}_gtFine_polygons.json").touch()
        (tmp_path / "leftImg8bit" / "val" / "x").mkdir(parents=True)
        (tmp_path / "gtFine" / "val" / "x").mkdir(parents=True)
        (tmp_path / "leftImg8bit" / "test" / "z").mkdir(parents=True)
        (tmp_path / "leftImg8bit" / "test" / "z" /
         "z_000001_000002_leftImg8bit.png").touch()

        assoc = self.ds.file_associations(str(tmp_path))
        assert set(assoc) == {"train", "val", "test"}
        assert len(assoc["train"]) == 2
        entry = assoc["train"]["aachen_000000_000019"]
        assert entry["image"].endswith(
            "aachen_000000_000019_leftImg8bit.png")
        assert entry["label"].endswith(
            "aachen_000000_000019_gtFine_labelIds.png")
        assert os.path.exists(entry["image"])
        assert list(assoc["test"]) == ["z_000001_000002"]


class TestFreiburg:
    ds = datasets.Freiburg()

    def test_num_classes(self):
        assert self.ds.num_classes == 6

    def test_color_embedding(self):
        emb = self.ds.embedding
        assert emb.shape == (256, 256, 256)
        assert emb[170, 170, 170] == 0   # Road
        assert emb[0, 255, 0] == 1       # Grass
        assert emb[102, 102, 51] == 2    # Vegetation
        assert emb[0, 60, 0] == 2        # Tree merges into Vegetation
        assert emb[0, 120, 255] == 3     # Sky
        assert emb[0, 0, 0] == 4         # Obstacle (black is a real class)
        assert emb[1, 2, 3] == 255       # unmapped color

    def test_embed_label_image(self):
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        img[0, 0] = (170, 170, 170)
        img[0, 1] = (0, 255, 0)
        img[1, 0] = (77, 88, 99)
        out = embed_label_image(img, self.ds.embedding)
        assert out.tolist() == [[0, 1], [255, 4]]

    def test_val_split_strided(self, tmp_path):
        for split in ["train", "test"]:
            (tmp_path / split / "GT_color").mkdir(parents=True)
            (tmp_path / split / "rgb").mkdir(parents=True)
        for i in range(40):
            (tmp_path / "train" / "GT_color" / f"b{i:03d}_Clipped.png").touch()
            (tmp_path / "train" / "rgb" / f"b{i:03d}.jpg").touch()
        (tmp_path / "test" / "GT_color" / "t000_Clipped.png").touch()
        (tmp_path / "test" / "rgb" / "t000.jpg").touch()

        assoc = self.ds.file_associations(str(tmp_path))
        # stride = int(1/0.05 + 1) = 21 -> ids 0 and 21 move to val
        assert sorted(assoc["val"]) == ["b000", "b021"]
        assert len(assoc["train"]) == 38
        assert "image" in assoc["train"]["b001"]
        assert "label" in assoc["train"]["b001"]


class TestVistas:
    ds = datasets.Vistas()

    def test_num_classes(self):
        assert self.ds.num_classes == 19

    def test_embedding_spot_values(self):
        emb = self.ds.embedding
        assert emb[128, 64, 128] == 0    # road
        assert emb[220, 20, 60] == 11    # person
        assert emb[0, 0, 142] == 13      # car
        assert emb[165, 42, 42] == 255   # bird -> ignore
        assert emb[0, 0, 0] == 255       # unlabeled

    def test_colormap_forward_priority(self):
        # road (listed after lane marking - general) wins trainId 0
        assert tuple(self.ds.colormap[0]) == (128, 64, 128)

    def test_file_associations(self, tmp_path):
        for split in ["training", "validation", "testing"]:
            (tmp_path / split / "images").mkdir(parents=True)
            (tmp_path / split / "labels").mkdir(parents=True)
        (tmp_path / "training" / "images" / "a.jpg").touch()
        (tmp_path / "training" / "labels" / "a.png").touch()
        (tmp_path / "testing" / "images" / "c.jpg").touch()
        assoc = self.ds.file_associations(str(tmp_path))
        assert set(assoc["train"]) == {"a"}
        assert assoc["train"]["a"]["image"].endswith("a.jpg")
        assert assoc["train"]["a"]["label"].endswith("a.png")
        assert set(assoc["test"]) == {"c"}


class TestGeneric:
    def test_identity_embedding(self):
        ds = datasets.Generic()
        assert np.array_equal(ds.embedding, np.arange(256, dtype=np.uint8))

    def test_pairing(self, tmp_path):
        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        (tmp_path / "images" / "x.png").touch()
        (tmp_path / "labels" / "x.png").touch()
        (tmp_path / "images" / "nolabel.jpg").touch()
        (tmp_path / "images" / "skip.txt").touch()
        assoc = datasets.Generic().file_associations(str(tmp_path))
        ex = assoc["examples"]
        assert set(ex) == {"x", "nolabel"}
        assert "label" in ex["x"] and "label" not in ex["nolabel"]


def test_registry():
    assert isinstance(datasets.get_dataset("cityscapes"),
                      datasets.Cityscapes)
    assert isinstance(datasets.get_dataset("freiburg"), datasets.Freiburg)
    with pytest.raises(NotImplementedError):
        datasets.get_dataset("nope")
