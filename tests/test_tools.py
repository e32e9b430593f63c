"""Tests for the tools/ side rail: metric export and XML rasterizer."""

import json
import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_metrics(path):
    records = [
        {"split": "train", "epoch": 1, "step": 10, "loss": 2.0,
         "mean_iou": 0.1, "wall_time": 1.0},
        {"split": "train", "epoch": 2, "step": 20, "loss": 1.0,
         "mean_iou": 0.2, "wall_time": 2.0},
        {"split": "val", "epoch": 2, "step": 20, "mean_iou": 0.3,
         "class_iou": [0.1, 0.5], "wall_time": 3.0},
    ]
    with open(path, "w") as fp:
        for r in records:
            fp.write(json.dumps(r) + "\n")


def test_gather_summary_data(tmp_path):
    jsonl = tmp_path / "metrics.jsonl"
    _write_metrics(jsonl)
    res = subprocess.run(
        [sys.executable, "tools/gather_summary_data.py", str(tmp_path),
         "-o", str(tmp_path / "csv")],
        cwd=REPO, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    csv_path = tmp_path / "csv" / "train.loss.csv"
    rows = csv_path.read_text().splitlines()
    assert rows[0] == "step,wall_time,value"
    assert rows[1].startswith("10,1.0,2.0")


def test_dump_summaries_filter_and_npz(tmp_path):
    jsonl = tmp_path / "metrics.jsonl"
    _write_metrics(jsonl)
    res = subprocess.run(
        [sys.executable, "tools/dump_summaries.py", str(jsonl),
         "-o", str(tmp_path / "dump"), "-f", "iou"],
        cwd=REPO, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    names = sorted(os.listdir(tmp_path / "dump"))
    assert "train.mean_iou.csv" in names
    assert "val.class_iou.npz" in names
    assert not any("loss" in n for n in names)
    npz = np.load(tmp_path / "dump" / "val.class_iou.npz")
    np.testing.assert_allclose(npz["values"], [[0.1, 0.5]])


def test_event_cat(tmp_path):
    a, b = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    a.write_text(json.dumps({"wall_time": 2, "x": 1}) + "\n")
    b.write_text(json.dumps({"wall_time": 1, "x": 2}) + "\n")
    res = subprocess.run(
        [sys.executable, "tools/event_cat.py", str(a), str(b),
         "-o", str(tmp_path / "out.jsonl")],
        cwd=REPO, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    recs = [json.loads(l) for l in
            (tmp_path / "out.jsonl").read_text().splitlines()]
    assert [r["x"] for r in recs] == [2, 1]  # sorted by wall_time


def test_annotation_xml2img(tmp_path):
    xml = """<annotations>
      <meta><task><labels>
        <label><name>void</name>
          <attributes><attribute>id:0</attribute></attributes></label>
        <label><name>car</name>
          <attributes><attribute>id:13</attribute></attributes></label>
      </labels></task></meta>
      <image name="frame0.png" width="20" height="10">
        <polygon label="car" points="2,2;17,2;17,7;2,7"/>
      </image>
    </annotations>"""
    (tmp_path / "ann.xml").write_text(xml)
    res = subprocess.run(
        [sys.executable, "tools/annotation_xml2img.py",
         "-o", str(tmp_path), str(tmp_path / "ann.xml")],
        cwd=REPO, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    out = np.asarray(Image.open(tmp_path / "frame0_GT.png"))
    assert out.shape == (10, 20)
    assert out[0, 0] == 0          # background = void id
    assert out[4, 10] == 13        # inside the polygon
