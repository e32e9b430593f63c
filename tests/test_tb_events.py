"""TensorBoard event-file codec tests against the TensorFlow oracle.

The reference's native observability format is TB event files
(reference: train.py:154-206 summaries; tools/dump_summaries.py:16-34
raw event walk). ``utils/tb_events.py`` writes/reads that format with
the repo's own codec; these tests prove byte-level interop in both
directions: TF reads our files (its reader validates the masked CRCs),
and we read TF-written files (both TF1 simple_value and TF2 tensor
scalars).
"""

import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from PIL import Image

from semanticsegmentationactivelearning_tpu.utils import cli, tb_events

tf = pytest.importorskip("tensorflow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _png_bytes(h=4, w=6):
    rgb = (np.arange(h * w * 3).reshape(h, w, 3) % 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue(), rgb


def _tf_events(path):
    return list(tf.compat.v1.train.summary_iterator(path))


class TestWriterReadByTF:
    def test_scalars_histogram_image(self, tmp_path):
        png, rgb = _png_bytes()
        with tb_events.EventWriter(str(tmp_path)) as w:
            w.scalars({"train/loss": 1.5, "train/mean_iou": 0.25},
                      step=10, wall_time=100.0)
            w.histogram("al_confidence/histogram",
                        counts=[1.0, 3.0, 2.0],
                        bin_edges=[0.0, 0.25, 0.5, 1.0], step=2,
                        wall_time=101.0)
            w.image("val/prediction", png, 4, 6, step=3,
                    wall_time=102.0)
            path = w.path

        events = _tf_events(path)  # TF validates record CRCs here
        assert events[0].file_version == "brain.Event:2"

        scal = events[1]
        assert scal.step == 10 and scal.wall_time == 100.0
        got = {v.tag: v.simple_value for v in scal.summary.value}
        assert got == pytest.approx(
            {"train/loss": 1.5, "train/mean_iou": 0.25})

        histo = events[2].summary.value[0]
        assert histo.tag == "al_confidence/histogram"
        assert list(histo.histo.bucket) == [1.0, 3.0, 2.0]
        assert list(histo.histo.bucket_limit) == [0.25, 0.5, 1.0]
        assert histo.histo.min == 0.0 and histo.histo.max == 1.0
        assert histo.histo.num == 6.0

        img = events[3].summary.value[0].image
        assert (img.height, img.width, img.colorspace) == (4, 6, 3)
        decoded = np.asarray(
            Image.open(io.BytesIO(img.encoded_image_string)))
        np.testing.assert_array_equal(decoded, rgb)

    def test_own_reader_round_trip(self, tmp_path):
        with tb_events.EventWriter(str(tmp_path)) as w:
            w.scalar("a/b", 2.5, step=4, wall_time=9.0)
            path = w.path
        events = list(tb_events.iter_events(path, verify_crc=True))
        assert events[0]["file_version"] == "brain.Event:2"
        assert events[1]["step"] == 4
        assert events[1]["wall_time"] == 9.0
        assert events[1]["values"] == [
            {"tag": "a/b", "simple_value": 2.5}]

    def test_text_summary_read_by_tf(self, tmp_path):
        # the reference's ConfusionMatrix text summary: a [C,C] string
        # tensor routed to the text plugin (tensortools/metrics.py:147)
        with tb_events.EventWriter(str(tmp_path)) as w:
            w.text("val/ConfusionMatrix", ["1", "2", "3", "4"],
                   step=5, shape=(2, 2), wall_time=50.0)
            path = w.path
        events = _tf_events(path)  # TF validates record CRCs
        v = events[1].summary.value[0]
        assert v.tag == "val/ConfusionMatrix"
        assert v.metadata.plugin_data.plugin_name == "text"
        arr = tf.make_ndarray(v.tensor)
        assert arr.shape == (2, 2)
        assert [[c.decode() for c in row] for row in arr] == \
            [["1", "2"], ["3", "4"]]

    def test_text_summary_own_reader_round_trip(self, tmp_path):
        with tb_events.EventWriter(str(tmp_path)) as w:
            w.text("t", ["a", "b"], step=1, shape=(2,), wall_time=1.0)
            path = w.path
        ev = list(tb_events.iter_events(path, verify_crc=True))[1]
        assert ev["values"][0]["tensor_strings"] == ["a", "b"]
        assert ev["values"][0]["tensor_shape"] == [2]

    def test_reader_reads_tf_text_summary(self, tmp_path):
        # interop the other way: TF2's own text summary decodes
        writer = tf.summary.create_file_writer(str(tmp_path))
        with writer.as_default():
            tf.summary.text("notes", tf.constant([["x", "y"]]), step=3)
        writer.flush()
        found = None
        for path in tb_events.find_event_files(str(tmp_path)):
            for ev in tb_events.iter_events(path):
                for v in ev["values"]:
                    if v.get("tag", "").startswith("notes"):
                        found = v
        assert found is not None
        assert found["tensor_strings"] == ["x", "y"]

    def test_wall_time_zero_preserved(self, tmp_path):
        # epoch-zero wall times are valid, not "missing"
        with tb_events.EventWriter(str(tmp_path)) as w:
            w.scalar("a", 1.0, step=0, wall_time=0.0)
            w.histogram("h", [1.0], [0.0, 1.0], step=0, wall_time=0.0)
            path = w.path
        events = list(tb_events.iter_events(path))
        assert events[1]["wall_time"] == 0.0
        assert events[2]["wall_time"] == 0.0

    def test_same_second_writers_get_distinct_files(self, tmp_path):
        # pid+sequence uniquify files created within one second
        w1 = tb_events.EventWriter(str(tmp_path))
        w2 = tb_events.EventWriter(str(tmp_path))
        assert w1.path != w2.path
        w1.close(), w2.close()
        assert len(os.listdir(tmp_path)) == 2


class TestReaderReadsTFWritten:
    def test_tf2_tensor_scalars(self, tmp_path):
        writer = tf.summary.create_file_writer(str(tmp_path))
        with writer.as_default():
            tf.summary.scalar("accuracy", 0.75, step=7)
            tf.summary.scalar("loss", 1.25, step=8)
        writer.flush()
        files = tb_events.find_event_files(str(tmp_path))
        assert files
        got = {}
        for path in files:
            for ev in tb_events.iter_events(path):
                for v in ev["values"]:
                    if "simple_value" in v:
                        got[v["tag"]] = (ev["step"], v["simple_value"])
        assert got["accuracy"] == (7, pytest.approx(0.75))
        assert got["loss"] == (8, pytest.approx(1.25))

    def test_tf1_simple_value_events(self, tmp_path):
        # v1-style Events written through TF's own proto + record writer
        path = os.path.join(str(tmp_path), "events.out.tfevents.ref")
        with tf.io.TFRecordWriter(path) as w:
            ev = tf.compat.v1.Event(wall_time=5.0, step=11)
            ev.summary.value.add(tag="train/MeanIoU", simple_value=0.5)
            w.write(ev.SerializeToString())
        events = list(tb_events.iter_events(path, verify_crc=True))
        assert events[0]["step"] == 11
        assert events[0]["values"] == [
            {"tag": "train/MeanIoU", "simple_value": 0.5}]


class TestJsonlBridge:
    def _write_jsonl(self, path):
        records = [
            {"split": "train", "step": 1, "loss": 2.0, "wall_time": 1.0},
            {"split": "val", "epoch": 2, "mean_iou": 0.5,
             "class_iou": [0.25, 0.75], "wall_time": 2.0},
            {"split": "al_confidence", "round": 3,
             "histogram": [4, 2], "bin_edges": [0.0, 0.5, 1.0],
             "mean": 0.3, "wall_time": 3.0},
        ]
        with open(path, "w") as fp:
            for r in records:
                fp.write(json.dumps(r) + "\n")

    def test_converter_read_by_tf(self, tmp_path):
        jsonl = tmp_path / "metrics.jsonl"
        self._write_jsonl(jsonl)
        path = tb_events.jsonl_to_events(str(jsonl), str(tmp_path))
        got_scalars = {}
        got_histo = None
        steps = {}
        for ev in _tf_events(path)[1:]:
            for v in ev.summary.value:
                if v.HasField("histo"):
                    got_histo = v
                else:
                    got_scalars[v.tag] = v.simple_value
                    steps[v.tag] = ev.step
        assert got_scalars == pytest.approx(
            {"train/loss": 2.0, "val/mean_iou": 0.5,
             "val/class_iou/0": 0.25, "val/class_iou/1": 0.75,
             "al_confidence/mean": 0.3})
        assert steps["train/loss"] == 1
        assert steps["val/mean_iou"] == 2
        assert got_histo.tag == "al_confidence/histogram"
        assert list(got_histo.histo.bucket) == [4.0, 2.0]

    def test_confusion_becomes_text_summary(self, tmp_path):
        # per-epoch confusion counts in metrics.jsonl mirror to the
        # reference's ConfusionMatrix text summary (a [C,C] string
        # tensor, tf.as_string(confusion_mat) —
        # reference tensortools/metrics.py:147-148, train.py:178-206)
        jsonl = tmp_path / "metrics.jsonl"
        with open(jsonl, "w") as fp:
            fp.write(json.dumps({
                "split": "val", "epoch": 2, "step": 7, "mean_iou": 0.5,
                "confusion": [[5, 1], [0, 4]], "wall_time": 2.0}) + "\n")
        path = tb_events.jsonl_to_events(str(jsonl), str(tmp_path))
        text = None
        for ev in _tf_events(path)[1:]:
            for v in ev.summary.value:
                if v.tag == "val/ConfusionMatrix":
                    text = v
                    assert ev.step == 7
        assert text is not None
        assert text.metadata.plugin_data.plugin_name == "text"
        arr = tf.make_ndarray(text.tensor)
        assert [[c.decode() for c in row] for row in arr] == \
            [["5", "1"], ["0", "4"]]

    def test_export_tool(self, tmp_path):
        jsonl = tmp_path / "metrics.jsonl"
        self._write_jsonl(jsonl)
        res = subprocess.run(
            [sys.executable, "tools/export_tb_events.py",
             str(tmp_path)],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        out = res.stdout.strip()
        assert "tfevents" in os.path.basename(out)
        assert len(_tf_events(out)) == 4  # version + 3 records

    def test_image_dump_mirrored(self, tmp_path):
        from semanticsegmentationactivelearning_tpu.utils import images
        w = cli.MetricsWriter(str(tmp_path), tensorboard=True)
        rgb = np.random.default_rng(0).random((1, 4, 6, 3))
        lbl = np.zeros((1, 4, 6), np.uint8)
        cmap = np.zeros((256, 3), np.uint8)
        cmap[0] = (10, 20, 30)
        paths = images.dump_summaries(str(tmp_path), "val", 3, rgb,
                                      lbl, preds=lbl, colormap=cmap,
                                      count=1, event_writer=w.tb)
        assert len(paths) == 3
        evfile = [f for f in os.listdir(tmp_path) if "tfevents" in f][0]
        tags = {}
        for ev in _tf_events(os.path.join(str(tmp_path), evfile))[1:]:
            for v in ev.summary.value:
                assert ev.step == 3
                tags[v.tag] = v.image
        assert set(tags) == {"val/0/input", "val/0/label", "val/0/pred"}
        lab = np.asarray(Image.open(io.BytesIO(
            tags["val/0/label"].encoded_image_string)))
        np.testing.assert_array_equal(lab[0, 0], (10, 20, 30))

    def test_metrics_writer_tensorboard_flag(self, tmp_path):
        w = cli.MetricsWriter(str(tmp_path), tensorboard=True)
        w.write({"split": "train", "step": 5, "loss": np.float32(1.5)})
        files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
        assert len(files) == 1
        events = list(tb_events.iter_events(
            os.path.join(str(tmp_path), files[0])))
        assert events[1]["values"] == [
            {"tag": "train/loss", "simple_value": 1.5}]
        assert events[1]["step"] == 5


class TestToolsOnEvents:
    def _make_events(self, out_dir, offset=0.0, time0=10.0):
        with tb_events.EventWriter(str(out_dir),
                                   filename_suffix=".t%d" % time0) as w:
            w.scalar("train/loss", 2.0 + offset, step=1,
                     wall_time=time0)
            w.histogram("al/conf", [1.0, 2.0], [0.0, 0.5, 1.0],
                        step=1, wall_time=time0 + 1)
            return w.path

    def test_dump_summaries_on_events(self, tmp_path):
        path = self._make_events(tmp_path)
        res = subprocess.run(
            [sys.executable, "tools/dump_summaries.py", path,
             "-o", str(tmp_path / "dump")],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        rows = (tmp_path / "dump" / "train.loss.csv").read_text()
        assert rows.splitlines()[1] == "1,2.0"
        npz = np.load(tmp_path / "dump" / "al.conf.npz",
                      allow_pickle=True)
        np.testing.assert_array_equal(npz["values"], [[1.0, 2.0]])

    def test_gather_on_event_dir(self, tmp_path):
        self._make_events(tmp_path)
        res = subprocess.run(
            [sys.executable, "tools/gather_summary_data.py",
             str(tmp_path), "-o", str(tmp_path / "csv")],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        rows = (tmp_path / "csv" / "train.loss.csv").read_text()
        assert rows.splitlines()[1] == "1,10.0,2.0"

    def test_gather_tags_filter_matches_metric_name(self, tmp_path):
        # list-derived series export as <split>/<metric>/<i>; --tags
        # filters on the metric name, catching the per-index children
        jsonl = tmp_path / "metrics.jsonl"
        jsonl.write_text(json.dumps(
            {"split": "val", "step": 1, "mean_iou": 0.5,
             "class_iou": [0.25, 0.75], "wall_time": 1.0}) + "\n")
        evdir = tmp_path / "ev"
        tb_events.jsonl_to_events(str(jsonl), str(evdir))
        res = subprocess.run(
            [sys.executable, "tools/gather_summary_data.py",
             str(evdir), "-o", str(tmp_path / "csv"),
             "-t", "class_iou"],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        names = sorted(os.listdir(tmp_path / "csv"))
        assert names == ["val.class_iou.0.csv", "val.class_iou.1.csv"]

    def test_empty_logdir_clear_error(self, tmp_path):
        empty = tmp_path / "empty-run"
        empty.mkdir()
        for tool in ("dump_summaries.py", "gather_summary_data.py"):
            res = subprocess.run(
                [sys.executable, "tools/" + tool, str(empty)],
                cwd=REPO, capture_output=True, text=True)
            assert res.returncode != 0
            assert "neither metrics.jsonl nor tfevents" in res.stderr

    def test_event_cat_rejects_mixed_inputs(self, tmp_path):
        ev = self._make_events(tmp_path)
        jsonl = tmp_path / "metrics.jsonl"
        jsonl.write_text('{"step": 1, "loss": 1.0}\n')
        res = subprocess.run(
            [sys.executable, "tools/event_cat.py", str(jsonl), ev,
             "-o", str(tmp_path / "out")],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode != 0
        assert "mixed input formats" in res.stderr

    def test_event_cat_sniffs_content_not_name(self, tmp_path):
        # its own previous output, renamed arbitrarily, re-cats fine
        a = self._make_events(tmp_path / "a", time0=10.0)
        renamed = str(tmp_path / "merged.events")
        res = subprocess.run(
            [sys.executable, "tools/event_cat.py", a, "-o", renamed],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        res = subprocess.run(
            [sys.executable, "tools/event_cat.py", renamed,
             "-o", str(tmp_path / "again")],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        events = list(tb_events.iter_events(str(tmp_path / "again")))
        assert len(events) == 3  # version + 2 records

    def test_event_cat(self, tmp_path):
        a = self._make_events(tmp_path / "a", offset=0.0, time0=10.0)
        b = self._make_events(tmp_path / "b", offset=1.0, time0=5.0)
        out = str(tmp_path / "events.out.tfevents.merged")
        res = subprocess.run(
            [sys.executable, "tools/event_cat.py", a, b, "-o", out],
            cwd=REPO, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        events = list(tb_events.iter_events(out, verify_crc=True))
        assert events[0]["file_version"] == "brain.Event:2"
        times = [e["wall_time"] for e in events[1:]]
        assert times == sorted(times)  # merged in time order
        # b's records (earlier wall time) come first after the merge
        assert events[1]["values"][0]["simple_value"] == 3.0
        # TF can read the merged file too
        assert len(_tf_events(out)) == 5
