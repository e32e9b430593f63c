"""Record IO tests: proto codec round-trip, framing, and byte-level
interoperability with TensorFlow's TFRecord/Example implementation
(TF is used here strictly as a test oracle)."""

import numpy as np
import pytest


from semanticsegmentationactivelearning_tpu.data import (
    SegExample, example, make_example, parse_example, proto, tfrecord)

try:
    import tensorflow as tf
    HAVE_TF = True
except ImportError:  # pragma: no cover
    HAVE_TF = False


FEATURES = {
    "height": [512],
    "width": [1024],
    "id": [b"frankfurt_000000_000294"],
    "label": [b"\x89PNG-fake-label-bytes"],
    "image/data": [bytes(range(256))],
    "image/encoding": [b"png"],
    "image/channels": [3],
    "floats": [1.5, -2.25],
    "negative": [-7, 12345678901234],
}


class TestProtoCodec:
    def test_roundtrip(self):
        blob = proto.encode_example(FEATURES)
        decoded = proto.decode_example(blob)
        assert decoded["height"] == [512]
        assert decoded["id"] == [b"frankfurt_000000_000294"]
        assert decoded["image/data"] == [bytes(range(256))]
        assert decoded["negative"] == [-7, 12345678901234]
        assert decoded["floats"] == pytest.approx([1.5, -2.25])

    def test_empty(self):
        assert proto.decode_example(proto.encode_example({})) == {}

    @pytest.mark.skipif(not HAVE_TF, reason="needs TF oracle")
    def test_tf_parses_our_bytes(self):
        blob = proto.encode_example(FEATURES)
        ex = tf.train.Example.FromString(blob)
        feat = ex.features.feature
        assert feat["height"].int64_list.value[0] == 512
        assert feat["id"].bytes_list.value[0] == b"frankfurt_000000_000294"
        assert feat["negative"].int64_list.value[:] == [-7, 12345678901234]
        np.testing.assert_allclose(feat["floats"].float_list.value[:],
                                   [1.5, -2.25])

    def test_filtered_decode(self):
        """decode_example(keys=...) returns exactly the requested
        features (values identical to a full decode) and skips the
        rest — the loader's whole-dataset header scans rely on it to
        avoid copying encoded-image payloads."""
        blob = proto.encode_example(FEATURES)
        full = proto.decode_example(blob)
        got = proto.decode_example(
            blob, keys=("height", "width", "image/channels", "absent"))
        assert sorted(got) == ["height", "image/channels", "width"]
        for k, v in got.items():
            assert v == full[k]

    def test_wire_edge_cases(self):
        """int64 extremes, empty byte strings, nonfinite floats, and an
        empty value list all survive the round trip."""
        feats = {
            "imin": [-(1 << 63)],
            "imax": [(1 << 63) - 1],
            "zeros": [0, -1, 1],
            "empty_bytes": [b"", b"x", b""],
            "nonfinite": [float("inf"), float("-inf"), 0.0],
            "nan": [float("nan")],
            "nothing": [],
        }
        dec = proto.decode_example(proto.encode_example(feats))
        assert dec["imin"] == [-(1 << 63)]
        assert dec["imax"] == [(1 << 63) - 1]
        assert dec["zeros"] == [0, -1, 1]
        assert dec["empty_bytes"] == [b"", b"x", b""]
        assert dec["nonfinite"] == [float("inf"), float("-inf"), 0.0]
        assert np.isnan(dec["nan"]).all()
        assert dec["nothing"] == []

    @pytest.mark.skipif(not HAVE_TF, reason="needs TF oracle")
    def test_fuzz_roundtrip_vs_tf(self):
        """Randomized feature dicts: our bytes must self-round-trip,
        parse identically under tf.train.Example, and TF's own
        serialization of the same message must parse back identically
        under our decoder (both directions of byte interop, beyond the
        fixed vectors above)."""
        rng = np.random.default_rng(42)
        for trial in range(40):
            feats = {}
            for k in range(int(rng.integers(1, 8))):
                name = f"t{trial}/k{k}"
                kind = int(rng.integers(0, 3))
                n = int(rng.integers(1, 6))
                if kind == 0:
                    feats[name] = [rng.bytes(int(rng.integers(0, 3000)))
                                   for _ in range(n)]
                elif kind == 1:
                    feats[name] = [int(v) for v in rng.integers(
                        -(1 << 62), 1 << 62, size=n)]
                else:
                    # fp32-representable so equality is exact end to end
                    feats[name] = [float(np.float32(v)) for v in
                                   rng.normal(scale=1e12, size=n)]
            blob = proto.encode_example(feats)
            assert proto.decode_example(blob) == feats

            ex = tf.train.Example.FromString(blob)
            for name, want in feats.items():
                f = ex.features.feature[name]
                got = (list(f.bytes_list.value) or
                       [int(v) for v in f.int64_list.value] or
                       [float(v) for v in f.float_list.value])
                assert got == want, name

            assert proto.decode_example(ex.SerializeToString()) == feats

    @pytest.mark.skipif(not HAVE_TF, reason="needs TF oracle")
    def test_we_parse_tf_bytes(self):
        ex = tf.train.Example(features=tf.train.Features(feature={
            "height": tf.train.Feature(
                int64_list=tf.train.Int64List(value=[432])),
            "id": tf.train.Feature(
                bytes_list=tf.train.BytesList(value=[b"b42"])),
            "f": tf.train.Feature(
                float_list=tf.train.FloatList(value=[0.5])),
        }))
        decoded = proto.decode_example(ex.SerializeToString())
        assert decoded["height"] == [432]
        assert decoded["id"] == [b"b42"]
        assert decoded["f"] == pytest.approx([0.5])


class TestFraming:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.tfrecord")
        payload = b"hello tfrecord" * 100
        tfrecord.write_record_file(path, payload)
        assert tfrecord.read_record(path, verify_crc=True) == payload

    def test_crc_detects_corruption(self, tmp_path):
        path = str(tmp_path / "x.tfrecord")
        tfrecord.write_record_file(path, b"payload")
        raw = bytearray(open(path, "rb").read())
        raw[13] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(raw)
        # default reader skips CRC like the reference
        assert tfrecord.read_record(path) != b"payload"
        with pytest.raises(ValueError, match="CRC"):
            tfrecord.read_record(path, verify_crc=True)

    def test_multi_record_stream(self, tmp_path):
        path = str(tmp_path / "m.tfrecord")
        with open(path, "wb") as fp:
            for i in range(5):
                tfrecord.write_record(fp, b"rec%d" % i)
        assert list(tfrecord.read_records(path, verify_crc=True)) == \
            [b"rec%d" % i for i in range(5)]

    def test_masked_crc_known_value(self):
        # crc32c("123456789") == 0xE3069283 (Castagnoli test vector)
        data = b"123456789"
        crc = 0xE3069283
        expected = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert tfrecord.masked_crc32c(data) == expected

    @pytest.mark.skipif(not HAVE_TF, reason="needs TF oracle")
    def test_tf_reads_our_records(self, tmp_path):
        path = str(tmp_path / "x.tfrecord")
        payload = proto.encode_example({"height": [7]})
        tfrecord.write_record_file(path, payload)
        # TFRecordDataset validates CRCs; a bad CRC raises DataLossError.
        got = list(tf.data.TFRecordDataset([path]))
        assert len(got) == 1
        assert bytes(got[0].numpy()) == payload

    @pytest.mark.skipif(not HAVE_TF, reason="needs TF oracle")
    def test_we_read_tf_records(self, tmp_path):
        path = str(tmp_path / "tf.tfrecord")
        with tf.io.TFRecordWriter(path) as w:
            w.write(b"from-tf")
        assert tfrecord.read_record(path, verify_crc=True) == b"from-tf"


class TestSegExample:
    def test_roundtrip(self, tmp_path):
        ex = SegExample(
            file_id="aachen_000000_000019", height=512, width=1024,
            label=b"label-png-bytes",
            modalities={"image": (b"image-png-bytes", "png", 3),
                        "nir": (b"nir-bytes", "png", 1)})
        blob = make_example(ex)
        back = parse_example(blob)
        assert back.file_id == ex.file_id
        assert (back.height, back.width) == (512, 1024)
        assert back.label == b"label-png-bytes"
        assert back.modalities["image"] == (b"image-png-bytes", "png", 3)
        assert back.modalities["nir"] == (b"nir-bytes", "png", 1)
        assert back.image == b"image-png-bytes"

        path = str(tmp_path / "a.tfrecord")
        tfrecord.write_record_file(path, blob)
        assert example.peek_dims(path) == (512, 1024, 3)

    def test_unlabelled_example(self):
        ex = SegExample(file_id="x", height=4, width=6,
                        modalities={"image": (b"i", "png", 3)})
        back = parse_example(make_example(ex))
        assert back.label is None
