"""Native IO library tests: CRC32C vectors, decode parity with the
pure-Python loader path, and error handling."""

import numpy as np
import pytest

from semanticsegmentationactivelearning_tpu.data import (
    SegExample, etl, loader, make_example, native, tfrecord)

# Native-dependent tests skip individually so the pure-Python fallback
# paths (fuzz corpus, PIL async writer) still run where csrc/ isn't
# built — exactly the systems where the fallbacks are the live code.
needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native IO library not built")


@needs_native
class TestCRC:
    def test_crc32c_vector(self):
        # Castagnoli test vector
        assert native.crc32c(b"123456789") == 0xE3069283

    def test_masked_matches_python(self):
        data = b"some tfrecord payload" * 7
        assert native.masked_crc32c(data) == tfrecord.masked_crc32c(data)


@pytest.fixture
def record_files(tmp_path):
    rng = np.random.default_rng(5)
    paths = []
    for i in range(6):
        img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        lbl = rng.integers(0, 6, (20, 30), dtype=np.uint8)
        ex = SegExample(
            file_id=f"n{i}", height=20, width=30,
            label=etl.encode_png(lbl) if i != 5 else None,
            modalities={"image": (
                etl.encode_png(img) if i % 2 == 0 else
                etl.encode_image(img, "jpg"), "png", 3)})
        p = str(tmp_path / f"n{i}.tfrecord")
        tfrecord.write_record_file(p, make_example(ex))
        paths.append(p)
    return paths


@needs_native
class TestNativeBatch:
    def test_parity_with_python_loader(self, record_files):
        stack, h, w, hl = native.load_batch(record_files, (24, 32))
        assert stack.shape == (6, 24, 32, 4)
        for j, p in enumerate(record_files):
            ps, ph, pw, phl = loader.load_stack(p, (24, 32))
            np.testing.assert_array_equal(stack[j], ps)
            assert (h[j], w[j]) == (ph, pw)
            assert hl[j] == phl
        assert not hl[5]  # unlabelled record

    def test_loader_uses_native(self, record_files):
        ld = loader.RecordLoader(record_files, batch_size=4)
        assert ld._native is not None
        ld_py = loader.RecordLoader(record_files, batch_size=4,
                                    use_native=False)
        got_n = [b["stack"] for b in ld.batches()]
        got_p = [b["stack"] for b in ld_py.batches()]
        for a, b in zip(got_n, got_p):
            np.testing.assert_array_equal(a, b)

    def test_error_names_file(self, tmp_path):
        bad = tmp_path / "bad.tfrecord"
        bad.write_bytes(b"xx")
        with pytest.raises(ValueError, match="bad.tfrecord"):
            native.load_batch([str(bad)], (4, 4))


class TestFuzzCorruption:
    """The native reader parses untrusted framing/proto/image bytes in
    worker threads where an uncaught length would OOB-read or
    std::terminate; every mutation of a valid record must surface as a
    clean ValueError (or succeed), never crash the process."""

    @needs_native
    def test_truncations(self, record_files, tmp_path):
        data = open(record_files[0], "rb").read()
        for cut in [0, 1, 7, 11, 12, 13, len(data) // 2, len(data) - 1]:
            p = tmp_path / f"trunc{cut}.tfrecord"
            p.write_bytes(data[:cut])
            try:
                native.load_batch([str(p)], (24, 32))
            except ValueError:
                pass

    @needs_native
    def test_bit_flips(self, record_files, tmp_path):
        rng = np.random.default_rng(13)
        data = bytearray(open(record_files[0], "rb").read())
        for trial in range(200):
            mut = bytearray(data)
            for _ in range(rng.integers(1, 8)):
                pos = int(rng.integers(0, len(mut)))
                mut[pos] ^= int(rng.integers(1, 256))
            p = tmp_path / "fuzz.tfrecord"
            p.write_bytes(bytes(mut))
            try:
                native.load_batch([str(p)], (24, 32))
            except ValueError:
                pass

    @needs_native
    def test_length_field_attacks(self, record_files, tmp_path):
        # huge/negative framing lengths must not allocate or read OOB
        data = bytearray(open(record_files[0], "rb").read())
        for length in [2 ** 62, 2 ** 31, len(data) * 10, 0]:
            mut = bytearray(data)
            mut[0:8] = int(length).to_bytes(8, "little")
            p = tmp_path / "len.tfrecord"
            p.write_bytes(bytes(mut))
            with pytest.raises(ValueError):
                native.load_batch([str(p)], (24, 32))

    def test_python_reader_same_corpus(self, record_files, tmp_path):
        # the pure-Python fallback must be equally crash-free
        rng = np.random.default_rng(14)
        data = bytearray(open(record_files[1], "rb").read())
        for trial in range(60):
            mut = bytearray(data)
            for _ in range(rng.integers(1, 6)):
                pos = int(rng.integers(0, len(mut)))
                mut[pos] ^= int(rng.integers(1, 256))
            p = tmp_path / "pyfuzz.tfrecord"
            p.write_bytes(bytes(mut))
            try:
                loader.load_stack(str(p), (24, 32))
            except (ValueError, KeyError, OSError):
                pass


class TestPngEncode:
    """Native + async PNG writer (the inference CLI's output path)."""

    @needs_native
    @pytest.mark.parametrize("shape", [(3, 10, 14), (3, 10, 14, 3)])
    def test_native_roundtrip(self, tmp_path, shape):
        rng = np.random.default_rng(9)
        stack = rng.integers(0, 255, shape, dtype=np.uint8)
        paths = [str(tmp_path / "e0.png"), None,
                 str(tmp_path / "e2.png")]
        native.write_png_batch(paths, stack)
        for i, p in enumerate(paths):
            if p is None:
                continue
            np.testing.assert_array_equal(
                etl.decode_image(open(p, "rb").read()), stack[i])
        assert not (tmp_path / "e1.png").exists()

    @needs_native
    def test_native_error_names_file(self, tmp_path):
        stack = np.zeros((1, 4, 4), dtype=np.uint8)
        with pytest.raises(ValueError, match="nodir"):
            native.write_png_batch(
                [str(tmp_path / "nodir" / "x.png")], stack)

    @pytest.mark.parametrize("use_native", [
        pytest.param(True, marks=needs_native), False])
    def test_async_writer(self, tmp_path, use_native):
        from semanticsegmentationactivelearning_tpu.data import (
            png_writer)
        rng = np.random.default_rng(11)
        stacks = [rng.integers(0, 255, (2, 8, 9, 3), dtype=np.uint8)
                  for _ in range(4)]
        with png_writer.AsyncPngWriter(use_native=use_native) as w:
            for k, stack in enumerate(stacks):
                w.submit([str(tmp_path / f"b{k}_0.png"),
                          None if k == 2 else
                          str(tmp_path / f"b{k}_1.png")], stack)
        assert w.written == 7
        for k, stack in enumerate(stacks):
            np.testing.assert_array_equal(
                etl.decode_image(
                    open(tmp_path / f"b{k}_0.png", "rb").read()),
                stack[0])
        assert not (tmp_path / "b2_1.png").exists()

    def test_async_writer_error_surfaces(self, tmp_path):
        from semanticsegmentationactivelearning_tpu.data import (
            png_writer)
        stack = np.zeros((1, 4, 4), dtype=np.uint8)
        w = png_writer.AsyncPngWriter()
        exc = ValueError if native.encode_available() else OSError
        w.submit([str(tmp_path / "nodir" / "y.png")], stack)
        with pytest.raises(exc, match="nodir"):
            w.close()
