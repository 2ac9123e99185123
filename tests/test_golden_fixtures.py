"""Golden fixtures for the import-gated kernels (r2 task #5).

Committed bytes in ``tests/fixtures/`` pin the REAL encoder outputs:

- ``golden_8x12.png`` / ``.ppm`` / ``golden_8x8.pgm`` — produced by the
  repo's own pure-numpy encoders from the committed ``.npy`` arrays. The
  PNG uses filter-0 rows, so the test DECODES it with ~15 lines of
  zlib+numpy and verifies bit-exact pixels without any image library —
  the fixture is verified in this container, not just committed.
- Where Pillow exists (``importorskip``), the gated branches run for
  real: PIL decode of the golden PNG, and a JPEG/TIFF encode→decode
  round-trip through ``encode_image``'s gated path (JPEG bytes are
  generated in-test rather than committed because this container cannot
  validate them; the PIL round-trip is the stronger check where it runs).
- Where sentencepiece exists, a 64-vocab model is TRAINED from the
  committed ``sp_corpus.txt`` and ``SentencePieceTokenizer`` round-trips
  text with special-token splicing (reference pattern:
  webdataset/tests/test_fluid.py:432-458).

decord/ffmpeg remain ungated-untestable: they need real media files this
repo cannot author without those same libraries; their budget/merge math
is covered by q_uniform_frame_indices / q_keyframe_budget oracles.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _px(name: str) -> np.ndarray:
    return np.load(os.path.join(FIXTURES, name))


def _bytes(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def test_golden_png_decodes_bit_exact_pure_python():
    """Full PNG decode (filter-0 rows) with zlib+numpy only — proves the
    committed fixture is a real, decodable PNG with the exact pixels."""
    data = _bytes("golden_8x12.png")
    want = _px("golden_8x12_rgb.npy")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        assert crc == zlib.crc32(ctype + body) & 0xFFFFFFFF
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        pos += 12 + length
    w, h, depth, color = meta[0], meta[1], meta[2], meta[3]
    assert (depth, color) == (8, 2)  # 8-bit truecolor
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    rows = []
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        assert row[0] == 0  # filter type None — decodable without prior row
        rows.append(np.frombuffer(row[1:], np.uint8).reshape(w, 3))
    got = np.stack(rows)
    assert np.array_equal(got, want)


def test_golden_netpbm_roundtrip():
    """The committed ppm/pgm bytes decode through the repo's own real
    netpbm reader to the exact committed arrays, and re-encode to the
    exact committed bytes (encoder is deterministic)."""
    from video_data_pipeline_spark.functions.images import encode_image, load_pixels

    rgb, gray = _px("golden_8x12_rgb.npy"), _px("golden_8x8_gray.npy")
    assert np.array_equal(load_pixels(_bytes("golden_8x12.ppm"), "rgb"), rgb)
    assert np.array_equal(load_pixels(_bytes("golden_8x8.pgm"), "l"), gray)
    assert encode_image(rgb, "PPM") == _bytes("golden_8x12.ppm")
    assert encode_image(gray, "PGM") == _bytes("golden_8x8.pgm")
    assert encode_image(rgb, "PNG") == _bytes("golden_8x12.png")


def test_golden_png_via_pil():
    """Gated branch: PIL decode of the committed PNG equals the committed
    array (PNG is lossless, so equality is exact)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.open(io.BytesIO(_bytes("golden_8x12.png")))
    assert np.array_equal(np.asarray(img.convert("RGB")), _px("golden_8x12_rgb.npy"))


def test_jpeg_tiff_encode_decode_via_pil():
    """Gated branch: encode_image's JPEG/TIFF path (Pillow, quality=100)
    followed by load_pixels' PIL decode. TIFF is lossless (exact); JPEG
    at quality=100 is near-lossless (tolerance 3/255)."""
    pytest.importorskip("PIL.Image")
    from video_data_pipeline_spark.functions.images import encode_image, load_pixels

    rgb = _px("golden_8x12_rgb.npy")
    tiff = encode_image(rgb, "TIFF")
    assert np.array_equal(load_pixels(tiff, "rgb"), rgb)
    jpg = encode_image(rgb, "JPEG")
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    got = load_pixels(jpg, "rgb").astype(np.int16)
    assert got.shape == rgb.shape
    assert np.abs(got - rgb.astype(np.int16)).max() <= 3


def test_sentencepiece_tokenizer_roundtrip(tmp_path):
    """Gated branch: train a tiny real SP model from the committed corpus,
    then round-trip text WITH special-token splicing through
    SentencePieceTokenizer (the class raises NotImplementedError without
    the lib; everywhere else the hash tokenizer covers the splice logic)."""
    spm = pytest.importorskip("sentencepiece")
    from video_data_pipeline_spark.functions.text import SentencePieceTokenizer

    model_prefix = str(tmp_path / "sp_test")
    spm.SentencePieceTrainer.train(
        input=os.path.join(FIXTURES, "sp_corpus.txt"),
        model_prefix=model_prefix,
        vocab_size=64,
        model_type="bpe",
    )
    specials = {"<image>": 10_000, "<video>": 10_001}
    tok = SentencePieceTokenizer(model_prefix + ".model", specials)
    text = "pack the video <image> shards <video> into tar files"
    ids = tok.tokenize(text)
    assert 10_000 in ids and 10_001 in ids
    assert all(isinstance(i, int) for i in ids)
    out = tok.detokenize(ids)
    assert "<image>" in out and "<video>" in out
    assert "shards" in out and "tar" in out
