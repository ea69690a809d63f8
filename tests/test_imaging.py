"""Real image path: numpy BMP codec + Spark ``format("image")`` ingest.

The reference reads real images through Spark's image source and computes
pixel stats over ``image.data`` (``spark/jobs/radiography_analysis.py:71-89,
127-131``). These tests prove the engine's path on REAL pixel data with no
imaging library: encode deterministic arrays as 24-bit BMPs, decode them
back (both in-process and through the JVM's ImageIO via ``format("image")``),
and check the D1 stats against numpy goldens.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata import imaging, multimodal
from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import read_images
from pyspark_bigdata_sars_cov_2_analysis_spark.pipelines.radiography import (
    pixel_stats,
)


def _arrays(n: int = 6, h: int = 7, w: int = 5) -> list[np.ndarray]:
    """Deterministic test images; w=5 forces 4-byte row padding (15 % 4 != 0)."""
    rng = np.random.default_rng(2020)
    gray = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n // 2)]
    color = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n - n // 2)
    ]
    return gray + color


def test_bmp_roundtrip_exact():
    for arr in _arrays():
        decoded = imaging.decode_bmp(imaging.encode_bmp(arr))
        expected = (
            np.repeat(arr[:, :, None], 3, axis=2) if arr.ndim == 2 else arr
        )
        np.testing.assert_array_equal(decoded, expected)


def test_bmp_decode_top_down_and_32bit():
    """Decoder must handle the two layout variants this encoder never
    emits: negative-height (top-down) rows and 32-bit pixels."""
    import struct

    arr = _arrays(2, h=3, w=2)[1]
    data = bytearray(imaging.encode_bmp(arr))
    # flip to top-down: negate height and un-reverse the stored rows
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    offset = len(data) - h * stride
    struct.pack_into("<i", data, 14 + 8, -h)
    rows = [bytes(data[offset + i * stride : offset + (i + 1) * stride]) for i in range(h)]
    data[offset:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(imaging.decode_bmp(bytes(data)), arr)

    # 32-bit BGRX variant, built by hand
    bgrx = np.concatenate([arr, np.zeros((h, w, 1), np.uint8)], axis=2)
    header = struct.pack("<2sIHHI", b"BM", 54 + bgrx.size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, bgrx.size, 0, 0, 0, 0)
    px32 = bgrx[::-1].tobytes()  # w*4 is already 4-byte aligned
    np.testing.assert_array_equal(imaging.decode_bmp(header + info + px32), arr)


def test_bmp_decode_rejects_non_bmp():
    with pytest.raises(ValueError):
        imaging.decode_bmp(b"\x89PNG\r\n\x1a\nnotabmp")


def test_decode_image_real_stats(spark):
    """decode_image runs REAL decode through mapInPandas; stats must match
    numpy computed on the source arrays."""
    arrs = _arrays()
    rows = [(i, bytearray(imaging.encode_bmp(a))) for i, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in multimodal.decode_image(df).collect()}
    assert len(got) == len(arrs)
    for i, a in enumerate(arrs):
        full = np.repeat(a[:, :, None], 3, axis=2) if a.ndim == 2 else a
        r = got[i]
        assert (r["height"], r["width"]) == full.shape[:2]
        assert r["mean_pixel"] == pytest.approx(full.astype(np.float64).mean())
        assert r["std_pixel"] == pytest.approx(full.astype(np.float64).std())


def test_decode_image_non_bmp_without_pil_raises(spark):
    """Compressed formats stay gated: without PIL the decode must fail
    loudly, never return garbage."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gate not reachable")
    except ImportError:
        pass
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0fakejpeg"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|non-BMP"):
        multimodal.decode_image(df).collect()


def test_format_image_reader_end_to_end(spark, tmp_path):
    """Spark's real ``format("image")`` source (JVM ImageIO) must decode
    the BMPs this codec writes, with label-from-path and pixel stats
    matching numpy goldens — the reference's radiography ingest shape."""
    arrs = _arrays(4, h=16, w=16)
    golden = {}
    for label in ("Normal", "COVID"):
        d = tmp_path / label
        d.mkdir()
        for i, a in enumerate(arrs):
            full = np.repeat(a[:, :, None], 3, axis=2) if a.ndim == 2 else a
            (d / f"img{i}.bmp").write_bytes(imaging.encode_bmp(a))
            golden[f"{label}/img{i}.bmp"] = full.astype(np.float64)

    df = read_images(spark, str(tmp_path) + "/*")
    rows = df.select(
        "label",
        "image.origin",
        "image.height",
        "image.width",
        "image.nChannels",
        "image.data",
    ).collect()
    assert len(rows) == len(golden)
    for r in rows:
        key = f"{r['label']}/{r['origin'].rsplit('/', 1)[1]}"
        g = golden[key]
        assert (r["height"], r["width"]) == g.shape[:2]
        assert r["nChannels"] == 3
        got = np.frombuffer(bytes(r["data"]), dtype=np.uint8).astype(np.float64)
        # ImageIO returns BGR top-down row-major; mean/std/minmax are
        # channel-order-invariant, and exact byte equality pins the decode
        assert got.size == g.size
        np.testing.assert_array_equal(
            got.reshape(g.shape), g.astype(np.uint8)[:, :, :3]
        )

    # D1 stats through the pipeline operator over the real image structs
    stats = pixel_stats(
        df.selectExpr("image", "CAST(label = 'COVID' AS INT) AS label")
    )
    for r in stats.collect():
        key = "/".join(r["origin"].rsplit("/", 2)[-2:])
        g = golden[key]
        assert r["mean_pixel"] == pytest.approx(g.mean())
        assert r["std_pixel"] == pytest.approx(g.std())


def test_wav_codec_roundtrip():
    """encode_wav -> decode_wav must be lossless for arbitrary int16
    sample arrays (incl. extremes and odd lengths), and the header must
    carry the sample rate through."""
    import numpy as np

    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.audio import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    for n in (0, 1, 63, 256, 1001):
        samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        b = encode_wav(samples, sample_rate=16000)
        rate, back = decode_wav(b)
        assert rate == 16000 and np.array_equal(back, samples), n
    extremes = np.array([-32768, 32767, 0, -1, 1], dtype=np.int16)
    _, back = decode_wav(encode_wav(extremes))
    assert np.array_equal(back, extremes)


def test_wav_decode_rejects_non_pcm16():
    """Invalid RIFF and non-PCM16 formats must fail loudly, not decode
    garbage."""
    import struct

    import numpy as np
    import pytest

    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.audio import (
        decode_wav,
        encode_wav,
    )

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    # corrupt the fmt chunk to stereo: must raise NotImplementedError
    b = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    b[22] = 2  # channels field inside fmt chunk
    with pytest.raises(NotImplementedError, match="PCM16 mono"):
        decode_wav(bytes(b))
