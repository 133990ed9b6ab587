"""Multimodal binary-column plumbing: metadata expressions, the
mapInPandas decode kernel's determinism, and the NotImplementedError
seam for formats with no codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators import multimodal


def test_metadata_matches_payload(spark, sf_dir):
    out = multimodal.q_multimodal_metadata(spark, sf_dir).limit(20).collect()
    assert len(out) > 0
    for r in out:
        assert len(r.sha256_hex) == 64
        assert 16 <= r.fake_width < 528
        assert r.n_bytes > 0


def test_decode_kernel_deterministic(spark, sf_dir):
    a = multimodal.q_multimodal_decode(spark, sf_dir).collect()
    b = multimodal.q_multimodal_decode(spark, sf_dir).collect()
    assert a == b
    for r in a:
        assert r.status == "decoded_bytes"
        assert r.media_format == "text/plain"
        assert 0.0 <= r.byte_mean <= 255.0
        assert 0.0 < r.simpson <= 1.0


def test_codec_format_routes_to_status(spark):
    """Per-row fault isolation: a codec-less container degrades to
    byte statistics with status=codec_missing, and a corrupt payload
    that lies about its container gets status=decode_error — neither
    kills the Spark task (at corpus scale corrupt files are certain)."""
    df = spark.createDataFrame(
        [
            (1, bytearray(b"OggS\x00\x02\x00\x00rest-of-ogg")),
            (2, bytearray(b"\x89PNG\r\n\x1a\n\x00garbage-not-chunks")),
            (3, bytearray(b"\xff\xd8\xff\xe0truncated-jpeg")),
        ],
        "doc_id long, payload binary",
    )
    out = df.mapInPandas(
        multimodal.decode_features, schema=multimodal.DECODE_SCHEMA
    ).collect()
    st = {r["doc_id"]: r["status"] for r in out}
    assert st[1] == "codec_missing"
    assert st[2] in ("codec_missing", "decode_error")
    assert st[3] in ("codec_missing", "decode_error")
    # byte stats still real on the fallback path
    r1 = next(r for r in out if r["doc_id"] == 1)
    assert r1["n_bytes"] == 19 and r1["media_format"] == "audio/ogg"


def test_sniff_formats():
    assert multimodal.sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "image/png"
    assert multimodal.sniff_format(b"GIF89a..\x00..") == "image/gif"
    assert multimodal.sniff_format(b"\x00\x00\x00\x20ftypisom") == "video/mp4"
    assert multimodal.sniff_format(b"plain ascii text\n") == "text/plain"
    assert multimodal.sniff_format(b"\x00\x01\x02\x03ranDom") == "application/octet-stream"
    # offset-4 brand check must not misfire when the prefix is a magic
    assert multimodal.sniff_format(b"OggS\x00ftyp") == "audio/ogg"


def test_printable_magic_prefix_is_text_not_container():
    """A text document that merely STARTS with an ASCII container magic
    ('RIFF', 'ID3', '%PDF', ...) must sniff as text/plain — real
    containers always carry non-printable bytes.  Without this rule the
    kernel would raise NotImplementedError on ordinary prose while the
    oracle said text/plain (a fixture-dependent crash)."""
    for prefix in (b"RIFF", b"ID3", b"OggS", b"fLaC", b"%PDF", b"GIF89a", b"BM"):
        assert multimodal.sniff_format(prefix + b" plain prose here") == "text/plain"
    # same prefixes with binary content are containers again
    assert multimodal.sniff_format(b"RIFF\x00\x01") == "riff/container"


def _tiny_bmp(width=3, height=2, pixel_bytes=None) -> bytes:
    """Minimal uncompressed 24-bit BMP: BITMAPFILEHEADER (14) +
    BITMAPINFOHEADER (40) + bottom-up padded rows."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    if pixel_bytes is None:
        pixel_bytes = bytes(range(width * height * 3))
    rows = b""
    for r in range(height):  # file stores bottom row first
        row = pixel_bytes[(height - 1 - r) * width * 3 :][: width * 3]
        rows += row + b"\x00" * (stride - width * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + info + rows


def test_bmp_decodes_real_pixels():
    """The BMP path produces REAL pixel features — stats over the
    decoded pixel array (padding stripped, rows un-flipped), not over
    the container bytes — without hitting the codec seam."""
    import pandas as pd

    px = bytes(range(18))  # 3x2 RGB24 → 18 pixel bytes, values 0..17
    payload = _tiny_bmp(3, 2, px)
    arr = multimodal._decode_bmp(payload)
    assert arr.shape == (2, 3, 3)
    assert arr.ravel().tolist() == list(px)  # round-trips exactly

    [out] = list(
        multimodal.decode_features(
            iter([pd.DataFrame({"doc_id": [7], "payload": [payload]})])
        )
    )
    r = out.iloc[0]
    n, s, ss = 18, sum(range(18)), sum(i * i for i in range(18))
    assert r["media_format"] == "image/bmp"
    assert r["status"] == "decoded_pixels"
    assert r["n_bytes"] == len(payload)  # container size, not pixel count
    assert r["byte_mean"] == s / n
    assert r["byte_std"] == (ss / n - (s / n) * (s / n)) ** 0.5
    assert (r["distinct_bytes"], r["byte_min"], r["byte_max"]) == (18, 0, 17)


def _tiny_ppm(w=3, h=2, px=None) -> bytes:
    px = bytes(range(w * h * 3)) if px is None else px
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + px


def _tiny_wav(samples, bits=16) -> bytes:
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes(samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * bits // 8, bits // 8, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_ppm_decodes_real_pixels():
    """Binary P6 PPM decodes to real pixel features, header comments
    and all."""
    import pandas as pd

    payload = _tiny_ppm()
    arr = multimodal._decode_ppm(payload)
    assert arr.shape == (2, 3, 3)
    assert arr.ravel().tolist() == list(range(18))

    [out] = list(
        multimodal.decode_features(
            iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
        )
    )
    r = out.iloc[0]
    assert r["media_format"] == "image/ppm"
    assert r["status"] == "decoded_pixels"
    assert (r["byte_min"], r["byte_max"], r["distinct_bytes"]) == (0, 17, 18)


def test_ppm_16bit_hits_seam():
    with pytest.raises(NotImplementedError, match="16-bit PPM"):
        multimodal._decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))


def test_wav_decodes_real_samples():
    """PCM WAV decodes to per-sample amplitude statistics — signed
    16-bit values, so the census runs on the unique-value path."""
    import pandas as pd

    samples = [-32768, -1, 0, 1, 32767, 0]
    payload = _tiny_wav(samples)
    arr = multimodal._decode_wav(payload)
    assert arr.tolist() == samples
    assert multimodal.sniff_format(payload) == "audio/wav"

    [out] = list(
        multimodal.decode_features(
            iter([pd.DataFrame({"doc_id": [2], "payload": [payload]})])
        )
    )
    r = out.iloc[0]
    n = len(samples)
    s = sum(samples)
    ss = sum(x * x for x in samples)
    assert r["status"] == "decoded_samples"
    assert r["byte_mean"] == s / n
    assert r["byte_std"] == (ss / n - (s / n) * (s / n)) ** 0.5
    # value census over samples: {-32768,-1,0,1,32767}, 0 appears twice
    assert r["distinct_bytes"] == 5
    assert r["simpson"] == (1 + 1 + 4 + 1 + 1) / (n * n)
    assert (r["byte_min"], r["byte_max"]) == (-32768, 32767)


def test_wav_8bit_and_float_variants():
    import struct

    eight = _tiny_wav([0, 128, 255], bits=8)
    assert multimodal._decode_wav(eight).tolist() == [0, 128, 255]
    # IEEE-float WAV (format 3) stays behind the seam
    payload = bytearray(_tiny_wav([0, 1]))
    struct.pack_into("<H", payload, 20, 3)
    with pytest.raises(NotImplementedError, match="no codec for WAV"):
        multimodal._decode_wav(bytes(payload))


def _tiny_png(w, h, ch, scanlines: bytes) -> bytes:
    """Assemble a PNG from raw (filter_byte + row_bytes) scanlines."""
    import struct
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_png_decodes_all_filter_types():
    """Real PNG decode through stdlib zlib: one row per filter type
    (None, Sub, Up, Average, Paeth), expected pixels computed from the
    spec's unfilter definitions by hand."""
    import numpy as np

    # 3-pixel-wide grayscale (ch=1), 5 rows, one per filter
    rows = [
        (0, [10, 20, 30]),  # None → 10 20 30
        (1, [5, 5, 5]),  # Sub: +left → 5 10 15
        (2, [1, 2, 3]),  # Up: +above(5,10,15) → 6 12 18
        (3, [4, 4, 4]),  # Avg: +(left+up)//2 → 7 13 19  (see below)
        (4, [1, 1, 1]),  # Paeth → 8 14 20
    ]
    # Avg row: p0 = 4 + (0+6)//2 = 7; p1 = 4 + (7+12)//2 = 13;
    #          p2 = 4 + (13+18)//2 = 19
    # Paeth row: predictors are left/up/up-left minimizing the
    # estimate; row above is 7 13 19 → 8, then paeth(8,13,7)=13+1=14,
    # paeth(14,19,13)=19+1=20
    scan = b"".join(bytes([f] + v) for f, v in rows)
    payload = _tiny_png(3, 5, 1, scan)
    assert multimodal.sniff_format(payload) == "image/png"
    arr = multimodal._decode_png(payload)
    assert arr.shape == (5, 3, 1)
    expected = [
        [10, 20, 30],
        [5, 10, 15],
        [6, 12, 18],
        [7, 13, 19],
        [8, 14, 20],
    ]
    assert arr.reshape(5, 3).tolist() == expected

    # RGB roundtrip through the kernel
    import pandas as pd

    px = bytes(range(18))
    rgb = _tiny_png(3, 2, 3, b"\x00" + px[:9] + b"\x00" + px[9:])
    [out] = list(
        multimodal.decode_features(
            iter([pd.DataFrame({"doc_id": [9], "payload": [rgb]})])
        )
    )
    r = out.iloc[0]
    assert r["media_format"] == "image/png"
    assert r["status"] == "decoded_pixels"
    assert (r["byte_min"], r["byte_max"], r["distinct_bytes"]) == (0, 17, 18)


def _palette_png(w, h, depth, scanlines: bytes, plte: bytes) -> bytes:
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_png_palette_decodes():
    """Indexed PNGs decode through PLTE lookup — 8-bit and sub-byte
    (4-bit) index packing, expected pixels hand-computed."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])  # 4 entries
    # 8-bit indices, 3x2, None filter
    p8 = _palette_png(3, 2, 8, b"\x00\x00\x01\x02" + b"\x00\x03\x00\x01", pal)
    arr = multimodal._decode_png(p8)
    assert arr.shape == (2, 3, 3)
    assert arr[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert arr[1].tolist() == [[7, 8, 9], [255, 0, 0], [0, 255, 0]]
    # 4-bit indices: 3 pixels/row -> 2 bytes/row; 0x01 0x20 = idx 0,1,2
    p4 = _palette_png(3, 1, 4, b"\x00\x01\x20", pal)
    arr = multimodal._decode_png(p4)
    assert arr.shape == (1, 3, 3)
    assert arr[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    # palette without PLTE, out-of-range index, Adam7 still raise
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    no_plte = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="PLTE"):
        multimodal._decode_png(no_plte)
    with pytest.raises(NotImplementedError, match="index out of range"):
        multimodal._decode_png(_palette_png(1, 1, 8, b"\x00\x09", pal))
    # Adam7 2x1 grayscale now DECODES: pass 1 carries pixel (0,0),
    # pass 6 carries pixel (1,0)
    adam7 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00\x0a" + b"\x00\x14"))
        + chunk(b"IEND", b"")
    )
    arr = multimodal._decode_png(adam7)
    assert arr.reshape(1, 2).tolist() == [[10, 20]]


def test_webp_still_behind_seam():
    """WebP (VP8 entropy coding) stays behind the seam — the kernel
    routes it to codec_missing rather than raising (fault isolation)."""
    import pandas as pd

    payload = b"RIFF\x10\x00\x00\x00WEBPVP8 \x00\x01\x02"
    assert multimodal.sniff_format(payload) == "image/webp"
    [out] = list(
        multimodal.decode_features(
            iter([pd.DataFrame({"doc_id": [3], "payload": [payload]})])
        )
    )
    assert out.iloc[0]["status"] == "codec_missing"


def test_bmp_compressed_variant_still_hits_seam():
    """The NotImplementedError seam remains for BMP variants that DO
    need a real codec (RLE compression, non-24 bpp)."""
    import struct

    payload = bytearray(_tiny_bmp())
    struct.pack_into("<I", payload, 30, 1)  # compression = BI_RLE8
    with pytest.raises(NotImplementedError, match="no codec for BMP"):
        multimodal._decode_bmp(bytes(payload))


def test_decode_oracle_parity_on_non_ascii_text():
    """The O_DECODE oracle builds its byte stream from encode(text)
    (hex-expanded), so multi-byte UTF-8 documents must agree with the
    kernel byte-for-byte — the drift class where characters-as-bytes
    silently diverges on any non-ASCII document."""
    import hashlib

    import duckdb
    import pandas as pd

    text = "héllo wörld ✓ — naïve café"
    payload = text.encode("utf-8")
    [out] = list(
        multimodal.decode_features(
            iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
        )
    )
    k = out.iloc[0]

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [1], "text": [text]}))
    o = con.execute(multimodal.O_DECODE).fetchdf().iloc[0]

    assert int(o["n_bytes"]) == len(payload) == int(k["n_bytes"])
    assert o["md5_hex"] == hashlib.md5(payload).hexdigest() == k["md5_hex"]
    for col in ("byte_mean", "byte_std", "simpson"):
        assert round(float(k[col]), 6) == float(o[col]), col
    for col in ("distinct_bytes", "byte_min", "byte_max"):
        assert int(k[col]) == int(o[col]), col


def test_decode_feature_values(spark):
    # bytes [0, 255]: mean 127.5, std 127.5, simpson (1+1)/4 = 0.5,
    # 2 distinct bytes, min 0, max 255, octet-stream (unprintables)
    df = spark.createDataFrame(
        [(1, bytearray([0, 255]))], "doc_id long, payload binary"
    )
    r = (
        df.mapInPandas(multimodal.decode_features, schema=multimodal.DECODE_SCHEMA)
        .collect()[0]
    )
    assert (r.byte_mean, r.byte_std, r.simpson) == (127.5, 127.5, 0.5)
    assert (r.distinct_bytes, r.byte_min, r.byte_max) == (2, 0, 255)
    assert r.media_format == "application/octet-stream"


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def _jpeg_seg(marker, body):
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_dht(tc, th, by_length):
    counts = [0] * 16
    syms = []
    for length, symbols in by_length:
        counts[length - 1] = len(symbols)
        syms.extend(symbols)
    return _jpeg_seg(0xC4, bytes([tc << 4 | th] + counts + syms))


def test_jpeg_baseline_gray_decodes():
    """Hand-constructed 16x8 grayscale baseline JPEG: two DC-only
    blocks (flat 138 / flat 118 after IDCT + level shift), quant all
    ones, custom canonical Huffman tables.  Exercises Huffman decode,
    DC prediction (block2's diff is -160 from block1's 80), EOB, and
    the IDCT scaling."""
    import struct

    dqt = _jpeg_seg(0xDB, bytes([0x00] + [1] * 64))
    sof = _jpeg_seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    # DC: cat7 -> '0' (len1), cat8 -> '10' (len2); AC: EOB '0'
    dht_dc = _jpeg_dht(0, 0, [(1, [7]), (2, [8])])
    dht_ac = _jpeg_dht(1, 0, [(1, [0x00])])
    sos = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    bw.put(0b0, 1); bw.put(80, 7)          # DC diff +80 (cat 7)
    bw.put(0b0, 1)                          # EOB
    bw.put(0b10, 2); bw.put(-160 + 255, 8)  # DC diff -160 (cat 8)
    bw.put(0b0, 1)                          # EOB
    payload = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bw.tobytes() + b"\xff\xd9"
    )
    assert multimodal.sniff_format(payload) == "image/jpeg"
    arr = multimodal._decode_jpeg(payload)
    assert arr.shape == (8, 16, 1)
    assert (arr[:, :8, 0] == 138).all()   # 80/8 + 128
    assert (arr[:, 8:, 0] == 118).all()   # (80-160)/8 + 128


def test_jpeg_baseline_color_decodes():
    """8x8 4:4:4 color JPEG: flat Y=138, Cb=128, Cr=130 — verifies the
    per-component DC predictors and the JFIF YCbCr->RGB conversion."""
    import struct

    import numpy as np

    dqt = _jpeg_seg(0xDB, bytes([0x00] + [1] * 64))
    sof = _jpeg_seg(
        0xC0,
        struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # DC: cat0 '0', cat5 '10', cat7 '110'; AC: EOB '0'
    dht_dc = _jpeg_dht(0, 0, [(1, [0]), (2, [5]), (3, [7])])
    dht_ac = _jpeg_dht(1, 0, [(1, [0x00])])
    sos = _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    bw.put(0b110, 3); bw.put(80, 7); bw.put(0b0, 1)  # Y: +80, EOB
    bw.put(0b0, 1); bw.put(0b0, 1)                    # Cb: diff 0, EOB
    bw.put(0b10, 2); bw.put(16, 5); bw.put(0b0, 1)    # Cr: +16, EOB
    payload = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bw.tobytes() + b"\xff\xd9"
    )
    arr = multimodal._decode_jpeg(payload)
    assert arr.shape == (8, 8, 3)
    y, cb, cr = 138.0, 128.0, 130.0
    exp = [
        int(np.clip(round(y + 1.402 * (cr - 128)), 0, 255)),
        int(np.clip(round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255)),
        int(np.clip(round(y + 1.772 * (cb - 128)), 0, 255)),
    ]
    assert arr[0, 0].tolist() == exp
    assert (arr == arr[0, 0]).all()


def test_jpeg_progressive_decodes():
    """Hand-constructed PROGRESSIVE (SOF2) grayscale 8x8: DC first
    scan at Al=1, AC first scan for band 1..63 at Al=1, DC
    refinement, and an AC refinement whose EOB pass flips the
    existing coefficient's low bit — final coefficients DC=80,
    AC[0,1]=3, pixels computed from the IDCT definition."""
    import struct

    import numpy as np

    dqt = _jpeg_seg(0xDB, bytes([0x00] + [1] * 64))
    sof2 = _jpeg_seg(
        0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    dht_dc = _jpeg_dht(0, 0, [(1, [6])])
    dht_ac = _jpeg_dht(1, 0, [(1, [0x00]), (2, [0x01])])

    def sos(ss, se, ah, al, bits_fn):
        bw = _BitWriter()
        bits_fn(bw)
        return (
            _jpeg_seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
            + bw.tobytes()
        )

    scan1 = sos(0, 0, 0, 1, lambda bw: (bw.put(0b0, 1), bw.put(40, 6)))
    scan2 = sos(
        1, 63, 0, 1,
        lambda bw: (bw.put(0b10, 2), bw.put(1, 1), bw.put(0b0, 1)),
    )
    scan3 = sos(0, 0, 1, 0, lambda bw: bw.put(0b0, 1))
    scan4 = sos(1, 63, 1, 0, lambda bw: (bw.put(0b0, 1), bw.put(1, 1)))
    payload = (
        b"\xff\xd8" + dqt + sof2 + dht_dc + dht_ac
        + scan1 + scan2 + scan3 + scan4 + b"\xff\xd9"
    )
    arr = multimodal._decode_jpeg(payload)
    assert arr.shape == (8, 8, 1)
    F = np.zeros((8, 8))
    F[0, 0] = 80.0   # (40 << 1), refinement bit 0
    F[0, 1] = 3.0    # (1 << 1) then +1 from the refinement EOB pass
    xs = np.arange(8)
    M = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16) / 2.0
    M[0, :] /= np.sqrt(2.0)
    exp = np.clip(np.round(M.T @ F @ M + 128.0), 0, 255).astype(int)
    assert (arr.reshape(8, 8) == exp).all()


def test_jpeg_arithmetic_stays_behind_seam():
    import struct

    sof9 = _jpeg_seg(0xC9, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    payload = b"\xff\xd8" + sof9 + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="arithmetic"):
        multimodal._decode_jpeg(payload)


def _gif_bytes(w, h, codes_widths, palette, interlace=False, mcs=2):
    """Assemble a GIF89a with LSB-first LZW codes given as
    (code, width) pairs."""
    import struct

    bits = []
    for code, width in codes_widths:
        for i in range(width):
            bits.append((code >> i) & 1)
    data = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        data.append(b)
    gct_field = 0  # 2 entries
    n_pal = 2 << gct_field
    pal = bytes(palette) + bytes(3 * n_pal - len(palette))
    p2 = 0x40 if interlace else 0
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | gct_field, 0, 0)
        + pal
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, p2)
        + bytes([mcs, len(data)]) + bytes(data) + b"\x00"
        + b"\x3b"
    )


def test_gif_decodes_lzw():
    """Hand-constructed 2x2 GIF: CLEAR + root codes + END, with the
    decoder's width bump at next_code=8 accounted for."""
    pal = [255, 0, 0, 0, 0, 255]
    payload = _gif_bytes(
        2, 2,
        [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)],
        pal,
    )
    assert multimodal.sniff_format(payload) == "image/gif"
    arr = multimodal._decode_gif(payload)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 0, 255]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [255, 0, 0]


def test_gif_deinterlaces():
    """1x4 interlaced GIF: storage order is rows 0,2,1,3 — the decoder
    must reorder to 0,1,2,3."""
    pal = [255, 0, 0, 0, 0, 255]
    # pixel values in STORAGE order: row0=0, row2=1, row1=1, row3=0
    payload = _gif_bytes(
        1, 4,
        [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)],
        pal,
        interlace=True,
    )
    arr = multimodal._decode_gif(payload)
    # display order rows: 0 -> 0(red), 1 -> 1(blue), 2 -> 1(blue), 3 -> 0(red)
    assert arr[:, 0].tolist() == [
        [255, 0, 0], [0, 0, 255], [0, 0, 255], [255, 0, 0],
    ]


def test_gif_kwkwk_and_dictionary_growth():
    """LZW dictionary path: sequence CLEAR,0,6(=[0,0] via KwKwK),END
    over a 1x3 image exercises the code-not-yet-in-table branch."""
    pal = [255, 0, 0, 0, 0, 255]
    payload = _gif_bytes(
        1, 3, [(4, 3), (0, 3), (6, 3), (5, 3)], pal
    )
    arr = multimodal._decode_gif(payload)
    assert arr[:, 0].tolist() == [[255, 0, 0]] * 3


def test_png_16bit_and_adam7_decode():
    """16-bit grayscale decodes to uint16 samples (network byte
    order); a 4x4 Adam7 interlaced gray image reassembles the pass
    scatter correctly."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # 2x1 gray, 16-bit: samples 0x0102, 0xFF00
    p16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\xff\x00"))
        + chunk(b"IEND", b"")
    )
    arr = multimodal._decode_png(p16)
    assert arr.dtype == np.uint16
    assert arr.reshape(1, 2).tolist() == [[0x0102, 0xFF00]]

    # 4x4 gray Adam7: target image v[y][x] = 16*y + x.
    # Pass order/pixels: p1 (0,0); p4 (2,0),(2,2)->x=2 rows 0,2;
    # p5 row 2 x=0,2; p6 x=1,3 rows 0,2; p7 rows 1,3 all x.
    img = [[16 * y + x for x in range(4)] for y in range(4)]
    passes = []
    for x0, y0, dx, dy in multimodal._ADAM7:
        xs = list(range(x0, 4, dx))
        ys = list(range(y0, 4, dy))
        if not xs or not ys:
            continue
        for y in ys:
            passes.append(bytes([0] + [img[y][x] for x in xs]))
    p_adam = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"".join(passes)))
        + chunk(b"IEND", b"")
    )
    arr = multimodal._decode_png(p_adam)
    assert arr.reshape(4, 4).tolist() == img


def test_decode_kernel_survives_arbitrary_garbage():
    """Fault-isolation property: NO payload, however malformed, may
    raise out of the kernel — corrupt files at corpus scale must
    degrade to a status, never kill the task.  Adversarial prefixes
    put every decoder's parser under garbage tails."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    prefixes = [
        b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF89a",
        b"RIFF\x00\x00\x00\x00WAVE", b"BM", b"P6\n",
        b"RIFF\x00\x00\x00\x00WEBP",
    ]

    @given(
        st.sampled_from(prefixes),
        st.binary(min_size=0, max_size=200),
    )
    @settings(max_examples=120, deadline=None)
    def _run(prefix, tail):
        payload = prefix + tail
        if not payload:
            return  # empty payloads are out of the kernel's contract
        [out] = list(
            multimodal.decode_features(
                iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
            )
        )
        assert out.iloc[0]["status"] in (
            "decoded_bytes", "decoded_pixels", "decoded_samples",
            "codec_missing", "decode_error",
        )

    _run()


def test_jpeg_420_subsampling_decodes():
    """16x16 4:2:0 JPEG (Y 2x2 blocks per MCU, chroma 1 block,
    pixel-replication upsampling): flat planes decode to one RGB."""
    import struct

    import numpy as np

    dqt = _jpeg_seg(0xDB, bytes([0x00] + [1] * 64))
    sof = _jpeg_seg(
        0xC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht_dc = _jpeg_dht(0, 0, [(1, [0]), (2, [5]), (3, [7])])
    dht_ac = _jpeg_dht(1, 0, [(1, [0x00])])
    sos = _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    # one MCU: 4 Y blocks (first +80, rest diff 0), Cb diff 0, Cr +16
    bw.put(0b110, 3); bw.put(80, 7); bw.put(0b0, 1)
    for _ in range(3):
        bw.put(0b0, 1); bw.put(0b0, 1)  # Y diff 0, EOB
    bw.put(0b0, 1); bw.put(0b0, 1)      # Cb
    bw.put(0b10, 2); bw.put(16, 5); bw.put(0b0, 1)  # Cr
    payload = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bw.tobytes() + b"\xff\xd9"
    )
    arr = multimodal._decode_jpeg(payload)
    assert arr.shape == (16, 16, 3)
    y, cb, cr = 138.0, 128.0, 130.0
    exp = [
        int(np.clip(round(y + 1.402 * (cr - 128)), 0, 255)),
        int(np.clip(round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255)),
        int(np.clip(round(y + 1.772 * (cb - 128)), 0, 255)),
    ]
    assert (arr == np.array(exp, dtype=np.uint8)).all()


def test_wav_extended_profiles():
    """24-bit PCM, 32-bit IEEE float (quantized to 16-bit amplitude),
    and the WAVE_FORMAT_EXTENSIBLE wrapper all decode."""
    import struct

    def wav(fmt_tag, bits, data, extensible=False):
        if extensible:
            sub = struct.pack("<H", fmt_tag) + b"\x00" * 14
            fmt = struct.pack(
                "<HHIIHHH", 0xFFFE, 1, 8000, 8000 * bits // 8,
                bits // 8, bits, 22,
            ) + struct.pack("<HI", bits, 0) + sub
        else:
            fmt = struct.pack(
                "<HHIIHH", fmt_tag, 1, 8000, 8000 * bits // 8,
                bits // 8, bits,
            )
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 24-bit PCM: 1, -1, 8388607, -8388608
    d24 = (
        b"\x01\x00\x00" + b"\xff\xff\xff"
        + b"\xff\xff\x7f" + b"\x00\x00\x80"
    )
    s = multimodal._decode_wav(wav(1, 24, d24))
    assert s.tolist() == [1, -1, 8388607, -8388608]
    # 32-bit float: 0.5 -> 16384 (round), -1.0 -> -32767
    df = struct.pack("<2f", 0.5, -1.0)
    s = multimodal._decode_wav(wav(3, 32, df))
    assert s.tolist() == [round(0.5 * 32767), -32767]
    # extensible wrapper around 16-bit PCM
    d16 = struct.pack("<2h", 1000, -1000)
    s = multimodal._decode_wav(wav(1, 16, d16, extensible=True))
    assert s.tolist() == [1000, -1000]
    # compressed (e.g. format 85 = MP3-in-WAV) stays behind the seam
    import pytest

    with pytest.raises(NotImplementedError, match="no codec for WAV"):
        multimodal._decode_wav(wav(85, 16, d16))


def test_bmp_palette_and_32bpp_decode():
    """8-bit palette BMP (BGRX quads after the info header) and 32-bpp
    BGRX both decode; bottom-up row flip applies."""
    import struct

    # 2x1, 8bpp, palette [red(BGR 0,0,255), green(0,255,0)]
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])
    data_off = 54 + len(pal)
    rows = bytes([0, 1, 0, 0])  # stride 4
    header = struct.pack("<2sIHHI", b"BM", data_off + len(rows), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, len(rows), 0, 0, 2, 0)
    arr = multimodal._decode_bmp(header + info + pal + rows)
    assert arr.shape == (1, 2, 3)
    assert arr[0, 0].tolist() == [0, 0, 255]   # B,G,R = red
    assert arr[0, 1].tolist() == [0, 255, 0]   # green
    # 1x1 32bpp BGRX
    header = struct.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4, 0, 0, 0, 0)
    arr = multimodal._decode_bmp(header + info + bytes([10, 20, 30, 0]))
    assert arr[0, 0].tolist() == [10, 20, 30]


def test_pgm_pbm_decode():
    """P5 grayscale and P4 packed-bit netpbm variants decode."""
    arr = multimodal._decode_ppm(b"P5\n3 2\n255\n" + bytes(range(6)))
    assert arr.shape == (2, 3, 1)
    assert arr.ravel().tolist() == [0, 1, 2, 3, 4, 5]
    # P4: 3x2 bits -> one byte per row; 0b101xxxxx then 0b010xxxxx
    arr = multimodal._decode_ppm(b"P4\n3 2\n" + bytes([0b10100000, 0b01000000]))
    assert arr.reshape(2, 3).tolist() == [[1, 0, 1], [0, 1, 0]]
    assert multimodal.sniff_format(b"P5\n1 1\n255\n\x00") == "image/ppm"


def test_gif_skips_extension_blocks():
    """Real GIF89a files carry a Graphics Control Extension before the
    image descriptor — the block walk must skip it."""
    pal = [255, 0, 0, 0, 0, 255]
    base = _gif_bytes(2, 2, [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)], pal)
    # splice a GCE (0x21 0xF9, size 4, data, terminator) after the GCT
    head_len = 6 + 7 + 6  # header + LSD + 2-entry palette
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    payload = base[:head_len] + gce + base[head_len:]
    arr = multimodal._decode_gif(payload)
    assert arr[0, 0].tolist() == [255, 0, 0]


def test_jpeg_skips_app_segments():
    """Real JPEGs start with APP0/JFIF (and often carry EXIF APP1) —
    the marker walk must skip unknown APPn/COM segments."""
    import struct

    dqt = _jpeg_seg(0xDB, bytes([0x00] + [1] * 64))
    sof = _jpeg_seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = _jpeg_dht(0, 0, [(1, [7])])
    dht_ac = _jpeg_dht(1, 0, [(1, [0x00])])
    sos = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    bw.put(0b0, 1); bw.put(80, 7); bw.put(0b0, 1)
    app0 = _jpeg_seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    com = _jpeg_seg(0xFE, b"a comment")
    payload = (
        b"\xff\xd8" + app0 + com + dqt + sof + dht_dc + dht_ac + sos
        + bw.tobytes() + b"\xff\xd9"
    )
    arr = multimodal._decode_jpeg(payload)
    assert (arr[:, :, 0] == 138).all()
