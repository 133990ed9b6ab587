"""Multimodal-column plumbing (SURVEY.md §2.3): opaque ``binary``
payloads with typed metadata, decode/feature-extract as Arrow-batched
``mapInPandas``.

The feature kernel is REAL byte-level decoding — container-format
sniffing from magic bytes, exact byte statistics (mean/std from integer
power sums, Simpson collision index, distinct-byte census), md5 — all
computed with arithmetic that replays bit-identically in SQL, so the
operator is fully value-checked against the DuckDB oracle.  Six real
codecs are implemented in pure Python/stdlib/numpy: uncompressed
BMP — 8-bit palette / 24-bit / 32-bit BGRX (:func:`_decode_bmp`) —
the binary netpbm family P4/P5/P6 (:func:`_decode_ppm`),
FULL PNG — 8/16-bit gray/RGB/alpha, 1/2/4/8-bit palette, and their
Adam7-interlaced variants (:func:`_decode_png`: chunk walk,
stdlib-``zlib`` inflate, per-pass None/Sub/Up/Average/Paeth scanline
unfiltering, sub-byte index unpacking, PLTE lookup, interlace
scatter) — and HUFFMAN JPEG, baseline sequential AND progressive
(:func:`_decode_jpeg`: canonical-Huffman entropy decode, DC
prediction, zigzag/run-length AC, spectral-band scans with EOB runs
and successive-approximation refinement, dequantization, separable
float IDCT, sampling-factor reassembly, JFIF YCbCr→RGB) and GIF
(:func:`_decode_gif`: LSB-first variable-width LZW, 4-pass
deinterlace, palette lookup) — three genuinely entropy-coded
formats — producing statistics over the DECODED PIXEL array; WAV
(:func:`_decode_wav`) produces per-sample amplitude statistics over
integer PCM (8/16/24/32-bit), IEEE-float (quantized to 16-bit
amplitude), and WAVE_FORMAT_EXTENSIBLE streams — real image AND
audio decode paths.
Formats whose codecs are truly absent from this container
(WebP/MP3/video, arithmetic-coded JPEG) stay behind the
``NotImplementedError`` seam, and the kernel
ROUTES that seam per row — ``status = codec_missing`` (seam) or
``decode_error`` (corrupt container bytes) with byte-statistics
fallback — because at corpus scale corrupt files are certain and one
bad payload must never fail the Spark task.

Entropy note: the diversity feature is the Simpson collision index
Σc²/n² (the Rényi-2 entropy's log-free core) rather than Shannon
entropy — exact integer arithmetic plus one IEEE division, so both
engines produce identical bits; ``log2`` is a libm call whose last-ulp
behavior is not guaranteed to agree across engines (same precedent as
the log-free idf in operators/corpus.py).

Payloads are synthesized from ``documents.text`` (UTF-8 bytes) so the
pipeline is deterministic and every operator stays oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

FAKE_FORMAT = "synthetic/raw"
FEAT_DIM = 4


def with_payload(d: DataFrame) -> DataFrame:
    """Attach the opaque binary column + format tag (in a real pipeline
    this is the decoded file read from object storage)."""
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit(FAKE_FORMAT).alias("media_format"),
    )


def docs_for_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) spread across the session's full parallelism.

    The documents table is a single parquet file at test scale, so a
    straight scan gives the codec mapInPandas stages ONE partition —
    serializing every encode/decode on one core.  The Python-kernel
    cost dominates these stages by orders of magnitude, so the tiny
    round-robin shuffle is the right trade at every scale (at real
    scale the input is many files and the repartition keeps cores
    busy when file sizes skew)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.repartition(spark.sparkContext.defaultParallelism)


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: byte length, sha256, and
    deterministic fake dimensions (pure arithmetic so the oracle can
    reproduce them) — all JVM-side expressions."""
    d = with_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "media_format",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256_hex"),
        (F.octet_length("payload") % 512 + 16).alias("fake_width"),
        ((F.octet_length("payload") * 7) % 512 + 16).alias("fake_height"),
    ).orderBy("doc_id")


O_MULTIMODAL_META = f"""
SELECT doc_id,
       '{FAKE_FORMAT}' AS media_format,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256_hex,
       octet_length(encode(text)) % 512 + 16 AS fake_width,
       (octet_length(encode(text)) * 7) % 512 + 16 AS fake_height
FROM documents ORDER BY doc_id
"""


# (magic bytes, sniffed format) — longest-prefix-first dispatch table.
# Formats here need an external codec to go deeper than byte statistics
# (the NotImplementedError seam) — EXCEPT image/bmp, whose uncompressed
# 24-bit variant is decoded in pure Python below.
_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "riff/container"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"%PDF", "application/pdf"),
    (b"BM", "image/bmp"),
]

_PRINTABLE = frozenset(range(32, 127)) | {9, 10, 13}


def _all_printable(payload: bytes) -> bool:
    return bool(payload) and all(b in _PRINTABLE for b in payload)


def sniff_format(payload: bytes) -> str:
    """Container sniff from magic bytes; falls back to text/plain for
    all-printable payloads, else application/octet-stream.

    An all-printable payload is never a container, whatever its first
    bytes: several magics are plain ASCII ('RIFF', 'ID3', 'OggS',
    'fLaC', '%PDF', 'GIF8', 'BM'), and a text document legitimately
    starting with those letters must sniff as text/plain, not crash
    the decode as a codec-less container — real containers always
    carry non-printable bytes.  (The DuckDB oracle applies the same
    printable test, so the two sides agree by construction.)"""
    if _all_printable(payload):
        return "text/plain"
    if payload[:4] == b"RIFF":
        # RIFF is a family: the form type at offset 8 names the member
        if payload[8:12] == b"WAVE":
            return "audio/wav"
        if payload[8:12] == b"WEBP":
            return "image/webp"
        return "riff/container"
    if payload[:2] in (b"P4", b"P5", b"P6") and payload[2:3] in (
        b"\n", b" ", b"\t", b"\r"
    ):
        return "image/ppm"
    for magic, fmt in _MAGIC:
        if payload[: len(magic)] == magic:
            return fmt
    if payload[4:8] == b"ftyp":  # ISO-BMFF (mp4/mov): brand at offset 4
        return "video/mp4"
    return "application/octet-stream"


# Sniffed formats whose payload-level decode needs a real codec library
# (absent in this container) — the NotImplementedError seam.  Three
# formats are excluded because their specs need no entropy coder and
# are decoded in pure Python below: uncompressed 24-bit BMP, binary
# P6 PPM, and PCM WAV.
CODEC_REQUIRED = (
    frozenset(fmt for _, fmt in _MAGIC if not fmt.startswith("application/"))
    | {"video/mp4", "image/webp"}
) - {"image/bmp", "image/png", "image/jpeg", "image/gif"}


def _decode_bmp(payload: bytes):
    """Pure-Python decode of uncompressed BMP (8-bit palette, 24-bit,
    and 32-bit BGRX profiles): returns the pixel array as shape
    (height, width, 3) uint8 in B,G,R byte order (the file's own
    channel order), or raises.

    Layout (Windows BITMAPFILEHEADER + BITMAPINFOHEADER, all little-
    endian): bytes 10-13 pixel-data offset; 14-17 info-header size;
    18-21 width (i32); 22-25 height (i32, >0 means bottom-up rows);
    26-27 planes; 28-29 bits-per-pixel; 30-33 compression (0 = BI_RGB).
    Rows are padded to 4-byte multiples; 8-bit images look up the
    BGRX palette quads that follow the info header.  RLE compression
    and 1/4/16-bpp variants raise NotImplementedError — the
    documented codec seam, scoped to genuinely-compressed or exotic
    layouts."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP header")
    data_off, = struct.unpack_from("<I", payload, 10)
    hdr_size, = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header variant ({hdr_size})")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression, = struct.unpack_from("<I", payload, 30)
    if planes != 1 or not (0 < width <= 1 << 20) or not (0 < abs(height) <= 1 << 20):
        raise NotImplementedError("implausible BMP dimensions")
    if bpp not in (8, 24, 32) or compression != 0:
        raise NotImplementedError(
            f"no codec for BMP bpp={bpp} compression={compression}: "
            "uncompressed 8-bit palette / 24-bit / 32-bit decode here"
        )
    h = abs(height)
    bypp = bpp // 8
    stride = (width * bypp + 3) // 4 * 4
    if data_off + stride * h > len(payload):
        raise NotImplementedError("truncated BMP pixel array")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : width * bypp]
    if bpp == 8:
        # palette between the info header and the pixel array: BGRX
        # quads; used-colors field (offset 46) 0 means the full 256
        used, = struct.unpack_from("<I", payload, 46)
        n_pal = used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_pal * 4, offset=pal_off
        ).reshape(n_pal, 4)[:, :3]  # B, G, R (X dropped)
        idx = rows.reshape(h, width)
        if int(idx.max()) >= n_pal:
            raise NotImplementedError("BMP palette index out of range")
        px = pal[idx]
    else:
        px = rows.reshape(h, width, bypp)
        if bpp == 32:
            px = px[:, :, :3]  # B, G, R (padding/alpha byte dropped)
    return px[::-1] if height > 0 else px  # bottom-up → top-down


def _decode_ppm(payload: bytes):
    """Pure-Python decode of the binary netpbm family: P6 (PPM RGB),
    P5 (PGM gray), and P4 (PBM bitmap, MSB-first packed bits) — ASCII
    header with ``#`` comments and arbitrary whitespace, then raw
    samples.  Returns (h, w, 3|1) uint8 (P4 yields 0/1 values).
    maxval > 255 (16-bit samples) raises — outside the 1-byte
    profile."""
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P4", b"P5", b"P6"):
        raise NotImplementedError("not a binary netpbm header")
    want = 2 if magic == b"P4" else 3  # PBM has no maxval field
    pos = 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < want and pos < n:
        c = payload[pos]
        if c in b"#":
            while pos < n and payload[pos] not in b"\n":
                pos += 1
        elif c in b" \t\r\n":
            pos += 1
        elif 48 <= c <= 57:
            v = 0
            while pos < n and 48 <= payload[pos] <= 57:
                v = v * 10 + payload[pos] - 48
                pos += 1
            fields.append(v)
        else:
            raise NotImplementedError("malformed PPM header")
    if len(fields) < want:
        raise NotImplementedError("truncated PPM header")
    width, height = fields[0], fields[1]
    maxval = fields[2] if want == 3 else 1
    if not (0 < width <= 1 << 20 and 0 < height <= 1 << 20):
        raise NotImplementedError("implausible PPM dimensions")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM samples not decoded here")
    pos += 1  # exactly one whitespace byte separates header from pixels
    if magic == b"P4":
        stride = (width + 7) // 8
        need = stride * height
        if pos + need > n:
            raise NotImplementedError("truncated PBM pixel array")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=need, offset=pos
        ).reshape(height, stride)
        bits = np.unpackbits(rows, axis=1)[:, :width]
        return bits.reshape(height, width, 1)
    ch = 1 if magic == b"P5" else 3
    need = width * height * ch
    if pos + need > n:
        raise NotImplementedError("truncated PPM pixel array")
    return np.frombuffer(
        payload, dtype=np.uint8, count=need, offset=pos
    ).reshape(height, width, ch)


def _decode_wav(payload: bytes):
    """Pure-Python decode of PCM WAV (RIFF/WAVE): walks the chunk list,
    reads the fmt chunk (integer PCM at 8/16/24/32 bits, IEEE-float
    at 32/64 bits — quantized to 16-bit amplitude — and the
    WAVE_FORMAT_EXTENSIBLE wrapper of either), and returns the data
    chunk as an int64 sample array (channels interleaved — amplitude
    statistics are per-sample).  Compressed WAV raises — the seam."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE header")
    pos = 12
    fmt = None
    fmt_body = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt or data chunk")
    audio_format, _ch, _rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE and fmt_body is not None and len(fmt_body) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real format tag leads the
        # SubFormat GUID at offset 24 of the fmt body
        audio_format, = struct.unpack_from("<H", fmt_body, 24)
    ok = (audio_format == 1 and bits in (8, 16, 24, 32)) or (
        audio_format == 3 and bits in (32, 64)
    )
    if not ok:
        raise NotImplementedError(
            f"no codec for WAV format={audio_format} bits={bits}: "
            "integer PCM (8/16/24/32) and IEEE-float (32/64) decode here"
        )
    if audio_format == 3:
        # IEEE float: quantize to 16-bit integer amplitude so the
        # sample statistics stay integer-exact and engine-portable
        dt = "<f4" if bits == 32 else "<f8"
        width = bits // 8
        f = np.frombuffer(data[: len(data) // width * width], dtype=dt)
        samples = np.clip(
            np.round(f.astype(np.float64) * 32767.0), -32768, 32767
        )
    elif bits == 16:
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    elif bits == 24:
        # 3-byte little-endian signed: widen via a zero pad + shift
        n = len(data) // 3
        b3 = np.frombuffer(data[: n * 3], dtype=np.uint8).reshape(n, 3)
        widened = (
            b3[:, 0].astype(np.int32)
            | (b3[:, 1].astype(np.int32) << 8)
            | (b3[:, 2].astype(np.int32) << 16)
        )
        samples = np.where(widened >= 1 << 23, widened - (1 << 24), widened)
    elif bits == 32:
        samples = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
    else:  # 8-bit WAV is unsigned
        samples = np.frombuffer(data, dtype=np.uint8)
    if samples.size == 0:
        raise NotImplementedError("empty WAV data chunk")
    return samples.astype(np.int64)


def _png_unfilter(raw, off, h, stride, bpp):
    """Unfilter ``h`` scanlines (None/Sub/Up/Average/Paeth) starting
    at byte ``off``; returns ((h, stride) uint8, bytes consumed)."""
    import numpy as np

    if len(raw) - off < h * (stride + 1):
        raise NotImplementedError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = off
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += stride + 1
        if f == 0:
            pass
        elif f == 2:  # Up — uint8 add wraps mod 256, per spec
            row += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = row.astype(np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if f == 1:
                    cur[i] = (cur[i] + a) % 256
                elif f == 3:
                    cur[i] = (cur[i] + (a + b) // 2) % 256
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pr) % 256
            row = cur.astype(np.uint8)
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = row
        prev = row
    return out, p - off


def _png_rows_to_values(rows, w, depth, ch):
    """(h, stride) unfiltered bytes → (h, w, ch) sample values:
    uint8 for depth ≤ 8 (sub-byte bit groups unpacked big-endian),
    uint16 for depth 16 (network byte order)."""
    import numpy as np

    h = rows.shape[0]
    if depth == 16:
        v = rows.reshape(h, -1, 2)
        vals = (v[:, :, 0].astype(np.uint16) << 8) | v[:, :, 1]
        return vals.reshape(h, w, ch)
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.uint8)
    vals = (bits.reshape(h, w, depth).astype(np.uint8) * weights).sum(
        axis=2
    ).astype(np.uint8)
    return vals.reshape(h, w, 1)


# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _decode_png(payload: bytes):
    """Pure-stdlib decode of PNG: gray / gray+A / RGB / RGBA at 8- and
    16-bit depth, PALETTE (indexed) images at 1/2/4/8-bit depth, and
    Adam7 INTERLACED variants of all of them — chunk walk,
    concatenated-IDAT zlib inflate, per-pass scanline unfiltering
    (None/Sub/Up/Average/Paeth), sub-byte index unpacking, PLTE
    lookup, and interlace pixel scatter.  PNG's entropy coder is
    DEFLATE, which ships in Python's ``zlib`` — so this is a REAL
    decode with no external codec.  Returns (h, w, ch) uint8 for
    depth ≤ 8 (palette images return ch=3) and uint16 for 16-bit."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG signature")
    pos = 8
    hdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = hdr
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    depth_ok = (
        depth in (8, 16) if ctype != 3 else depth in (1, 2, 4, 8)
    )
    if (
        not depth_ok
        or interlace not in (0, 1)
        or comp != 0
        or filt != 0
        or ch is None
    ):
        raise NotImplementedError(
            f"no codec for PNG depth={depth} colortype={ctype} "
            f"interlace={interlace}"
        )
    if ctype == 3 and plte is None:
        raise NotImplementedError("no codec for PNG palette without PLTE")
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        raise NotImplementedError("implausible PNG dimensions")
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, (depth * ch) // 8)
    dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        stride = (w * depth * ch + 7) // 8
        rows, _ = _png_unfilter(raw, 0, h, stride, bpp)
        vals = _png_rows_to_values(rows, w, depth, ch)
    else:
        vals = np.zeros((h, w, ch), dtype=dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * depth * ch + 7) // 8
            rows, used = _png_unfilter(raw, off, ph, pstride, bpp)
            off += used
            vals[y0::dy, x0::dx] = _png_rows_to_values(rows, pw, depth, ch)
    if ctype == 3:
        idx = vals.reshape(h, w)
        pal = np.frombuffer(plte, np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        if pal.size == 0 or int(idx.max()) >= len(pal):
            raise NotImplementedError("PNG palette index out of range")
        return pal[idx]  # (h, w, 3)
    return vals

def _lzw_decode(data: bytes, mcs: int, expected: int) -> list[int]:
    """GIF-variant LZW: LSB-first variable-width codes (mcs+1 .. 12
    bits), CLEAR/END control codes, standard KwKwK handling.

    Codes are extracted in vectorized chunks: the code width is fixed
    until ``next_code`` reaches ``1 << width`` (it grows at most once
    per consumed code), so up to that many codes are sliced out of a
    numpy bit array in one gather instead of a per-bit Python loop.
    A CLEAR (or a width bump) mid-chunk just discards the not-yet
    consumed tail of the chunk — the bit cursor only advances as
    codes are consumed, so re-reading at the new width is exact."""
    import numpy as np

    clear, end = 1 << mcs, (1 << mcs) + 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    nbits = len(bits)
    bitpos = 0
    width = mcs + 1
    table: list[list[int] | None] = [[i] for i in range(clear)]
    table += [None, None]  # CLEAR / END positions
    next_code = end + 1
    prev: list[int] | None = None
    out: list[int] = []
    pending: list[int] = []
    pi = 0
    while len(out) < expected:
        if pi >= len(pending):
            # refill: codes guaranteed to share the current width
            k = (1 << width) - next_code if width < 12 else 1 << 12
            k = max(1, min(k, expected - len(out) + 1))
            avail = (nbits - bitpos) // width
            if avail <= 0:
                raise NotImplementedError("truncated GIF LZW stream")
            k = min(k, avail)
            idx = bitpos + width * np.arange(k)
            pend = bits[idx[:, None] + np.arange(width)].astype(np.int64)
            pending = (pend @ (1 << np.arange(width, dtype=np.int64))).tolist()
            pi = 0
        code = pending[pi]
        pi += 1
        bitpos += width
        if code == clear:
            width = mcs + 1
            table = [[i] for i in range(clear)]
            table += [None, None]
            next_code = end + 1
            prev = None
            pending, pi = [], 0  # width may differ: re-read
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise NotImplementedError("invalid GIF LZW code")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
                pending, pi = [], 0  # subsequent codes are wider
        prev = entry
    if len(out) < expected:
        raise NotImplementedError("GIF LZW stream ended early")
    return out[:expected]


def _decode_gif(payload: bytes):
    """Pure-Python decode of a GIF87a/89a first frame: logical screen
    descriptor, global/local color table, extension-block skip, and
    the LZW-compressed index stream (:func:`_lzw_decode` — GIF's
    entropy coder, LSB-first variable-width codes), with Adam-style
    4-pass deinterlacing when flagged.  The third genuinely
    entropy-coded format decoded with no external codec.  Returns
    (h, w, 3) uint8 via palette lookup."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF header")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise NotImplementedError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, iw, ih, p2 = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = gct
        if p2 & 0x80:
            n = 2 << (p2 & 7)
            ct = payload[pos : pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise NotImplementedError("GIF image without a color table")
        if not (0 < iw <= 1 << 16 and 0 < ih <= 1 << 16):
            raise NotImplementedError("implausible GIF dimensions")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = np.array(
            _lzw_decode(bytes(data), mcs, iw * ih), dtype=np.int32
        ).reshape(ih, iw)
        if p2 & 0x40:  # interlaced: 4-pass row order
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            out_rows = np.zeros_like(idx)
            out_rows[order] = idx
            idx = out_rows
        pal = np.frombuffer(ct, np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        if pal.size == 0 or int(idx.max()) >= len(pal):
            raise NotImplementedError("GIF palette index out of range")
        return pal[idx]  # first frame only
    raise NotImplementedError("GIF contains no image block")


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegBits:
    """MSB-first bit reader over a byte-unstuffed entropy segment.

    Keeps a small integer accumulator refilled a byte at a time so a
    multi-bit read is one shift/mask instead of a per-bit loop — the
    entropy read is the decoder's hot path (one call per Huffman
    symbol / magnitude field, thousands per image)."""

    __slots__ = ("data", "pos", "acc", "nacc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nacc = 0
        self.n = len(data)

    def read_bit(self) -> int:
        if self.nacc == 0:
            if self.pos >= self.n:
                raise NotImplementedError("JPEG entropy stream truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nacc = 8
        self.nacc -= 1
        return (self.acc >> self.nacc) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nacc < n:
            if self.pos >= self.n:
                raise NotImplementedError("JPEG entropy stream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nacc += 8
        self.nacc -= n
        v = (self.acc >> self.nacc) & ((1 << n) - 1)
        self.acc &= (1 << self.nacc) - 1
        return v

    def bits_left(self) -> int:
        return self.nacc + 8 * (self.n - self.pos)

    def peek_bits(self, n: int) -> int:
        """Next n bits without consuming (caller checked bits_left)."""
        while self.nacc < n:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nacc += 8
        return (self.acc >> (self.nacc - n)) & ((1 << n) - 1)

    def skip_bits(self, n: int) -> None:
        self.nacc -= n
        self.acc &= (1 << self.nacc) - 1


class _JpegHuff:
    """Canonical Huffman table with a peek-maxlen LUT: one table
    lookup decodes a whole symbol (vs 1 bit-read + dict probe per
    code bit).  The (length, code) dict is kept for the stream-tail
    case where fewer than maxlen bits remain."""

    __slots__ = ("codes", "lut", "maxlen")

    def __init__(self, codes: dict):
        self.codes = codes
        self.maxlen = max((l for l, _ in codes), default=1)
        lut = [None] * (1 << self.maxlen)
        for (length, code), sym in codes.items():
            shift = self.maxlen - length
            base = code << shift
            for fill in range(1 << shift):
                lut[base | fill] = (sym, length)
        self.lut = lut


def _jpeg_huff_decode(bits: _JpegBits, table: "_JpegHuff") -> int:
    if bits.bits_left() >= table.maxlen:
        ent = table.lut[bits.peek_bits(table.maxlen)]
        if ent is None:
            raise NotImplementedError("invalid JPEG Huffman code")
        bits.skip_bits(ent[1])
        return ent[0]
    codes = table.codes
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | bits.read_bit()
        length += 1
        sym = codes.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_unstuff(payload: bytes, start: int):
    """Unstuff one entropy-coded interval starting at ``start``:
    returns (segments split at restart markers, index of the next
    marker's 0xFF byte)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF and i + 1 < len(payload):
            nxt = payload[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next real marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _decode_jpeg(payload: bytes):
    """Pure-Python/numpy decode of Huffman JPEG — BASELINE sequential
    (SOF0/1) and PROGRESSIVE (SOF2): marker walk, DQT/DHT canonical
    table builds, byte-unstuffed entropy read with restart handling,
    and per-scan coefficient accumulation — baseline fills each
    block's full spectrum in one scan; progressive layers DC
    first/refinement scans and per-component spectral-band AC scans
    with EOB-run and successive-approximation correction bits.  All
    scans land in per-component coefficient planes, then one shared
    assembly pass dequantizes, runs the separable float 8×8 IDCT,
    reassembles sampling factors with replication upsampling, and
    applies JFIF YCbCr→RGB.  Arithmetic-coded and 12-bit variants
    raise — the remaining (rare) seam.  Returns (h, w, ch) uint8."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG SOI")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _JpegHuff] = {}
    frame = None
    progressive = False
    restart_interval = 0
    pos = 2
    # per-component raw coefficient planes: cid -> (by, bx, 64) float64
    coefs: dict[int, "np.ndarray"] = {}
    geom: dict[int, tuple] = {}  # cid -> (blocks_y, blocks_x, hs, vs, tq)
    pred: dict[int, int] = {}
    hmax = vmax = mcux = mcuy = 0

    def init_planes():
        nonlocal hmax, vmax, mcux, mcuy
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for cid, hs, vs, tq in comps:
            by, bx = mcuy * vs, mcux * hs
            coefs[cid] = np.zeros((by, bx, 64), dtype=np.float64)
            geom[cid] = (by, bx, hs, vs, tq)

    def decode_dc_first(bits, cid, dc_t, al, byi, bxi):
        t = _jpeg_huff_decode(bits, huff[(0, dc_t)])
        diff = _jpeg_extend(bits.read_bits(t), t)
        pred[cid] += diff
        coefs[cid][byi, bxi, 0] = pred[cid] << al

    def decode_block_baseline(bits, cid, dc_t, ac_t, byi, bxi):
        decode_dc_first(bits, cid, dc_t, 0, byi, bxi)
        blk = coefs[cid][byi, bxi]
        k = 0
        while k < 63:
            rs = _jpeg_huff_decode(bits, huff[(1, ac_t)])
            if rs == 0:
                break  # EOB
            r, sz = rs >> 4, rs & 15
            if rs == 0xF0:
                k += 16
                continue
            k += r + 1
            if k > 63:
                raise NotImplementedError("JPEG AC index overflow")
            blk[_ZIGZAG[k]] = _jpeg_extend(bits.read_bits(sz), sz)

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len, = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        nxt = pos + 2 + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qt[tq] = list(seg[i : i + 64])
                    i += 64
                else:
                    qt[tq] = list(struct.unpack_from(f">{64}H", seg, i))
                    i += 128
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"no codec for {prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", seg, 6 + c * 3)
                comps.append((cid, samp >> 4, samp & 15, tq))
            frame = (h, w, comps)
            if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
                raise NotImplementedError("implausible JPEG dimensions")
            init_planes()
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "no codec for lossless/arithmetic JPEG variants"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                i += 17
                table: dict = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = seg[i]
                        code += 1
                        i += 1
                    code <<= 1
                huff[(tc, th)] = _JpegHuff(table)
        elif marker == 0xDD:  # DRI
            restart_interval, = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — one scan (several in progressive)
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            ns = seg[0]
            sel = []
            for c in range(ns):
                sel.append((seg[1 + c * 2], seg[2 + c * 2]))
            ss, se, a = seg[1 + ns * 2], seg[2 + ns * 2], seg[3 + ns * 2]
            ah, al = a >> 4, a & 15
            segments, nxt = _jpeg_unstuff(payload, pos + 2 + seg_len)
            h, w, comps = frame
            byid = {c[0]: c for c in comps}
            if ns > 1 or (not progressive):
                # interleaved MCU scan (baseline full-spectrum, or
                # progressive DC when ss == 0)
                for cid, _ in sel:
                    pred[cid] = 0
                seg_idx = 0
                bits = _JpegBits(segments[0])
                mcu_count = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if (
                            restart_interval
                            and mcu_count
                            and mcu_count % restart_interval == 0
                        ):
                            seg_idx += 1
                            bits = _JpegBits(segments[seg_idx])
                            for cid, _ in sel:
                                pred[cid] = 0
                        mcu_count += 1
                        for cid, tabs in sel:
                            _, hs, vs, _tq = byid[cid]
                            for by in range(vs):
                                for bx in range(hs):
                                    byi = my * vs + by
                                    bxi = mx * hs + bx
                                    if not progressive:
                                        decode_block_baseline(
                                            bits, cid, tabs >> 4,
                                            tabs & 15, byi, bxi,
                                        )
                                    elif ss == 0 and ah == 0:
                                        decode_dc_first(
                                            bits, cid, tabs >> 4, al,
                                            byi, bxi,
                                        )
                                    elif ss == 0:
                                        if bits.read_bit():
                                            blk = coefs[cid][byi, bxi]
                                            blk[0] = (
                                                int(blk[0]) | (1 << al)
                                                if blk[0] >= 0
                                                else -(
                                                    (-int(blk[0]))
                                                    | (1 << al)
                                                )
                                            )
                                    else:
                                        raise NotImplementedError(
                                            "interleaved AC progressive scan"
                                        )
            else:
                # non-interleaved single-component scan
                cid, tabs = sel[0]
                _, hs, vs, _tq = byid[cid]
                cw = -(-(w * hs) // hmax)
                chh = -(-(h * vs) // vmax)
                nbx = -(-cw // 8)
                nby = -(-chh // 8)
                pred[cid] = 0
                seg_idx = 0
                bits = _JpegBits(segments[0])
                eobrun = 0
                blk_count = 0
                for byi in range(nby):
                    for bxi in range(nbx):
                        if (
                            restart_interval
                            and blk_count
                            and blk_count % restart_interval == 0
                        ):
                            seg_idx += 1
                            bits = _JpegBits(segments[seg_idx])
                            pred[cid] = 0
                            eobrun = 0
                        blk_count += 1
                        blk = coefs[cid][byi, bxi]
                        if ss == 0 and ah == 0:
                            decode_dc_first(bits, cid, tabs >> 4, al,
                                            byi, bxi)
                        elif ss == 0:
                            if bits.read_bit():
                                blk[0] = (
                                    int(blk[0]) | (1 << al)
                                    if blk[0] >= 0
                                    else -((-int(blk[0])) | (1 << al))
                                )
                        elif ah == 0:
                            # AC first scan with EOB runs
                            if eobrun > 0:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                rs = _jpeg_huff_decode(
                                    bits, huff[(1, tabs & 15)]
                                )
                                r, sz = rs >> 4, rs & 15
                                if sz == 0:
                                    if r < 15:
                                        eobrun = (1 << r) - 1
                                        if r:
                                            eobrun += bits.read_bits(r)
                                        break
                                    k += 16  # ZRL
                                    continue
                                k += r
                                if k > se:
                                    raise NotImplementedError(
                                        "JPEG AC band overflow"
                                    )
                                blk[_ZIGZAG[k]] = (
                                    _jpeg_extend(bits.read_bits(sz), sz)
                                    << al
                                )
                                k += 1
                        else:
                            # AC refinement scan
                            eobrun = _jpeg_ac_refine(
                                bits, huff[(1, tabs & 15)], blk,
                                ss, se, al, eobrun,
                            )
            pos = nxt
            continue
        pos = nxt
    if frame is None:
        raise NotImplementedError("JPEG missing SOF")
    # --- shared assembly: dequantize, IDCT, upsample, color space ---
    h, w, comps = frame
    xs = np.arange(8)
    M = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16) / 2.0
    M[0, :] /= np.sqrt(2.0)
    out_planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise NotImplementedError("JPEG missing quantization table")
        q = np.zeros(64, dtype=np.float64)
        zz = np.array(_ZIGZAG)
        q[zz] = np.array(qt[tq], dtype=np.float64)
        by, bx, *_ = geom[cid]
        cf = (coefs[cid] * q).reshape(by * bx, 8, 8)  # dequantize
        # batched separable IDCT: two broadcast matmuls over every
        # block of the component instead of a per-block Python loop
        # (the loop form spent ~5µs of dispatch per 8×8 matmul pair;
        # einsum would re-derive its contraction path per payload)
        blocks = (M.T @ cf) @ M + 128.0
        plane = (
            blocks.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return g.reshape(h, w, 1)
    if len(out_planes) != 3:
        raise NotImplementedError(
            f"no codec for {len(out_planes)}-component JPEG"
        )
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_ac_refine(bits, table, blk, ss, se, al, eobrun):
    """Progressive AC successive-approximation refinement (ITU T.81
    G.1.2.3): existing nonzero coefficients in the band absorb one
    correction bit each as they are passed; new coefficients appear
    as ±(1 << al) after a run of zero-history positions; EOB runs
    still refine the nonzero history they skip over."""
    bit = 1 << al

    def correct(k):
        v = int(blk[_ZIGZAG[k]])
        if v and bits.read_bit():
            if v > 0 and not (v & bit):
                blk[_ZIGZAG[k]] = v + bit
            elif v < 0 and not ((-v) & bit):
                blk[_ZIGZAG[k]] = v - bit

    if eobrun > 0:
        # block consumed by a pending EOB run: refine the whole band's
        # nonzero history, no symbols read
        for i in range(ss, se + 1):
            correct(i)
        return eobrun - 1
    k = ss
    ended_by_eob = False
    while k <= se:
        rs = _jpeg_huff_decode(bits, table)
        r, sz = rs >> 4, rs & 15
        newval = 0
        if sz == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.read_bits(r)
                ended_by_eob = True
                break
            # ZRL: skip 16 zero-history positions (refining en route)
        else:
            if sz != 1:
                raise NotImplementedError("JPEG refinement size != 1")
            newval = bit if bits.read_bit() else -bit
        while k <= se:
            v = int(blk[_ZIGZAG[k]])
            if v:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            blk[_ZIGZAG[k]] = newval
        k += 1
    if ended_by_eob:
        # this block's EOB refines its remaining nonzero history
        for i in range(k, se + 1):
            correct(i)
    return eobrun

def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode/feature-extract kernel.

    Byte-level decode is REAL: format sniffing (magic bytes), md5,
    exact moment statistics from integer power sums, Simpson collision
    index, distinct-byte census.  Float ops mirror the oracle SQL
    operation-for-operation (exact int64 sums → one IEEE division per
    feature, ``sqrt`` is IEEE-correctly-rounded), so results are
    bit-identical across engines.  If the sniffer identifies an
    image/audio/video container, pixel/sample decode would need a codec
    this container lacks → NotImplementedError (the seam where
    PIL/libav plug in).  Arrow batching, schema contract, and
    per-partition iteration are the production path either way.
    """
    import hashlib
    import math
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    for pdf in batches:
        rows = {
            "doc_id": [], "media_format": [], "n_bytes": [], "md5_hex": [],
            "byte_mean": [], "byte_std": [], "simpson": [],
            "distinct_bytes": [], "byte_min": [], "byte_max": [], "status": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            fmt = sniff_format(payload)
            # Per-row fault isolation: at corpus scale corrupt or
            # unsupported files are certain, and one bad payload must
            # NOT fail the Spark task — it degrades to byte statistics
            # with a status the pipeline can filter/alert on.
            # codec_missing = the documented NotImplementedError seam
            # (format needs a codec this container lacks, or a variant
            # outside a decoder's profile); decode_error = a payload
            # that lied about its container (truncated/corrupt bytes).
            try:
                if fmt in CODEC_REQUIRED:
                    raise NotImplementedError(
                        f"no codec for {fmt!r}: byte-level features "
                        "only; plug a decoder in here"
                    )
                if fmt in ("image/bmp", "image/ppm", "image/png",
                           "image/jpeg", "image/gif"):
                    # real pixel decode: stats run over the decoded
                    # pixel bytes, not the container bytes (md5 /
                    # n_bytes still describe the file identity)
                    dec = {
                        "image/bmp": _decode_bmp,
                        "image/ppm": _decode_ppm,
                        "image/png": _decode_png,
                        "image/jpeg": _decode_jpeg,
                        "image/gif": _decode_gif,
                    }[fmt]
                    b = dec(payload).astype(np.int64).ravel()
                    status = "decoded_pixels"
                elif fmt == "audio/wav":
                    # real sample decode: amplitude statistics over
                    # PCM samples (16-bit signed or 8-bit unsigned)
                    b = _decode_wav(payload)
                    status = "decoded_samples"
                else:
                    b = np.frombuffer(payload, dtype=np.uint8).astype(
                        np.int64
                    )
                    status = "decoded_bytes"
            except NotImplementedError:
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                status = "codec_missing"
            except (ValueError, IndexError, KeyError, OverflowError,
                    EOFError, MemoryError, _struct.error, _zlib.error):
                # malformed container bytes — never let one corrupt
                # file kill the batch
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                status = "decode_error"
            n = int(b.size)
            s, ss = int(b.sum()), int((b * b).sum())
            # distinct-value census: bincount needs non-negative small
            # values; 16-bit samples use the unique path
            if b.size and (b.min() < 0 or b.max() > 255):
                counts = np.unique(b, return_counts=True)[1]
            else:
                counts = np.bincount(b, minlength=256)
            c2 = int((counts.astype(np.int64) ** 2).sum())
            # op-order mirrors the oracle SQL exactly (see O_DECODE)
            mean = s / n
            var = max(ss / n - (s / n) * (s / n), 0.0)
            rows["doc_id"].append(doc_id)
            rows["media_format"].append(fmt)
            rows["n_bytes"].append(len(payload))
            rows["md5_hex"].append(hashlib.md5(payload).hexdigest())
            rows["byte_mean"].append(mean)
            rows["byte_std"].append(math.sqrt(var))
            rows["simpson"].append(c2 / (n * n))
            rows["distinct_bytes"].append(int((counts > 0).sum()))
            rows["byte_min"].append(int(b.min()))
            rows["byte_max"].append(int(b.max()))
            rows["status"].append(status)
        yield pd.DataFrame(rows)


DECODE_SCHEMA = (
    "doc_id long, media_format string, n_bytes long, md5_hex string, "
    "byte_mean double, byte_std double, simpson double, "
    "distinct_bytes long, byte_min int, byte_max int, status string"
)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline: binary payloads → mapInPandas kernel → typed
    per-document byte features.  Fully value-checked: every output
    column replays exactly in the DuckDB oracle (O_DECODE)."""
    d = with_payload(load_table(spark, sf_dir, "documents"))
    out = d.select("doc_id", "payload").mapInPandas(
        decode_features, schema=DECODE_SCHEMA
    )
    return out.select(
        "doc_id",
        "media_format",
        "n_bytes",
        "md5_hex",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round("byte_std", 6).alias("byte_std"),
        F.round("simpson", 6).alias("simpson"),
        "distinct_bytes",
        "byte_min",
        "byte_max",
        "status",
    ).orderBy("doc_id")


O_DECODE = """
WITH hx AS (
  -- TRUE byte stream: hex(encode(text)) then two hex digits per byte,
  -- so multi-byte UTF-8 code points contribute each of their bytes
  -- exactly as the mapInPandas kernel sees them (characters-as-bytes
  -- would silently drift on any non-ASCII document)
  SELECT doc_id, hex(encode(text)) AS h,
         unnest(range(1, octet_length(encode(text)) + 1)) AS i
  FROM documents),
bytes AS (
  SELECT doc_id,
         (CASE WHEN u1 >= 65 THEN u1 - 55 ELSE u1 - 48 END) * 16
           + (CASE WHEN u2 >= 65 THEN u2 - 55 ELSE u2 - 48 END) AS b
  FROM (SELECT doc_id,
               unicode(substring(h, CAST(2 * i - 1 AS INT), 1)) AS u1,
               unicode(substring(h, CAST(2 * i AS INT), 1)) AS u2
        FROM hx)),
hist AS (SELECT doc_id, b, COUNT(*) AS c FROM bytes GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(b * c) AS BIGINT) AS s,
         CAST(SUM(b * b * c) AS BIGINT) AS ss,
         CAST(SUM(c * c) AS BIGINT) AS c2,
         CAST(COUNT(*) AS BIGINT) AS distinct_bytes,
         CAST(MIN(b) AS INT) AS byte_min,
         CAST(MAX(b) AS INT) AS byte_max,
         CAST(SUM(CASE WHEN (b BETWEEN 32 AND 126) OR b IN (9, 10, 13)
                       THEN 0 ELSE c END) AS BIGINT) AS nonprintable
  FROM hist GROUP BY doc_id)
SELECT d.doc_id,
       CASE WHEN a.nonprintable = 0 THEN 'text/plain'
            ELSE 'application/octet-stream' END AS media_format,
       a.n AS n_bytes,
       md5(d.text) AS md5_hex,
       round(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE), 6) AS byte_mean,
       round(sqrt(greatest(
         CAST(a.ss AS DOUBLE) / CAST(a.n AS DOUBLE)
           - (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
             * (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)), 0.0)), 6)
         AS byte_std,
       round(CAST(a.c2 AS DOUBLE) / CAST(a.n * a.n AS DOUBLE), 6) AS simpson,
       a.distinct_bytes,
       a.byte_min,
       a.byte_max,
       'decoded_bytes' AS status
FROM documents d JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


FRAME_BYTES = 64
FRAME_STRIDE = 4


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: treat the payload as a
    sequence of fixed-size frames and keep every 4th (the video
    keyframe-sampling shape).  Pure Catalyst — ``explode(sequence(...))``
    fans each payload out to its sampled frame indexes and binary
    ``substring`` slices the frame, so sampling runs JVM-side with no
    Python in the row path (a real codec only needs to replace the
    slice with a decode of it, as in :func:`decode_features`).

    Oracle note: payloads are UTF-8 of the ASCII-only fixture text, so
    DuckDB's varchar ``substring``/``sha256`` see identical bytes.
    """
    d = with_payload(load_table(spark, sf_dir, "documents"))
    n_frames = f"(octet_length(payload) + {FRAME_BYTES - 1}) div {FRAME_BYTES}"
    frame = f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})"
    return (
        d.select(
            "doc_id",
            "payload",
            F.explode(
                F.expr(f"sequence(0L, {n_frames} - 1, {FRAME_STRIDE})")
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.sha2(F.expr(frame), 256).alias("frame_sha"),
            F.octet_length(F.expr(frame)).alias("frame_bytes"),
        )
        .orderBy("doc_id", "frame_idx")
    )


O_FRAME_SAMPLE = f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, (length(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES},
                      {FRAME_STRIDE})) AS frame_idx
  FROM documents)
SELECT doc_id, frame_idx,
       sha256(substring(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES})) AS frame_sha,
       length(substring(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES})) AS frame_bytes
FROM f ORDER BY doc_id, frame_idx
"""


def _encode_png_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas encoder: wrap each document's UTF-8 bytes as a
    single-row 8-bit grayscale PNG (filter 0 scanline, one zlib
    stream) — a REAL, spec-valid PNG whose pixel values ARE the text
    bytes.  Deterministic: zlib.compress at the default level is
    byte-stable for fixed input."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    for pdf in batches:
        payloads = []
        for text in pdf["text"]:
            raw = str(text).encode("utf-8")
            ihdr = struct.pack(">IIBBBBB", len(raw), 1, 8, 0, 0, 0, 0)
            payloads.append(
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" + raw))
                + chunk(b"IEND", b"")
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "payload": payloads}
        )


def q_multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PNG decoder itself under the differential gate: every
    document's bytes are encoded as a real zlib-compressed grayscale
    PNG (mapInPandas), then the decode kernel must sniff image/png,
    inflate + unfilter the scanline, and produce PIXEL statistics —
    which, for this construction, equal the original text's byte
    statistics, so the DuckDB oracle value-checks the whole decode
    path without needing a codec.  Container-level columns (md5,
    n_bytes) are excluded — they describe the PNG wrapper."""
    d = docs_for_codec(spark, sf_dir)
    out = d.mapInPandas(
        _fused_roundtrip(_encode_png_kernel, "payload"),
        schema=DECODE_SCHEMA,
    )
    return _decoded_stats(out)


O_PNG_ROUNDTRIP = """
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h,
         unnest(range(1, octet_length(encode(text)) + 1)) AS i
  FROM documents),
bytes AS (
  SELECT doc_id,
         (CASE WHEN u1 >= 65 THEN u1 - 55 ELSE u1 - 48 END) * 16
           + (CASE WHEN u2 >= 65 THEN u2 - 55 ELSE u2 - 48 END) AS b
  FROM (SELECT doc_id,
               unicode(substring(h, CAST(2 * i - 1 AS INT), 1)) AS u1,
               unicode(substring(h, CAST(2 * i AS INT), 1)) AS u2
        FROM hx)),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b) AS BIGINT) AS s,
         CAST(SUM(b * b) AS BIGINT) AS ss,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS distinct_bytes,
         CAST(MIN(b) AS INT) AS byte_min,
         CAST(MAX(b) AS INT) AS byte_max
  FROM bytes GROUP BY doc_id)
SELECT doc_id, 'image/png' AS media_format,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS byte_mean,
       round(sqrt(greatest(
         CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)), 6)
         AS byte_std,
       distinct_bytes, byte_min, byte_max,
       'decoded_pixels' AS status
FROM agg
ORDER BY doc_id
"""


JPEG_RT_BYTES = 64  # bytes per document carried through the JPEG gate


def _encode_jpeg_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas encoder: the first JPEG_RT_BYTES of each document
    become one flat 8×8 block each in a baseline grayscale JPEG —
    DC = (b − 128)·8 with an all-ones quantization table, so the
    decoder's IDCT returns exactly ``b`` for every pixel of the block
    (a LOSSLESS construction through a normally-lossy format).  DC
    diffs are Huffman-coded with a 12-symbol uniform-4-bit canonical
    table; ACs are all EOB."""
    import struct
    import zlib as _z  # noqa: F401  (parity with the PNG kernel imports)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    # canonical tables: DC cats 0..11 all at code length 4; AC EOB at 1
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dht_dc = seg(0xC4, bytes([0x00] + dc_counts + list(range(12))))
    dht_ac = seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0x00]))
    dqt = seg(0xDB, bytes([0x00] + [1] * 64))

    for pdf in batches:
        payloads = []
        for text in pdf["text"]:
            raw = str(text).encode("utf-8")[:JPEG_RT_BYTES] or b"\x00"
            n = len(raw)
            sof = seg(
                0xC0,
                struct.pack(">BHHB", 8, 8, 8 * n, 1) + bytes([1, 0x11, 0]),
            )
            sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            # MSB-first bitstream as one big int (acc<<w | field per
            # block — 3 int ops instead of w per-bit list appends);
            # big-endian to_bytes IS the MSB-first packing, and byte
            # stuffing is a single bytes.replace
            acc, nbits = 0, 0
            pred = 0
            for b in raw:
                dc = (b - 128) * 8
                diff = dc - pred
                pred = dc
                cat = diff.bit_length() if diff else 0
                if cat:
                    v = diff if diff > 0 else diff + (1 << cat) - 1
                    # 4-bit DC code (= category) + cat value bits + EOB
                    acc = (acc << (5 + cat)) | (cat << (cat + 1)) | (v << 1)
                    nbits += 5 + cat
                else:
                    acc = acc << 5  # cat 0 code + EOB
                    nbits += 5
            pad = (-nbits) % 8
            acc = (acc << pad) | ((1 << pad) - 1)
            nbits += pad
            data = acc.to_bytes(nbits // 8, "big").replace(
                b"\xff", b"\xff\x00"
            )
            payloads.append(
                b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
                + data + b"\xff\xd9"
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def q_multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JPEG decoder under the differential gate: each document's
    first 64 bytes ride through a real baseline JPEG (Huffman DC
    coding, byte stuffing, IDCT) as flat blocks and come back exactly
    — pixel statistics equal the byte statistics of the truncated
    text, value-checked by DuckDB."""
    d = docs_for_codec(spark, sf_dir)
    out = d.mapInPandas(
        _fused_roundtrip(_encode_jpeg_kernel, "payload"),
        schema=DECODE_SCHEMA,
    )
    return _decoded_stats(out)


O_JPEG_ROUNDTRIP = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h,
         unnest(range(1, least(octet_length(encode(text)),
                               {JPEG_RT_BYTES}) + 1)) AS i
  FROM documents),
bytes AS (
  SELECT doc_id,
         (CASE WHEN u1 >= 65 THEN u1 - 55 ELSE u1 - 48 END) * 16
           + (CASE WHEN u2 >= 65 THEN u2 - 55 ELSE u2 - 48 END) AS b
  FROM (SELECT doc_id,
               unicode(substring(h, CAST(2 * i - 1 AS INT), 1)) AS u1,
               unicode(substring(h, CAST(2 * i AS INT), 1)) AS u2
        FROM hx)),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b) AS BIGINT) AS s,
         CAST(SUM(b * b) AS BIGINT) AS ss,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS distinct_bytes,
         CAST(MIN(b) AS INT) AS byte_min,
         CAST(MAX(b) AS INT) AS byte_max
  FROM bytes GROUP BY doc_id)
SELECT doc_id, 'image/jpeg' AS media_format,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS byte_mean,
       round(sqrt(greatest(
         CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)), 6)
         AS byte_std,
       distinct_bytes, byte_min, byte_max,
       'decoded_pixels' AS status
FROM agg
ORDER BY doc_id
"""


GIF_RT_BYTES = 256  # bytes per document carried through the GIF gate


def _encode_media_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas encoder for the WAV and GIF gates: each document's
    bytes become (a) an 8-bit PCM WAV whose samples ARE the bytes and
    (b) a GIF whose LZW-coded pixel indices are the first
    GIF_RT_BYTES bytes over an identity grayscale palette — both
    lossless by construction.  The GIF writer emits root codes only
    (valid LZW) while mirroring the decoder's dictionary growth to
    bump the variable code width at the right moments."""
    import struct

    def wav_of(raw: bytes) -> bytes:
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def gif_of(raw: bytes) -> bytes:
        n = len(raw)
        pal = bytes(v for b in range(256) for v in (b, b, b))
        # LSB-first bitstream as one big int: bit k of the stream is
        # bit k of the int, so little-endian to_bytes IS the GIF
        # packing — each code is one shift-or instead of a per-bit
        # list append
        acc, nbits = 0, 0

        def put(code: int, width: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width

        mcs = 8
        clear, end = 1 << mcs, (1 << mcs) + 1
        width = mcs + 1
        put(clear, width)
        next_code = end + 1
        prev_emitted = False
        for b in raw:
            put(b, width)
            if prev_emitted and next_code < 4096:
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev_emitted = True
        put(end, width)
        data = acc.to_bytes((nbits + 7) // 8, "little")
        sub = bytearray()
        for i in range(0, len(data), 255):
            blockdata = data[i : i + 255]
            sub += bytes([len(blockdata)]) + blockdata
        return (
            b"GIF89a"
            + struct.pack("<HHBBB", n, 1, 0x80 | 7, 0, 0)  # 256-entry GCT
            + pal
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, n, 1, 0)
            + bytes([mcs]) + bytes(sub) + b"\x00" + b"\x3b"
        )

    for pdf in batches:
        wavs, gifs = [], []
        for text in pdf["text"]:
            raw = str(text).encode("utf-8")
            wavs.append(wav_of(raw or b"\x00"))
            gifs.append(gif_of((raw or b"\x00")[:GIF_RT_BYTES]))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "wav": wavs, "gif": gifs}
        )


def _fused_roundtrip(encode_kernel, col: str):
    """Compose encode → decode inside ONE Python evaluation.

    Each mapInPandas boundary pays a JVM↔Python Arrow transpose of
    every payload byte plus a per-task Python round trip (guide §4.1);
    the decode input here IS the encode output, so routing it back
    through the JVM between the two kernels buys nothing.  Both
    kernels are the unchanged production functions — this wrapper only
    pipes one generator into the other, halving the Python boundary
    crossings of the roundtrip gates (measured r16: ~0.3–0.5 s per
    gate at sf0.1)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def encoded() -> Iterator[pd.DataFrame]:
            for pdf in encode_kernel(batches):
                yield pdf[["doc_id", col]].rename(columns={col: "payload"})

        return decode_features(encoded())

    return kernel


def _decoded_stats(out: DataFrame) -> DataFrame:
    return out.select(
        "doc_id",
        "media_format",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round("byte_std", 6).alias("byte_std"),
        "distinct_bytes",
        "byte_min",
        "byte_max",
        "status",
    ).orderBy("doc_id")


def q_multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAV chunk walk + 8-bit PCM sample decode under the gate:
    sample statistics equal the document's byte statistics."""
    d = docs_for_codec(spark, sf_dir)
    out = d.mapInPandas(
        _fused_roundtrip(_encode_media_kernel, "wav"), schema=DECODE_SCHEMA
    )
    return _decoded_stats(out)


def q_multimodal_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GIF variable-width LZW decode under the gate: pixel
    statistics over the identity-palette decode equal the byte
    statistics of the document's first GIF_RT_BYTES bytes (each byte
    replicated ×3 by the RGB palette — statistics are invariant)."""
    d = docs_for_codec(spark, sf_dir)
    out = d.mapInPandas(
        _fused_roundtrip(_encode_media_kernel, "gif"), schema=DECODE_SCHEMA
    )
    return _decoded_stats(out)


def _o_bytes_stats(limit_expr: str, fmt: str, status: str) -> str:
    return f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h,
         unnest(range(1, {limit_expr} + 1)) AS i
  FROM documents),
bytes AS (
  SELECT doc_id,
         (CASE WHEN u1 >= 65 THEN u1 - 55 ELSE u1 - 48 END) * 16
           + (CASE WHEN u2 >= 65 THEN u2 - 55 ELSE u2 - 48 END) AS b
  FROM (SELECT doc_id,
               unicode(substring(h, CAST(2 * i - 1 AS INT), 1)) AS u1,
               unicode(substring(h, CAST(2 * i AS INT), 1)) AS u2
        FROM hx)),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b) AS BIGINT) AS s,
         CAST(SUM(b * b) AS BIGINT) AS ss,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS distinct_bytes,
         CAST(MIN(b) AS INT) AS byte_min,
         CAST(MAX(b) AS INT) AS byte_max
  FROM bytes GROUP BY doc_id)
SELECT doc_id, '{fmt}' AS media_format,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS byte_mean,
       round(sqrt(greatest(
         CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)), 6)
         AS byte_std,
       distinct_bytes, byte_min, byte_max,
       '{status}' AS status
FROM agg
ORDER BY doc_id
"""


O_WAV_ROUNDTRIP = _o_bytes_stats(
    "octet_length(encode(text))", "audio/wav", "decoded_samples"
)
O_GIF_ROUNDTRIP = _o_bytes_stats(
    f"least(octet_length(encode(text)), {GIF_RT_BYTES})",
    "image/gif", "decoded_pixels",
)


QUERIES = {
    "multimodal_metadata": q_multimodal_metadata,
    "multimodal_decode_features": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_png_roundtrip": q_multimodal_png_roundtrip,
    "multimodal_jpeg_roundtrip": q_multimodal_jpeg_roundtrip,
    "multimodal_wav_roundtrip": q_multimodal_wav_roundtrip,
    "multimodal_gif_roundtrip": q_multimodal_gif_roundtrip,
}

ORACLES = {
    "multimodal_metadata": O_MULTIMODAL_META,
    # value-checked: the byte-level kernel mirrors O_DECODE's arithmetic
    # op-for-op (exact int sums, IEEE division/sqrt); only codec-needing
    # containers raise, and none exist in the fixtures by construction.
    "multimodal_decode_features": O_DECODE,
    "multimodal_frame_sample": O_FRAME_SAMPLE,
    "multimodal_png_roundtrip": O_PNG_ROUNDTRIP,
    "multimodal_jpeg_roundtrip": O_JPEG_ROUNDTRIP,
    "multimodal_wav_roundtrip": O_WAV_ROUNDTRIP,
    "multimodal_gif_roundtrip": O_GIF_ROUNDTRIP,
}
