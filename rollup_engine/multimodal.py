"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schema, partition-friendly layout, Arrow batch
shapes, mapInPandas UDF signatures) is real and tested.  Image HEADER
decode (width/height) is REAL for PNG/GIF/BMP/JPEG — pure stdlib byte
parsing (``parse_image_header``).  PIXEL decode is REAL for 8-bit
non-interlaced gray/RGB/RGBA PNG (``decode_png``: PNG's only
compression is DEFLATE = stdlib zlib) AND for GIF (``decode_gif``:
GIF's only compression is its LZW variant, implemented here directly —
variable-width codes, 12-bit cap, interlace passes) AND for
uncompressed 24/32-bit BMP (``decode_bmp``: raw bytes, no compression
at all), so three of the four formats' encode→decode→content-feature
paths (``encode_png``/``encode_gif``/``encode_bmp`` /
``pixel_feature``) run genuinely end-to-end with no image library.
BASELINE JPEG pixel decode is REAL too (``decode_jpeg``/
``encode_jpeg``: numpy matrix DCT, canonical Huffman, DC prediction,
restart markers, integer-ratio h×v chroma sampling incl. 4:2:0) — all FOUR
container formats decode to pixels with zero image libraries; it is a
correctness-first per-block implementation, sized for feature
extraction over bounded Arrow batches, not a SIMD codec.  AUDIO is
real as well: ``decode_wav``/``encode_wav`` (RIFF chunk walk, PCM
8/16-bit, any channel count) with ``audio_feature`` (duration/RMS/
peak/ZCR/spectral bands via numpy rFFT).  Model
embeddings still need libraries the sandbox lacks: for unrecognized
payloads ``_decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder exercises
the pipeline; exotic subsets (progressive JPEG, paletted/16-bit PNG
or BMP) yield real header dimensions with a payload-digest feature
stand-in.

Layout contract for 100 TB media tables: binaries ride in their own
column so Parquet keeps them in a separate chunk (column pruning means
metadata-only queries never touch the bytes); rows are processed in
bounded Arrow batches (``maxRecordsPerBatch`` caps batch memory =
batch_rows × max_media_size).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), True),  # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(df: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table: the
    utf-8 text bytes stand in for an encoded image payload."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit("image/fake").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def media_real_png(df: DataFrame, max_side: int = 24) -> DataFrame:
    """Deterministic media table of GENUINE PNG payloads, one per
    document: a seeded RGB gradient-plus-noise image whose size and
    content derive from doc_id.  Built batch-wise in mapInPandas (the
    encoder is pure numpy+zlib), so synthesis scales like any other
    Arrow stage."""
    from collections.abc import Iterator as _It

    def gen(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                rng = np.random.RandomState(int(did) % (2**31))
                w = 8 + int(rng.randint(0, max_side - 7))
                h = 8 + int(rng.randint(0, max_side - 7))
                gx = np.linspace(0, 255, w, dtype=np.float32)
                img = np.stack(
                    [
                        np.tile(gx, (h, 1)),
                        np.tile(np.linspace(0, 255, h)[:, None], (1, w)),
                        rng.randint(0, 256, size=(h, w)).astype(np.float32),
                    ],
                    axis=2,
                ).astype(np.uint8)
                payload = encode_png(img)
                rows.append(
                    {
                        "media_id": int(did),
                        "kind": "image",
                        "media": payload,
                        "mime": "image/png",
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def parse_image_header(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the container header — pure stdlib byte
    parsing, no image library.  Formats: PNG (IHDR, big-endian), GIF
    (87a/89a logical screen, little-endian), BMP (BITMAPINFOHEADER,
    little-endian; height may be negative for top-down rows), JPEG
    (first SOFn marker scan, big-endian).  Returns None when the
    payload is not a recognized image container."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h)
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h))
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # walk marker segments to the first start-of-frame
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            # JPEG permits runs of 0xFF fill bytes between segments
            # (ITU T.81 §B.1.1.2); the marker byte is the first
            # non-0xFF after the run.
            while i + 9 <= len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 9 > len(payload):
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h)
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    return None


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal REAL PNG encoder — pure stdlib (struct + zlib), no image
    library.  Accepts uint8 arrays shaped (h, w) grayscale, (h, w, 3)
    RGB, or (h, w, 4) RGBA; writes 8-bit, non-interlaced, filter-0
    rows.  Output opens in any standards-compliant viewer; used to
    synthesize genuine image payloads for the decode path's tests."""
    import struct
    import zlib

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """REAL full PNG pixel decode — pure stdlib (struct + zlib + the
    five standard unfilters), no image library: PNG's only compression
    is DEFLATE, which IS in the standard library, so "pixel decode
    needs pillow/opencv" is false for this format.  Supports the
    non-interlaced 8-bit gray/RGB/RGBA subset (the overwhelming bulk of
    real-world PNGs); palette/16-bit/interlaced raise ValueError with
    the reason.  CRCs are verified.  Returns uint8 (h, w, ch)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, hdr = 8, [], None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = hdr
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG subset (depth={depth} ctype={ctype} "
            f"interlace={interlace}): only 8-bit gray/RGB/RGBA, "
            "non-interlaced"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        row = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(ch, stride):
                row[x] = (row[x] + row[x - ch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal REAL GIF encoder — pure stdlib, no image library.
    Accepts uint8 (h, w, 3) RGB with ≤256 distinct colors (palette
    built from the data); emits one image block whose LZW stream
    resets the dictionary before every pixel code (the classic
    "uncompressed GIF" technique — larger, but standards-valid in any
    decoder).  ``interlace=True`` writes the 4-pass row order with the
    interlace flag set, exercising the decoder's deinterlacer."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif wants (h, w, 3) RGB")
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("more than 256 colors")
    pbits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    gct_n = 1 << pbits
    mcs = max(2, pbits)
    indices = idx.reshape(h, w)
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        indices = indices[order]
    # LSB-first bit packer over [CLEAR, px, CLEAR, px, ..., END]
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    acc = nbits = 0
    stream = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for px in indices.ravel():
        put(int(px))
        put(clear)  # dictionary never grows → width stays mcs+1
    put(end)
    if nbits:
        stream.append(acc & 0xFF)
    gct = palette.tobytes() + b"\x00\x00\x00" * (gct_n - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pbits - 1), 0, 0)
    out += gct
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, npix: int) -> bytes:
    """GIF-variant LZW (variable width, LSB-first, CLEAR/END codes,
    12-bit cap) — the only compression GIF uses, and it needs no
    library at all."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    acc = nbits = 0
    out = bytearray()
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = mcs + 1
                prev = None
                continue
            if code == end:
                return bytes(out[:npix])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("corrupt GIF LZW stream")
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= npix:
                return bytes(out[:npix])
    return bytes(out[:npix])


def decode_gif(payload: bytes) -> np.ndarray:
    """REAL full GIF pixel decode — pure stdlib LZW + palette lookup,
    no image library (GIF's only compression is its LZW variant;
    nothing about it needs a codec).  Decodes the FIRST image block
    (global or local palette, interlaced or not; extensions skipped),
    returns uint8 (h, w, 3) RGB."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(data), mcs, w * h), dtype=np.uint8
            )
            if len(idx) != w * h:
                raise ValueError("GIF pixel data length mismatch")
            rows = idx.reshape(h, w)
            if ipacked & 0x40:  # deinterlace (4 passes)
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(rows)
                de[order] = rows
                rows = de
            if rows.max(initial=0) >= len(pal):
                raise ValueError("GIF palette index out of range")
            return pal[rows]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image block")


def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal REAL BMP encoder — 24-bit BI_RGB, bottom-up, rows padded
    to 4 bytes (the classic uncompressed Windows bitmap)."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp wants (h, w, 3) RGB")
    h, w, _ = a.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        a[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL full BMP pixel decode — uncompressed (BI_RGB) 24/32-bit,
    bottom-up or top-down; pure struct + numpy byte shuffling (BMP has
    no compression to need a library for).  Returns uint8 (h, w, 3)."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h_raw, _planes, bpp, comp = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if hdr_size < 40 or comp != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP subset (hdr={hdr_size} bpp={bpp} comp={comp})"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(
        payload[offset : offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) → RGB



def _zigzag_order() -> list[tuple[int, int]]:
    """The standard JPEG 8x8 zigzag traversal, generated (not recited):
    anti-diagonals s = r+c in order; even s walks up-right (r
    descending), odd s walks down-left (r ascending)."""
    order = []
    for s in range(15):
        rs = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        order.extend((r, s - r) for r in rs)
    return order


_ZZ = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: block_dct = M @ B @ M.T is
    exactly the JPEG FDCT (T.81 A.3.3), and M.T @ C @ M the IDCT."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m *= 0.5
    m[0] /= np.sqrt(2)
    return m


_DCT_M = _dct_matrix()


def _huff_canonical(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """One-length canonical Huffman table over ``symbols``: every
    symbol gets the same code length L with 2^L > n (the all-ones code
    stays unused, as T.81 requires).  Returns (bits[1..16], vals,
    {symbol: (code, length)}) — valid DHT content any decoder accepts."""
    vals = sorted(set(symbols))
    n = len(vals)
    L = 1
    while (1 << L) <= n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    return bits, vals, {s: (i, L) for i, s in enumerate(vals)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(arr: np.ndarray) -> bytes:
    """Minimal REAL baseline JPEG encoder — pure numpy (matrix FDCT),
    no image library.  uint8 gray (h, w) or RGB (h, w, 3); 4:4:4, one
    all-ones quantization table (near-lossless: the only loss is DCT
    rounding, ≤ ~2/255 per pixel), canonical single-length Huffman
    tables declared in DHT.  Output decodes in any baseline viewer."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        comps = [a.astype(np.float64)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    blocks_per_comp = []
    for c in comps:
        p = np.empty((ph, pw))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]
        p[:, w:] = p[:, w - 1 : w]
        qb = []
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                blk = p[by : by + 8, bx : bx + 8] - 128.0
                d = _DCT_M @ blk @ _DCT_M.T
                qb.append(np.rint(d).astype(np.int32))
        blocks_per_comp.append(qb)

    # entropy symbols (DC categories; AC (run<<4)|size), per class
    dc_syms, ac_syms = [], []
    comp_seqs = []
    for qb in blocks_per_comp:
        prev = 0
        seq = []
        for blk in qb:
            zz = [int(blk[r, c]) for r, c in _ZZ]
            diff = zz[0] - prev
            prev = zz[0]
            t = _category(diff)
            dc_syms.append(t)
            entry = [("dc", t, diff)]
            run = 0
            last_nz = 0
            for i in range(1, 64):
                if zz[i] != 0:
                    last_nz = i
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    if run == 16:
                        ac_syms.append(0xF0)
                        entry.append(("ac", 0xF0, None))
                        run = 0
                    continue
                t = _category(zz[i])
                sym = (run << 4) | t
                ac_syms.append(sym)
                entry.append(("ac", sym, zz[i]))
                run = 0
            if last_nz < 63:
                ac_syms.append(0x00)  # EOB
                entry.append(("ac", 0x00, None))
            seq.append(entry)
        comp_seqs.append(seq)

    dc_bits, dc_vals, dc_map = _huff_canonical(dc_syms)
    ac_bits, ac_vals, ac_map = _huff_canonical(ac_syms)

    bw = _BitWriter()
    n_comp = len(comps)
    mcux = pw // 8
    mcuy = ph // 8
    # 4:4:4 interleaved MCU = one block per component
    idx = [0] * n_comp
    for _m in range(mcux * mcuy):
        for ci in range(n_comp):
            entry = comp_seqs[ci][idx[ci]]
            idx[ci] += 1
            for kind, sym, val in entry:
                code, ln = (dc_map if kind == "dc" else ac_map)[sym]
                bw.put(code, ln)
                if kind == "dc":
                    t = sym
                    if t:
                        bw.put(_extend_bits(val, t) & ((1 << t) - 1), t)
                elif sym not in (0x00, 0xF0):
                    t = sym & 0x0F
                    bw.put(_extend_bits(val, t) & ((1 << t) - 1), t)
    data = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    # DQT: precision 0, table id 0, all-ones values (near-lossless)
    out += seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, n_comp))
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, 0])  # sampling 1x1, qtable 0
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))  # DC id 0
    out += seg(0xC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals))  # AC id 0
    sos = bytearray([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += data
    out += b"\xff\xd9"
    return bytes(out)
class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    unstuffing; stops at any real marker (RSTn handled by the caller)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self) -> bool:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return True
            self.marker = nxt
            return False  # a real marker terminates the segment
        self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bits(self, k: int) -> int:
        while self.n < k:
            if not self._fill():
                # pad with 1s past the marker (T.81 allows the final
                # byte's pad bits to be consumed as 1s)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def align_and_skip_rst(self) -> None:
        # discard any pad bits, then consume the RSTn marker whether or
        # not the bit reader already stumbled onto it (_fill leaves pos
        # AT the 0xFF when it discovers a marker, so both cases skip 2)
        self.n = 0
        self.acc = 0
        if (
            self.pos + 1 < len(self.buf)
            and self.buf[self.pos] == 0xFF
            and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            self.marker = None


def _huff_decoder(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol map from a DHT (canonical order)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _read_symbol(br: "_BitReader", table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL baseline JPEG pixel decode — pure numpy, no image library:
    DHT canonical Huffman, DC prediction + EXTEND, AC run-length,
    dequant, inverse zigzag, matrix IDCT, chroma
    upsampling (integer-ratio h×v sampling factors: 4:4:4, 4:2:2,
    4:2:0, 4:1:1), YCbCr→RGB, restart markers.
    Baseline sequential (SOF0) only; progressive raises ValueError.
    Returns uint8 (h, w, 3) RGB (gray replicated)."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG segment alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0xC2,):
            raise ValueError("progressive JPEG not supported")
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tid] = np.array(list(body[i + 1 : i + 65]), np.float64)
                i += 65
        elif marker == 0xC0 or marker == 0xC1:
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            smap = {}
            for si in range(ns):
                cid, tables = body[1 + 2 * si], body[2 + 2 * si]
                smap[cid] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                payload, pos + 2 + ln, frame, qt, huff, smap,
                restart_interval,
            )
        pos += 2 + ln
    raise ValueError("JPEG contains no scan")


def _decode_scan(payload, pos, frame, qt, huff, smap, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, h8, v, _tq in comps:
        if h8 == 0 or v == 0 or hmax % h8 or vmax % v:
            raise ValueError(
                f"non-integer chroma upsampling ratio (factors {h8}x{v} "
                f"vs max {hmax}x{vmax}) — only integer-ratio sampling "
                "(4:4:4, 4:2:2, 4:2:0, 4:1:1) is supported"
            )
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * 8 * v, mcux * 8 * h8))
        for cid, h8, v, _tq in comps
    }
    zz_r = np.array([r for r, c in _ZZ])
    zz_c = np.array([c for r, c in _ZZ])
    br = _BitReader(payload, pos)
    pred = {cid: 0 for cid, *_ in comps}
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_skip_rst()
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cid, h8, v, tq in comps:
            dct_t, act_t = smap[cid]
            dc_table = huff[(0, dct_t)]
            ac_table = huff[(1, act_t)]
            q = qt[tq]
            for by in range(v):
                for bx in range(h8):
                    zz = np.zeros(64)
                    t = _read_symbol(br, dc_table)
                    diff = 0
                    if t:
                        raw = br.bits(t)
                        diff = raw if raw >= (1 << (t - 1)) else raw - (1 << t) + 1
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        sym = _read_symbol(br, ac_table)
                        if sym == 0x00:
                            break
                        if sym == 0xF0:
                            k += 16
                            continue
                        run, t = sym >> 4, sym & 0x0F
                        k += run
                        if k > 63 or t == 0:
                            raise ValueError("corrupt JPEG AC stream")
                        raw = br.bits(t)
                        zz[k] = raw if raw >= (1 << (t - 1)) else raw - (1 << t) + 1
                        k += 1
                    blk = np.zeros((8, 8))
                    blk[zz_r, zz_c] = zz * q
                    px = _DCT_M.T @ blk @ _DCT_M + 128.0
                    y0 = (my * v + by) * 8
                    x0 = (mx * h8 + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
    # upsample each component to full MCU-padded resolution, crop, mix
    full = []
    for cid, h8, v, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h8, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


def parse_mp4_header(payload: bytes) -> dict | None:
    """REAL MP4/ISO-BMFF metadata parse — recursive box walk, pure
    struct: ftyp brand, mvhd timescale/duration (v0 and v1), and the
    first video track's tkhd 16.16-fixed width/height.  Frame decode
    (H.264 etc.) is codec territory and stays out of scope; the
    metadata IS what a 100 TB video table filters and shards on.
    Returns {brand, duration_sec, width, height, n_tracks} or None."""
    import struct

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    info = {
        "brand": payload[8:12].decode("ascii", "replace"),
        "duration_sec": None,
        "width": None,
        "height": None,
        "n_tracks": 0,
    }

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < 8 or pos + size > hi:
                raise ValueError("corrupt MP4 box")
            if typ in (b"moov", b"trak"):
                if typ == b"trak":
                    info["n_tracks"] += 1
                walk(body, pos + size)
            elif typ == b"mvhd":
                v = payload[body]
                if v == 1:
                    ts, dur = struct.unpack(
                        ">IQ", payload[body + 20 : body + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", payload[body + 12 : body + 20]
                    )
                if ts:
                    info["duration_sec"] = round(dur / ts, 6)
            elif typ == b"tkhd" and info["width"] is None:
                # width sits after version+flags(4) + times/track/dur
                # (72 for v0, 84 for v1 — 64-bit times) incl. matrix
                v = payload[body]
                off = body + 4 + (84 if v == 1 else 72)
                w16, h16 = struct.unpack(">II", payload[off : off + 8])
                if w16 and h16:  # audio tracks carry 0×0
                    info["width"] = w16 >> 16
                    info["height"] = h16 >> 16
            pos += size
        if pos != hi:  # a trailing partial box = truncated file
            raise ValueError("truncated MP4")

    try:
        walk(0, len(payload))
    except (ValueError, struct.error):
        return None
    return info


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Minimal REAL WAV encoder — PCM int16 mono/multichannel RIFF,
    pure struct (WAV is a header plus raw samples; nothing to
    compress).  ``samples``: int16 (n,) or (n, channels)."""
    import struct

    a = np.ascontiguousarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL WAV decode — PCM 16-bit (any channel count) and 8-bit
    unsigned mono/stereo RIFF; returns (sample_rate, int16 (n, ch)).
    Chunk-walks the RIFF container (fmt may be preceded by JUNK/LIST
    chunks in the wild), pure struct + numpy."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if ch == 0:
        raise ValueError("WAV declares zero channels")
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV subset (format={audio_format} bits={bits}):"
            " PCM 8/16-bit only"
        )
    if bits == 16:
        arr = np.frombuffer(data[: len(data) // (2 * ch) * 2 * ch], "<i2")
    else:
        arr = (
            np.frombuffer(data[: len(data) // ch * ch], np.uint8).astype(
                np.int16
            )
            - 128
        ) * 256
    return rate, arr.reshape(-1, ch)


def audio_feature(rate: int, samples: np.ndarray) -> np.ndarray:
    """8-dim content feature from decoded PCM: duration, RMS, peak,
    zero-crossing rate, and 4 coarse spectral-band energies (numpy
    rFFT) — the audio analog of pixel_feature, deterministic."""
    x = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(x)
    dur = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    peak = float(np.abs(x).max()) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) if n else np.zeros(1)
    bands = np.array_split(spec, 4)
    e = np.array([float(np.sqrt(np.mean(b * b))) if len(b) else 0.0 for b in bands])
    return np.array([dur, rms, peak, zcr, *e], dtype=np.float32)


def pixel_feature(px: np.ndarray) -> np.ndarray:
    """8-dim REAL content feature from decoded pixels: per-channel mean
    and std (gray broadcast to 3 channels), overall luminance mean, and
    log-aspect — all in [0, 1]-ish ranges, deterministic."""
    x = px.astype(np.float64)
    if x.shape[2] == 1:
        x = np.repeat(x, 3, axis=2)
    rgb = x[:, :, :3]
    means = rgb.reshape(-1, 3).mean(axis=0) / 255.0
    stds = rgb.reshape(-1, 3).std(axis=0) / 255.0
    lum = float(rgb.mean()) / 255.0
    aspect = float(np.log1p(px.shape[1] / px.shape[0]))
    return np.array([*means, *stds, lum, aspect], dtype=np.float32)


def _digest_feature(digest: bytes) -> np.ndarray:
    """8-dim deterministic stand-in for a model embedding, derived from
    the payload digest (real content embeddings need a codec + model
    the sandbox lacks; the Spark-side shapes are identical)."""
    return (
        np.frombuffer(digest[:32], dtype=np.uint8)
        .reshape(8, 4)
        .sum(axis=1)
        .astype(np.float32)
        / 1020.0
    )


# Malformed payloads surface as more than ValueError: struct.error on
# truncated fixed fields, IndexError on exhausted byte walks,
# ZeroDivisionError on degenerate header values.  A corrupt payload in
# a batch must degrade to the documented stand-in, never kill the task.
import struct as _struct  # noqa: E402

_DECODE_ERRORS = (ValueError, _struct.error, IndexError, KeyError, ZeroDivisionError)


def _decode_image(payload: bytes, fake: bool) -> tuple[int, int, np.ndarray]:
    """Real header parse when the payload is a recognized image
    container; otherwise the deterministic fake decoder (``fake=True``)
    or NotImplementedError — full pixel decode needs an image library
    not present in this container."""
    digest = hashlib.sha256(payload).digest()
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            px = decode_png(payload)
            return px.shape[1], px.shape[0], pixel_feature(px)
        except _DECODE_ERRORS:
            # valid magic but outside the supported subset (palette/
            # 16-bit/interlaced) — dimensions from the header, digest
            # feature stand-in
            pass
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        try:
            px = decode_gif(payload)
            return px.shape[1], px.shape[0], pixel_feature(px)
        except _DECODE_ERRORS:
            # malformed or exotic GIF — header dims + digest stand-in
            pass
    if payload[:2] == b"BM":
        try:
            px = decode_bmp(payload)
            return px.shape[1], px.shape[0], pixel_feature(px)
        except _DECODE_ERRORS:
            # RLE/paletted/16-bit BMP — header dims + digest stand-in
            pass
    if payload[:2] == b"\xff\xd8":
        try:
            px = decode_jpeg(payload)
            return px.shape[1], px.shape[0], pixel_feature(px)
        except _DECODE_ERRORS:
            # progressive/arithmetic/corrupt JPEG — header dims +
            # digest stand-in
            pass
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            rate, samples = decode_wav(payload)
            # audio mapping: width = sample count, height = channels
            return (
                samples.shape[0],
                samples.shape[1],
                audio_feature(rate, samples),
            )
        except _DECODE_ERRORS:
            pass
    dims = parse_image_header(payload)
    if dims is not None:
        return dims[0], dims[1], _digest_feature(digest)
    if not fake:
        raise NotImplementedError(
            "unrecognized image container: PIXEL decode is real for "
            "PNG (stdlib zlib), GIF (stdlib LZW), BMP (raw bytes), "
            "and baseline JPEG (numpy DCT) — only payloads that are "
            "none of these reach this point; pass fake=True for the "
            "deterministic stub"
        )
    return 64 + digest[0], 64 + digest[1], _digest_feature(digest)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over bounded Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                b = bytes(payload) if payload is not None else b""
                w, h, feat = _decode_image(b, fake=fake)
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "width": w,
                        "height": h,
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "media").mapInPandas(run, FEATURE_SCHEMA)
