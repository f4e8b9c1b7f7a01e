"""Gorilla XOR float codec + delta-of-delta timestamp codec.

North-star storage tier: raw turn timestamps and metric streams are
compressed per (conv_id-hash, time-chunk) partition (chunks.py) with
these codecs, implemented as vectorized numpy kernels running inside
pandas UDFs — no per-value Python loops anywhere (BASELINE.json
input_hint), which classic single-bitstream Gorilla encoders cannot
avoid.  We therefore use a *split-plane* layout carrying exactly the
Gorilla information content:

- float stream (Gorilla XOR, after the paper's scheme): x[i] =
  bits(v[i]) XOR bits(v[i-1]); store per-value (leading-zero count,
  meaningful-length) planes as uint8 arrays and the meaningful bits as
  one packed bitstream.  x == 0 → zero meaningful bits, exactly
  Gorilla's '0' control case.
- timestamp stream (delta-of-delta): D[i] = (t[i]-t[i-1]) -
  (t[i-1]-t[i-2]); zigzag-encoded, per-value bit-width plane (0 for
  D==0, else minimal width) + packed bitstream.

Bit-exactness is the contract (NaN/Inf/-0.0 round-trip as raw bit
patterns); pinned by tests/test_codec.py.

Vectorization: variable-width emission uses the repeat/cumsum scatter —
bit j of value i lands at offset[i]+j computed wholly in numpy; decode
reverses with add.reduceat and bitwise_xor.accumulate / cumsum.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC_F = b"GXF1"
_MAGIC_T = b"DOD1"


# ----------------------------------------------------------- bit helpers


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (64 for x == 0)."""
    n = np.full(x.shape, 64, dtype=np.int64)
    cur = x.copy()
    shift = np.int64(32)
    acc = np.zeros_like(n)
    for s in (32, 16, 8, 4, 2, 1):
        mask = cur >> np.uint64(64 - s) == 0
        nz = cur != 0
        adj = np.where(mask & nz, s, 0).astype(np.int64)
        cur = np.where(mask & nz, cur << np.uint64(s), cur)
        acc += adj
    return np.where(x == 0, 64, acc)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (64 for x == 0)."""
    lsb = x & (~x + np.uint64(1))
    return np.where(x == 0, 64, 63 - _clz64(lsb))


def _pack_bits(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Scatter the low ``nbits[i]`` bits of ``values[i]`` (MSB-first per
    value) into one packed bitstream — fully vectorized."""
    nbits = nbits.astype(np.int64)
    total = int(nbits.sum())
    if total == 0:
        return b""
    offsets = np.concatenate(([0], np.cumsum(nbits)[:-1]))
    idx = np.repeat(np.arange(len(values)), nbits)
    intra = np.arange(total) - np.repeat(offsets, nbits)
    shift = (nbits[idx] - 1 - intra).astype(np.uint64)
    bits = ((values[idx] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


def _unpack_bits(buf: bytes, nbits: np.ndarray) -> np.ndarray:
    """Inverse of _pack_bits → uint64 values."""
    nbits = nbits.astype(np.int64)
    total = int(nbits.sum())
    out = np.zeros(len(nbits), dtype=np.uint64)
    if total == 0:
        return out
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[:total].astype(np.uint64)
    offsets = np.concatenate(([0], np.cumsum(nbits)[:-1]))
    idx = np.repeat(np.arange(len(nbits)), nbits)
    intra = np.arange(total) - np.repeat(offsets, nbits)
    shift = (nbits[idx] - 1 - intra).astype(np.uint64)
    contrib = bits << shift
    present = nbits > 0
    sums = np.add.reduceat(contrib, offsets[present]) if present.any() else contrib[:0]
    out[present] = sums.astype(np.uint64)
    return out


def _blob(magic: bytes, n: int, planes: list[bytes]) -> bytes:
    """Planes are individually DEFLATE-compressed: the control planes
    (lead/len/width per value) are highly repetitive on regular series —
    this recovers true-Gorilla's ~1 bit/value on constant streams while
    keeping the payload bit-packing fully vectorized."""
    head = magic + struct.pack("<I", n) + struct.pack("<I", len(planes))
    for p in planes:
        c = zlib.compress(p, 1)
        head += struct.pack("<I", len(c)) + c
    return head


def _unblob(blob: bytes, magic: bytes) -> tuple[int, list[bytes]]:
    assert blob[:4] == magic, f"bad magic {blob[:4]!r}"
    n = struct.unpack("<I", blob[4:8])[0]
    nplanes = struct.unpack("<I", blob[8:12])[0]
    planes, off = [], 12
    for _ in range(nplanes):
        ln = struct.unpack("<I", blob[off : off + 4])[0]
        planes.append(zlib.decompress(blob[off + 4 : off + 4 + ln]))
        off += 4 + ln
    return n, planes


# -------------------------------------------------------- float (Gorilla)


def encode_floats(values: np.ndarray) -> bytes:
    """Gorilla XOR encode a float64 stream (bit-exact, incl. NaN)."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    if n == 0:
        return _blob(_MAGIC_F, 0, [b"", b"", b""])
    x = v.copy()
    x[1:] = v[1:] ^ v[:-1]
    lead = np.minimum(_clz64(x), 63)
    trail = _ctz64(x)
    mlen = np.where(x == 0, 0, 64 - lead - trail).astype(np.int64)
    shifted = np.where(x == 0, np.uint64(0), x >> trail.astype(np.uint64))
    planes = [
        lead.astype(np.uint8).tobytes(),
        mlen.astype(np.uint8).tobytes(),
        _pack_bits(shifted, mlen),
    ]
    return _blob(_MAGIC_F, n, planes)


def decode_floats(blob: bytes) -> np.ndarray:
    n, planes = _unblob(blob, _MAGIC_F)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    lead = np.frombuffer(planes[0], dtype=np.uint8).astype(np.int64)
    mlen = np.frombuffer(planes[1], dtype=np.uint8).astype(np.int64)
    shifted = _unpack_bits(planes[2], mlen)
    trail = np.where(mlen == 0, 0, 64 - lead - mlen).astype(np.uint64)
    x = shifted << trail
    u = np.bitwise_xor.accumulate(x)
    return u.view(np.float64)


# ------------------------------------------------- timestamps (delta-of-delta)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (~(u & np.uint64(1)) + np.uint64(1))).astype(
        np.int64
    )


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 stream (µs epochs; any int64)."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return _blob(_MAGIC_T, 0, [b"", b"", b""])
    d = np.diff(t, prepend=t[0])  # d[0] = 0
    dod = np.diff(d, prepend=d[0])  # dod[0] = 0, dod[1] = d[1]
    # t[0] and the first real delta travel raw in plane 0; the zigzag
    # bitstream only carries dod[2:]
    z = _zigzag(dod)
    z[: min(2, n)] = 0
    nbits = np.where(z == 0, 0, 64 - _clz64(z)).astype(np.int64)
    planes = [
        struct.pack("<q", int(t[0])) + struct.pack("<q", int(d[1]) if n > 1 else 0),
        nbits.astype(np.uint8).tobytes(),
        _pack_bits(z, nbits),
    ]
    return _blob(_MAGIC_T, n, planes)


def decode_timestamps(blob: bytes) -> np.ndarray:
    n, planes = _unblob(blob, _MAGIC_T)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = struct.unpack("<q", planes[0][:8])[0]
    d1 = struct.unpack("<q", planes[0][8:16])[0]
    nbits = np.frombuffer(planes[1], dtype=np.uint8).astype(np.int64)
    dod = _unzigzag(_unpack_bits(planes[2], nbits))
    if n == 1:
        return np.array([t0], dtype=np.int64)
    # delta[0] = 0 (self-diff), delta[1] = d1, delta[i] = d1 + Σ dod[2..i]
    deltas = np.concatenate(([0, d1], d1 + np.cumsum(dod[2:])))
    return t0 + np.cumsum(deltas)
