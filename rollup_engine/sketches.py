"""Mergeable quantile sketches — the engine's partial-aggregation state.

The reference keeps one in-memory reservoir that is exact up to 10,000
samples and approximate above (/root/reference/Cargo.toml:20-21,
/root/reference/src/analyzer/mod.rs:61-63).  Distributed aggregation
needs that state to be *mergeable* (partial → final, minute → hour →
day); we generalize the contract with a two-kind sketch:

- ``HS1`` sparse value histogram: exact nearest-rank at ANY size while
  the number of *distinct* values stays bounded (latencies are integer
  ms, so this is the common case).  Merging is counter addition —
  associative, commutative, lossless.
- ``TD1`` t-digest (merging variant, k1/arcsin scale): constant-size,
  approximate, used when the distinct-value domain explodes.  Tails stay
  near-exact (singleton clusters at q→0/1).

A histogram auto-degrades to a t-digest when it outgrows
``HIST_MAX_BINS``; merging a mixed set promotes everything to t-digest.
All build/merge/quantile paths are numpy-vectorized — no per-row Python
(BASELINE.json input_hint).
"""

from __future__ import annotations

import struct

import numpy as np

HIST_MAX_BINS = 100_000
TDIGEST_DELTA = 200

_MAGIC_HIST = b"HS1"
_MAGIC_TD = b"TD1"


# ------------------------------------------------------------------ codecs


def _pack(magic: bytes, a: np.ndarray, b: np.ndarray) -> bytes:
    return magic + struct.pack("<I", len(a)) + a.tobytes() + b.tobytes()


def _unpack(blob: bytes) -> tuple[bytes, np.ndarray, np.ndarray]:
    magic, n = blob[:3], struct.unpack("<I", blob[3:7])[0]
    if magic == _MAGIC_HIST:
        vals = np.frombuffer(blob, dtype="<i8", count=n, offset=7)
        cnts = np.frombuffer(blob, dtype="<i8", count=n, offset=7 + 8 * n)
    elif magic == _MAGIC_TD:
        vals = np.frombuffer(blob, dtype="<f8", count=n, offset=7)
        cnts = np.frombuffer(blob, dtype="<f8", count=n, offset=7 + 8 * n)
    else:  # pragma: no cover
        raise ValueError(f"unknown sketch magic {magic!r}")
    return magic, vals, cnts


def kind(blob: bytes) -> str:
    return "hist" if blob[:3] == _MAGIC_HIST else "tdigest"


# ------------------------------------------------------------------- build


def hist_build(values: np.ndarray) -> bytes:
    """Sparse exact histogram from raw integer values."""
    vals, cnts = np.unique(np.asarray(values, dtype=np.int64), return_counts=True)
    if len(vals) > HIST_MAX_BINS:
        return _td_from(vals.astype(np.float64), cnts.astype(np.float64))
    return _pack(_MAGIC_HIST, vals, cnts.astype(np.int64))


def _td_compress(
    means: np.ndarray, weights: np.ndarray, delta: int = TDIGEST_DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """One-pass stratified compression on the k1 (arcsin) scale —
    vectorized: assign each centroid to floor(k(q_mid)) and merge within
    strata by weighted mean."""
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    total = w.sum()
    if total <= 0:
        return m[:0], w[:0]
    q = (np.cumsum(w) - w / 2) / total
    k = delta * (np.arcsin(np.clip(2 * q - 1, -1, 1)) / np.pi + 0.5)
    cid = np.floor(k).astype(np.int64)
    _, idx = np.unique(cid, return_inverse=True)
    wsum = np.bincount(idx, weights=w)
    msum = np.bincount(idx, weights=m * w)
    return msum / wsum, wsum


def _td_from(means: np.ndarray, weights: np.ndarray) -> bytes:
    m, w = _td_compress(means, weights)
    return _pack(_MAGIC_TD, m.astype("<f8"), w.astype("<f8"))


def tdigest_build(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.float64)
    return _td_from(v, np.ones_like(v))


def build(values: np.ndarray, prefer: str = "hist") -> bytes:
    """Default build: exact histogram, auto-degrading to t-digest."""
    if prefer == "tdigest":
        return tdigest_build(values)
    return hist_build(values)


# ------------------------------------------------------------------- merge


def merge(blobs: list[bytes]) -> bytes | None:
    """Associative, commutative merge of any mix of sketch kinds."""
    blobs = [b for b in blobs if b is not None and len(b) >= 7]
    if not blobs:
        return None
    kinds = {b[:3] for b in blobs}
    if kinds == {_MAGIC_HIST}:
        parts = [_unpack(b) for b in blobs]
        vals = np.concatenate([p[1] for p in parts])
        cnts = np.concatenate([p[2] for p in parts])
        uvals, idx = np.unique(vals, return_inverse=True)
        ucnts = np.bincount(idx, weights=cnts.astype(np.float64)).astype(np.int64)
        if len(uvals) > HIST_MAX_BINS:
            return _td_from(uvals.astype(np.float64), ucnts.astype(np.float64))
        return _pack(_MAGIC_HIST, uvals, ucnts)
    # promote everything to t-digest
    ms, ws = [], []
    for b in blobs:
        _, v, c = _unpack(b)
        ms.append(v.astype(np.float64))
        ws.append(c.astype(np.float64))
    return _td_from(np.concatenate(ms), np.concatenate(ws))


def _n(blob: bytes) -> int:
    return struct.unpack("<I", blob[3:7])[0]


# ---------------------------------------------------------------- quantile


def total_weight(blob: bytes) -> float:
    _, _, c = _unpack(blob)
    return float(c.sum())


def quantile(blob: bytes, q: float) -> float | None:
    """Nearest-rank quantile (ceil(q·n)-th order statistic) — exact for
    histograms; for t-digests, nearest-rank over centroids (exact while
    clusters are singletons, i.e. small n — the reference's contract)."""
    magic, vals, cnts = _unpack(blob)
    n = cnts.sum()
    if n <= 0:
        return None
    target = max(1, int(np.ceil(q * n - 1e-9)))
    cum = np.cumsum(cnts)
    i = int(np.searchsorted(cum, target - 1e-9))
    i = min(i, len(vals) - 1)
    return float(vals[i])


def quantiles(blob: bytes, qs: list[float]) -> list[float | None]:
    return [quantile(blob, q) for q in qs]
