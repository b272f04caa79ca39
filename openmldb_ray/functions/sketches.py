"""Approximate aggregate sketches: percentile_approx and
approx_count_distinct (reference surface:
java/openmldb-batch/.../udf/PercentileApprox.scala, used by the skew
optimizer utils/SkewDataFrameUtils.scala:40-43).

Both sketches are EXACT below capacity and degrade gracefully above:

- ``QuantileSketch``: a weighted order-statistics summary. While the
  buffer holds <= capacity points it is the exact multiset, and
  ``quantile(q)`` equals SQL ``quantile_disc``. Past capacity it
  compacts to ``capacity`` evenly-rank-spaced weighted points; the
  worst-case rank error per compaction is W/(2*capacity), so with the
  default capacity 4096 a merged sketch stays within ~0.05% rank error
  over a handful of compaction rounds.
- ``HLLSketch``: sparse mode keeps the exact hash set while
  |distinct| <= sparse_limit; past that it promotes to a dense
  HyperLogLog (p=14, 16384 registers, stderr 1.04/sqrt(m) ~ 0.8%).

Distribution pattern (the 100 TB shape): each map task folds its batch
into per-key sketches (one partial ROW per key per block — the shuffle
moves sketches, not rows), then ``groupby(keys).map_groups`` merges
the handful of partials per key and finalizes. Sketches serialize to
Arrow ``binary`` for the exchange.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# ----------------------------------------------------------- hashing

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Finalizer with full avalanche — turns weak integer patterns into
    HLL-quality uniform hashes. Vectorized, wraparound arithmetic."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_C1
        x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_C2
        return x ^ (x >> np.uint64(31))


def hash_column(col) -> np.ndarray:
    """64-bit hashes of an Arrow array/chunked array (nulls dropped).
    Numeric columns hash their 64-bit pattern through splitmix64;
    strings/binary hash FNV-1a over UNIQUE values only (dictionary
    encode first — the per-unique Python loop is bounded by batch
    cardinality, not batch size)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    if len(col) == 0:
        return np.empty(0, dtype=np.uint64)
    t = col.type
    if pa.types.is_floating(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return _splitmix64(v.view(np.uint64))
    if pa.types.is_integer(t) or pa.types.is_temporal(t) or \
            pa.types.is_boolean(t):
        if pa.types.is_unsigned_integer(t) and t.bit_width == 64:
            # uint64 above 2^63-1 fails a checked int64 cast; hash the
            # raw bit pattern instead.
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            return _splitmix64(v)
        bw = getattr(t, "bit_width", 64)
        if bw > 64:
            raise TypeError(f"approx_count_distinct: unhashable type {t}")
        if bw <= 32:
            # 32-bit temporals (date32/time32) refuse a direct int64
            # cast; hop through int32 (same pattern as io.py).
            col = col.cast(pa.int32()).cast(pa.int64())
        else:
            col = col.cast(pa.int64())
        v = col.to_numpy(zero_copy_only=False)
        return _splitmix64(v.view(np.uint64))
    if pa.types.is_string(t) or pa.types.is_large_string(t) or \
            pa.types.is_binary(t):
        d = col.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        uh = np.empty(len(uniq), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, s in enumerate(uniq):
                h = _FNV_OFF
                for b in (s.encode() if isinstance(s, str) else s):
                    h = (h ^ np.uint64(b)) * _FNV_PRIME
                uh[i] = h
        idx = d.indices.to_numpy(zero_copy_only=False)
        return _splitmix64(uh[idx])
    raise TypeError(f"approx_count_distinct: unhashable type {t}")


# ---------------------------------------------------- quantile sketch


class QuantileSketch:
    """Weighted order-statistics summary; exact while uncompressed."""

    __slots__ = ("capacity", "vals", "weights", "compressed")

    def __init__(self, capacity: int = 4096):
        self.capacity = capacity
        self.vals = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.compressed = False

    def add(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.vals = np.concatenate([self.vals, values])
        self.weights = np.concatenate(
            [self.weights, np.ones(len(values))])
        if len(self.vals) > 4 * self.capacity:
            self._compress()

    def merge(self, other: "QuantileSketch") -> None:
        self.vals = np.concatenate([self.vals, other.vals])
        self.weights = np.concatenate([self.weights, other.weights])
        self.compressed = self.compressed or other.compressed
        if len(self.vals) > 4 * self.capacity:
            self._compress()

    def _compress(self) -> None:
        order = np.argsort(self.vals, kind="stable")
        v = self.vals[order]
        w = self.weights[order]
        cumw = np.cumsum(w)
        total = cumw[-1]
        targets = (np.arange(self.capacity) + 0.5) * total / self.capacity
        idx = np.searchsorted(cumw, targets, side="left")
        idx = np.minimum(idx, len(v) - 1)
        # collapse duplicate picks, assigning each pick the weight mass
        # between consecutive target boundaries
        uniq, first = np.unique(idx, return_index=True)
        bounds = np.append(targets[first], total)
        self.vals = v[uniq]
        self.weights = np.diff(np.concatenate([[0.0], bounds[1:]]))
        self.compressed = True

    def quantile(self, q: float):
        """SQL quantile_disc semantics when exact: the smallest stored
        value whose cumulative weight reaches q * total."""
        if len(self.vals) == 0:
            return None
        order = np.argsort(self.vals, kind="stable")
        v = self.vals[order]
        cumw = np.cumsum(self.weights[order])
        target = q * cumw[-1]
        i = int(np.searchsorted(cumw, target, side="left"))
        return float(v[min(i, len(v) - 1)])

    def to_bytes(self) -> bytes:
        return (struct.pack("<IIB", self.capacity, len(self.vals),
                            int(self.compressed))
                + self.vals.tobytes() + self.weights.tobytes())

    @classmethod
    def from_bytes(cls, b: bytes) -> "QuantileSketch":
        capacity, n, comp = struct.unpack_from("<IIB", b, 0)
        sk = cls(capacity)
        off = 9
        sk.vals = np.frombuffer(b, dtype=np.float64, count=n,
                                offset=off).copy()
        sk.weights = np.frombuffer(b, dtype=np.float64, count=n,
                                   offset=off + 8 * n).copy()
        sk.compressed = bool(comp)
        return sk


# --------------------------------------------------------- HLL sketch

_HLL_P = 14
_HLL_M = 1 << _HLL_P
# bias-corrected alpha for m >= 128 (Flajolet et al. 2007)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


class HLLSketch:
    """HyperLogLog with an exact sparse mode below ``sparse_limit``."""

    __slots__ = ("sparse_limit", "sparse", "registers")

    def __init__(self, sparse_limit: int = 4096):
        self.sparse_limit = sparse_limit
        self.sparse: np.ndarray | None = np.empty(0, dtype=np.uint64)
        self.registers: np.ndarray | None = None

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        if self.sparse is not None:
            self.sparse = np.unique(np.concatenate([self.sparse, h]))
            if len(self.sparse) > self.sparse_limit:
                self._promote()
        else:
            self._dense_add(h)

    def _promote(self) -> None:
        self.registers = np.zeros(_HLL_M, dtype=np.uint8)
        h, self.sparse = self.sparse, None
        self._dense_add(h)

    def _dense_add(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
        rest = h << np.uint64(_HLL_P)
        # rank = leading zeros of the remaining 64-P bits, + 1
        nz = rest != 0
        lz = np.full(len(h), 64 - _HLL_P, dtype=np.uint8)
        if nz.any():
            # bit_length via log2 on the high 53 bits is lossy; use a
            # loop-free ladder on uint64 instead
            r = rest[nz]
            n = np.zeros(len(r), dtype=np.uint8)
            for shift in (32, 16, 8, 4, 2, 1):
                m = r < (np.uint64(1) << np.uint64(64 - shift))
                n[m] += shift
                r[m] <<= np.uint64(shift)
            lz[nz] = np.minimum(n, 64 - _HLL_P)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLLSketch") -> None:
        if other.sparse is not None:
            if self.sparse is not None:
                self.sparse = np.unique(
                    np.concatenate([self.sparse, other.sparse]))
                if len(self.sparse) > self.sparse_limit:
                    self._promote()
            else:
                self._dense_add(other.sparse)
        else:
            if self.sparse is not None:
                self._promote()
            np.maximum(self.registers, other.registers,
                       out=self.registers)

    def estimate(self) -> int:
        if self.sparse is not None:
            return int(len(self.sparse))
        regs = self.registers.astype(np.float64)
        est = _HLL_ALPHA * _HLL_M * _HLL_M / np.sum(2.0 ** -regs)
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * _HLL_M and zeros:
            est = _HLL_M * np.log(_HLL_M / zeros)  # linear counting
        return int(round(est))

    def to_bytes(self) -> bytes:
        if self.sparse is not None:
            return (struct.pack("<BI", 0, len(self.sparse))
                    + self.sparse.tobytes())
        return struct.pack("<BI", 1, _HLL_M) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, sparse_limit: int = 4096) -> "HLLSketch":
        mode, n = struct.unpack_from("<BI", b, 0)
        sk = cls(sparse_limit)
        if mode == 0:
            sk.sparse = np.frombuffer(b, dtype=np.uint64, count=n,
                                      offset=5).copy()
        else:
            sk.sparse = None
            sk.registers = np.frombuffer(b, dtype=np.uint8, count=n,
                                         offset=5).copy()
        return sk
