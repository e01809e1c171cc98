"""Mergeable sketches, pure-python/numpy, Arrow-serializable as binary.

From-scratch implementations based on the published algorithms:
- HyperLogLog (Flajolet et al. 2007) for APPROX_UNIQUE_COUNT — the reference
  uses a CPC sketch at lgK=8 (~1200B) (reference: aggregator/base/
  SimpleAggregators.scala:602-652); we use a dense HLL with the same lgK
  default and the same mergeable-binary-IR contract.
- A KLL-style quantile sketch (Karnin-Lang-Liberty 2016, simplified fixed-k
  compactor) for APPROX_PERCENTILE (reference: SimpleAggregators.scala:654-694,
  k=128 default).

Both expose: empty() -> state, update_many(state, values), merge(a, b),
serialize(state) -> bytes, deserialize(bytes) -> state, estimate/quantiles.
"""

from __future__ import annotations

import pickle
import struct
from typing import Optional

import numpy as np

# ---------------------------------------------------------------- HyperLogLog

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of arbitrary values (vectorized).

    Strings are hashed via a vectorized FNV-1a over a fixed-width prefix plus
    python hash fallback for the rest; numerics via splitmix64.
    """
    if values.dtype.kind == "f":
        # hash the IEEE-754 bit pattern — astype(uint64) would truncate
        # toward zero (1.1/1.2/1.9 collide) and is UB for negatives
        x = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64).copy()
    elif values.dtype.kind in "iu":
        x = values.astype(np.uint64, copy=True).view(np.uint64)
        # splitmix64
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z &= np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z &= np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))
    # object/strings: stable per-process via md5 of utf-8
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.md5(str(v).encode()).digest()[:8]
        out[i] = struct.unpack("<Q", h)[0]
    return out


class HLL:
    """HyperLogLog with an HLL++-style sparse exact mode (Heule et al. 2013):
    below ``m`` distinct hashes the state is the sorted unique uint64 hash
    set itself — estimates are EXACT (w.h.p. of no 64-bit collision) — and
    it densifies to the classic uint8 register array beyond that.

    State is either a dict {"lgk", "h": uint64[]} (sparse) or a uint8[2**lgk]
    register array (dense). Serialized form is tagged: b"S"+lgk+hashes /
    b"D"+registers.
    """

    __slots__ = ()

    @staticmethod
    def empty(lgk: int = 8):
        return {"lgk": lgk, "h": np.empty(0, dtype=np.uint64)}

    @staticmethod
    def _is_sparse(state) -> bool:
        return isinstance(state, dict)

    @staticmethod
    def _densify(state) -> np.ndarray:
        lgk = state["lgk"]
        dense = np.zeros(1 << lgk, dtype=np.uint8)
        return HLL._update_dense(dense, state["h"])

    @staticmethod
    def _update_dense(state: np.ndarray, h: np.ndarray) -> np.ndarray:
        m = len(state)
        lgk = int(m).bit_length() - 1
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        rest = h >> np.uint64(lgk)
        # rank = 1-based position of the lowest set bit of the remaining bits
        rank = np.ones(len(h), dtype=np.uint8)
        nonzero = rest != 0
        r = rest[nonzero]
        low = (r & (~r + np.uint64(1)))  # isolate lowest bit
        rank_nz = np.log2(low.astype(np.float64)).astype(np.uint8) + 1
        rank[nonzero] = rank_nz
        rank[~nonzero] = 64 - lgk + 1
        np.maximum.at(state, idx, rank)
        return state

    @staticmethod
    def update_many(state, values: np.ndarray):
        h = _hash64(values)
        return HLL.update_hashes(state, h)

    @staticmethod
    def update_hashes(state, h: np.ndarray):
        if HLL._is_sparse(state):
            u = np.union1d(state["h"], h)
            if len(u) <= (1 << state["lgk"]):
                state["h"] = u
                return state
            return HLL._densify({"lgk": state["lgk"], "h": u})
        return HLL._update_dense(state, h)

    @staticmethod
    def merge(a, b):
        sa, sb = HLL._is_sparse(a), HLL._is_sparse(b)
        if sa and sb:
            u = np.union1d(a["h"], b["h"])
            if len(u) <= (1 << a["lgk"]):
                return {"lgk": a["lgk"], "h": u}
            return HLL._update_dense(HLL._densify(a), b["h"])
        if sa:
            return HLL._update_dense(b.copy(), a["h"])
        if sb:
            return HLL._update_dense(a.copy(), b["h"])
        return np.maximum(a, b)

    @staticmethod
    def estimate(state) -> int:
        if HLL._is_sparse(state):
            return int(len(state["h"]))
        m = len(state)
        inv = np.ldexp(1.0, -state.astype(np.int64))
        e = _alpha(m) * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((state == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return int(round(e))

    @staticmethod
    def serialize(state) -> bytes:
        if HLL._is_sparse(state):
            return b"S" + bytes([state["lgk"]]) + state["h"].tobytes()
        return b"D" + state.tobytes()

    @staticmethod
    def deserialize(buf: bytes):
        if buf[:1] == b"S":
            return {"lgk": buf[1],
                    "h": np.frombuffer(buf[2:], dtype=np.uint64).copy()}
        if buf[:1] == b"D":
            return np.frombuffer(buf[1:], dtype=np.uint8).copy()
        return np.frombuffer(buf, dtype=np.uint8).copy()  # legacy untagged


# ------------------------------------------------------------- KLL quantiles


class KLL:
    """Simplified KLL quantile sketch: level-0 buffer of capacity 2k; when full,
    sort + keep every other item (random offset) and push to next level with
    weight doubling. State = list of numpy arrays per level + k.
    """

    @staticmethod
    def empty(k: int = 128) -> dict:
        return {"k": k, "levels": [np.empty(0, dtype=np.float64)], "seed": 0}

    @staticmethod
    def update_many(state: dict, values: np.ndarray) -> dict:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        state["levels"][0] = np.concatenate([state["levels"][0], vals])
        KLL._compact(state)
        return state

    @staticmethod
    def _cap(k: int, level: int, n_levels: int) -> int:
        # capacity shrinks geometrically for lower levels (c=2/3), floor 8
        c = 2.0 / 3.0
        return max(8, int(k * (c ** (n_levels - 1 - level))) * 2)

    @staticmethod
    def _compact(state: dict) -> None:
        k = state["k"]
        levels = state["levels"]
        i = 0
        while i < len(levels):
            cap = KLL._cap(k, i, len(levels))
            if len(levels[i]) > cap:
                buf = np.sort(levels[i])
                state["seed"] = (state["seed"] * 1103515245 + 12345) & 0x7FFFFFFF
                off = state["seed"] & 1
                promoted = buf[off::2]
                levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 >= len(levels):
                    levels.append(np.empty(0, dtype=np.float64))
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
            i += 1

    @staticmethod
    def merge(a: dict, b: dict) -> dict:
        la, lb = a["levels"], b["levels"]
        n = max(len(la), len(lb))
        levels = []
        for i in range(n):
            xs = la[i] if i < len(la) else np.empty(0)
            ys = lb[i] if i < len(lb) else np.empty(0)
            levels.append(np.concatenate([xs, ys]))
        out = {"k": a["k"], "levels": levels, "seed": a["seed"] ^ b["seed"]}
        KLL._compact(out)
        return out

    @staticmethod
    def quantiles(state: dict, qs: list[float]) -> np.ndarray:
        items = []
        weights = []
        for lvl, arr in enumerate(state["levels"]):
            if len(arr):
                items.append(arr)
                weights.append(np.full(len(arr), 1 << lvl, dtype=np.int64))
        if not items:
            return np.full(len(qs), np.nan, dtype=np.float64)
        vals = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(vals, kind="stable")
        vals, w = vals[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1]
        out = np.empty(len(qs), dtype=np.float64)
        for j, q in enumerate(qs):
            target = q * total
            idx = int(np.searchsorted(cw, target, side="left"))
            idx = min(idx, len(vals) - 1)
            out[j] = vals[idx]
        return out

    @staticmethod
    def serialize(state: dict) -> bytes:
        return pickle.dumps(
            {"k": state["k"], "levels": [l for l in state["levels"]], "seed": state["seed"]}
        )

    @staticmethod
    def deserialize(buf: bytes) -> dict:
        return pickle.loads(buf)


# ------------------------------------------------- Misra-Gries heavy hitters


class MG:
    """Hybrid exact-map / Misra-Gries heavy-hitter summary for
    APPROX_HISTOGRAM_K — the analog of the reference's ApproxHistogram
    (exact HashMap until > k distinct, then a bounded ItemsSketch;
    reference SimpleAggregators.scala:458-600 + FrequentItems :375-456).

    State: ``("E", {v: cnt})`` exact, or ``("A", {v: (cnt, err)}, off)``
    after the flip. The approx tier is the MERGEABLE Misra-Gries summary
    (Agarwal et al., "Mergeable Summaries", PODS 2012): when the map
    exceeds ``cap = 2 * next_pow2(k)`` entries, subtract the (cap+1)-th
    largest count from every counter, drop non-positive ones, and fold the
    subtracted amount into each survivor's error bound AND the global
    offset ``off``; a value (re)inserted later starts with err = off
    (space-saving style), so estimate = cnt + err is always an upper bound
    with error ≤ off ≤ n/cap (like ItemsSketch.getEstimate /
    getMaximumError). Per-key IR size is bounded by cap regardless of
    input cardinality.
    """

    @staticmethod
    def cap_for(k: int) -> int:
        k = max(int(k), 1)
        return max(8, 2 * (1 << (k - 1).bit_length()))

    @staticmethod
    def empty() -> tuple:
        return ("E", {})

    @staticmethod
    def _compact(d: dict, cap: int, off: int) -> tuple:
        """({v: (cnt, err)}, off) trimmed to ≤ cap entries."""
        if len(d) <= cap:
            return d, off
        counts = sorted((c for c, _ in d.values()), reverse=True)
        m = counts[cap]
        out = {}
        for v, (c, e) in d.items():
            nc = c - m
            if nc > 0:
                out[v] = (nc, e + m)
        return out, off + m

    @staticmethod
    def from_exact(counts: dict, k: int) -> tuple:
        """Exact {v: cnt} map → hybrid state (flip when > k distinct,
        mirroring the reference's toIr)."""
        if len(counts) <= max(int(k), 1):
            return ("E", dict(counts))
        d = {v: (int(c), 0) for v, c in counts.items()}
        d, off = MG._compact(d, MG.cap_for(k), 0)
        return ("A", d, off)

    @staticmethod
    def update(state: tuple, v, k: int, times: int = 1) -> tuple:
        """Copy-on-write like merge: never mutates the input state's dict —
        callers may share IRs across hops/windows (merge-then-update without
        a clone must stay safe)."""
        if state[0] == "E":
            d = dict(state[1])
            d[v] = d.get(v, 0) + times
            if len(d) <= max(int(k), 1):
                return ("E", d)
            d = {vv: (c, 0) for vv, c in d.items()}
            d, off = MG._compact(d, MG.cap_for(k), 0)
            return ("A", d, off)
        _, d, off = state
        d = dict(d)
        c, e = d.get(v, (0, off))  # new entries inherit the global offset
        d[v] = (c + times, e)
        if len(d) > MG.cap_for(k):
            d, off = MG._compact(d, MG.cap_for(k), off)
            return ("A", d, off)
        return ("A", d, off)

    @staticmethod
    def _as_approx(state: tuple) -> tuple:
        if state[0] == "A":
            return state[1], state[2]
        return {v: (int(c), 0) for v, c in state[1].items()}, 0

    @staticmethod
    def merge(a: tuple, b: tuple, k: int) -> tuple:
        """Pure (never mutates inputs) — hop IRs are shared across windows."""
        if a[0] == "E" and b[0] == "E":
            out = dict(a[1])
            for v, c in b[1].items():
                out[v] = out.get(v, 0) + c
            return MG.from_exact(out, k)
        # at least one approx side → approx result (reference combine).
        # A value absent from one side could have been dropped there with
        # error up to that side's offset — fold it into the entry's err.
        da, offa = MG._as_approx(a)
        db, offb = MG._as_approx(b)
        out = {}
        for v in set(da) | set(db):
            ca, ea = da.get(v, (0, offa))
            cb, eb = db.get(v, (0, offb))
            out[v] = (ca + cb, ea + eb)
        out, off = MG._compact(out, MG.cap_for(k), offa + offb)
        return ("A", out, off)

    @staticmethod
    def finalize(state: tuple, k: int) -> list:
        """Top-k entries by estimate, emitted sorted by key (deterministic
        arrow map). Exact tier: estimates are true counts."""
        if state[0] == "E":
            items = [(str(v), int(c)) for v, c in state[1].items()]
        else:
            items = [(str(v), int(c) + int(e))
                     for v, (c, e) in state[1].items()]
        kk = max(int(k), 1) if k else 0
        if kk and len(items) > kk:
            items = sorted(items, key=lambda t: (-t[1], t[0]))[:kk]
        items.sort()
        return items

    @staticmethod
    def serialize(state: tuple) -> bytes:
        return pickle.dumps(state)

    @staticmethod
    def deserialize(buf: bytes) -> tuple:
        return pickle.loads(buf)
