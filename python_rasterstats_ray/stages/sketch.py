"""Distributed cardinality sketch (HyperLogLog) — the 'novel sketch'
custom-operator slot of the build brief.

Scale shape: each batch builds a PARTIAL sketch (register -> max rho) with
vectorized numpy; partials are combinable by max, so the only shuffle is a
groupby over at most 2^b tiny (register, rho) rows regardless of input
size. The register contents are a pure function of sha256 of the values,
so a DuckDB oracle reproduces the sketch BIT-EXACTLY (the estimate's
float formula is deliberately kept out of the driver contract; its
accuracy is pinned by pytest instead).

Hash layout (b register-index bits, w = 64 - b payload bits; b <= 11 keeps
w >= 53 away from any float edge since everything stays integer anyway):
  h   = first 8 bytes of sha256(value), little-endian (same primitive the
        geotag/sampling oracles mirror in SQL)
  reg = h >> w
  rho = position of the leftmost 1-bit of the low w bits (1-based from the
        MSB side), or w + 1 when the low bits are all zero.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float log2 — correctly
    rounded log2 misrounds just below powers of two)."""
    x = x.copy()
    out = np.zeros(len(x), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        x[big] >>= np.uint64(shift)
    out[x > 0] += 1
    return out


def _sketch_of_hashes(h: np.ndarray, b: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) per hash."""
    w = 64 - b
    reg = (h >> np.uint64(w)).astype(np.int64)
    low = h & ((np.uint64(1) << np.uint64(w)) - np.uint64(1))
    rho = w + 1 - _bit_length_u64(low)  # all-zero low -> w + 1
    return reg, rho


def hll_sketch(ds, col: str = "text", b: int = 10):
    """Dataset -> HLL sketch as (register:int64, max_rho:int64) rows.

    Partial sketches per batch (numpy + Arrow group_by), merged by a
    groupby(register) max over <= 2^b rows — input size never crosses
    the shuffle."""
    import pyarrow.compute as pc

    from ..sources.synthetic import _sha_hash64

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch[col].to_pylist())
        reg, rho = _sketch_of_hashes(_sha_hash64(vals), b)
        t = pa.table(
            {
                "register": pa.array(reg, pa.int64()),
                "rho": pa.array(rho, pa.int64()),
            }
        )
        return (
            t.group_by("register")
            .aggregate([("rho", "max")])
            .rename_columns(["register", "max_rho"])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "register": pa.array([g["register"][0].as_py()], pa.int64()),
                "max_rho": pa.array([pc.max(g["max_rho"]).as_py()], pa.int64()),
            }
        )

    return partials.groupby("register").map_groups(merge, batch_format="pyarrow")


def hll_estimate(sketch_df, b: int = 10) -> float:
    """Bias-corrected HLL estimate (with small-range linear counting) from
    the (register, max_rho) rows. Driver-side: the sketch has <= 2^b rows."""
    m = 1 << b
    rho = np.zeros(m, dtype=np.int64)
    rho[sketch_df["register"].to_numpy()] = sketch_df["max_rho"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    denom = float(sum(2.0 ** (-int(r)) for r in rho))
    est = alpha * m * m / denom
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def _cms_cols(vals: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) column indices: d independent 64-bit hashes carved from ONE
    sha256 per value (8-byte little-endian chunks), mod w. Pure function
    of sha256 -> SQL-mirrorable."""
    import hashlib

    cols = np.empty((d, len(vals)), dtype=np.int64)
    for i, s in enumerate(vals):
        dig = hashlib.sha256(s.encode()).digest()
        for j in range(d):
            h = int.from_bytes(dig[8 * j : 8 * j + 8], "little")
            cols[j, i] = h % w
    return cols


def cms_sketch(ds, col: str, d: int = 4, w: int = 1024):
    """Count-min sketch of a value stream -> (cms_row, cms_col, count)
    rows. Per-batch partials via bincount; counts are SUM-combinable, so
    the only shuffle is a groupby over <= d*w tiny rows — and since the
    cell counts are exact integers, the whole sketch is bit-exact
    reproducible (and oracle-checkable) regardless of partitioning."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch[col].to_pylist())
        cols = _cms_cols(vals, d, w)
        rows_out, cols_out, counts_out = [], [], []
        for j in range(d):
            bc = np.bincount(cols[j], minlength=0)
            nz = np.nonzero(bc)[0]
            rows_out.append(np.full(len(nz), j, dtype=np.int64))
            cols_out.append(nz.astype(np.int64))
            counts_out.append(bc[nz].astype(np.int64))
        return pa.table(
            {
                "cms_row": pa.array(np.concatenate(rows_out), pa.int64()),
                "cms_col": pa.array(np.concatenate(cols_out), pa.int64()),
                "count": pa.array(np.concatenate(counts_out), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cms_row": pa.array([g["cms_row"][0].as_py()], pa.int64()),
                "cms_col": pa.array([g["cms_col"][0].as_py()], pa.int64()),
                "count": pa.array([pc.sum(g["count"]).as_py()], pa.int64()),
            }
        )

    return partials.groupby(["cms_row", "cms_col"]).map_groups(
        merge, batch_format="pyarrow"
    )


def cms_estimate(sketch_df, queries: list[str], d: int = 4, w: int = 1024) -> dict:
    """Point-frequency estimates (min over rows — classic CMS upper
    bound) for the queried values."""
    table = np.zeros((d, w), dtype=np.int64)
    table[sketch_df["cms_row"].to_numpy(), sketch_df["cms_col"].to_numpy()] = (
        sketch_df["count"].to_numpy()
    )
    cols = _cms_cols(np.asarray(queries), d, w)
    return {
        q: int(table[np.arange(d), cols[:, i]].min()) for i, q in enumerate(queries)
    }


# ------------------------------------------------- KLL quantile sketch


class KLLSketch:
    """Mergeable quantile sketch (KLL family, Karnin-Lang-Liberty 2016)
    with DETERMINISTIC compaction: an overfull level is sorted and its
    even-index items promoted with doubled weight (the randomized coin
    of the paper is replaced by a fixed parity that alternates per
    compaction, so identical inputs always produce identical sketches —
    reproducibility is worth the slightly weaker worst-case constant).

    Level i holds items of weight 2^i; total size is O(k * log(n/k)).
    ``merge`` concatenates per level then re-compresses, so per-block
    partial sketches combine associatively — the classic 100-TB
    quantile primitive (one small sketch per block, tree-merged, no
    sort exchange of the data)."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._parity = 0

    def _cap(self, i: int) -> int:
        # geometrically shrinking capacities toward LOW levels (the top
        # level holds up to k items), floored so tiny levels don't thrash
        h = len(self.levels)
        return max(int(self.k * (2.0 / 3.0) ** (h - 1 - i)), 8)

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._cap(i):
                arr = np.sort(self.levels[i])
                keep = arr[-1:] if len(arr) % 2 else arr[:0]
                arr = arr[: len(arr) - len(keep)]
                promoted = arr[self._parity :: 2]  # exactly half: weight exact
                self._parity ^= 1
                self.levels[i] = keep
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def update(self, vals: np.ndarray) -> "KLLSketch":
        vals = np.asarray(vals, np.float64).ravel()
        if len(vals):
            self.levels[0] = np.concatenate([self.levels[0], vals])
            self._compress()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        for i, lv in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compress()
        return self

    @property
    def n(self) -> int:
        return int(sum(len(lv) << i for i, lv in enumerate(self.levels)))

    def quantiles(self, qs) -> np.ndarray:
        """Smallest item whose estimated cumulative weight reaches q*n."""
        vals = np.concatenate(self.levels)
        if len(vals) == 0:
            return np.full(len(qs), np.nan)
        w = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, w = vals[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        out = np.empty(len(qs), np.float64)
        for j, q in enumerate(qs):
            target = max(min(float(q), 1.0), 0.0) * total
            out[j] = vals[int(np.searchsorted(cum, target, side="left").clip(0, len(vals) - 1))]
        return out

    # ---- serialization over the wire as plain arrays (Arrow-friendly)
    def to_state(self) -> tuple[int, int, list]:
        return self.k, self._parity, [lv.tolist() for lv in self.levels]

    @classmethod
    def from_state(cls, state) -> "KLLSketch":
        k, parity, levels = state
        s = cls(k)
        s._parity = parity
        s.levels = [np.asarray(lv, np.float64) for lv in levels]
        return s


def kll_quantiles(ds, col: str, qs, k: int = 256):
    """Distributed quantiles via per-block KLL partials + driver
    tree-merge: only O(k log n)-sized sketches leave the workers — no
    sort exchange of the data. Returns pa.Table(q, value, n)."""
    import pyarrow as _pa
    import ray as _ray

    @_ray.remote
    def _block_sketch(tbl, col: str, k: int):
        s = KLLSketch(k)
        s.update(tbl[col].to_numpy(zero_copy_only=False).astype(np.float64))
        return s.to_state()

    @_ray.remote
    def _merge_states(k: int, *states):
        s = KLLSketch(k)
        for st in states:
            s.merge(KLLSketch.from_state(st))
        return s.to_state()

    refs = ds.select_columns([col]).materialize().to_arrow_refs()
    futs = [_block_sketch.remote(r, col, k) for r in refs]
    group = 16
    while len(futs) > 1:
        futs = [
            _merge_states.remote(k, *futs[i : i + group])
            for i in range(0, len(futs), group)
        ]
    sk = (
        KLLSketch.from_state(_ray.get(futs[0])) if futs else KLLSketch(k)
    )  # zero-block input -> empty sketch -> NaN quantiles
    vals = sk.quantiles(qs)
    return _pa.table(
        {
            "q": _pa.array([float(q) for q in qs], _pa.float64()),
            "value": _pa.array(vals, _pa.float64()),
            "n": _pa.array([sk.n] * len(qs), _pa.int64()),
        }
    )


# ------------------------------------------------------------ bloom filter

_BLOOM_MIX = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix64 constants
_BLOOM_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _bloom_h2(h: np.ndarray) -> np.ndarray:
    """Second hash for Kirsch-Mitzenmacher double hashing: murmur3's
    fmix64 finalizer of the input hash, forced odd so the k probe
    positions cycle the whole (power-of-two) bit space."""
    with np.errstate(over="ignore"):
        x = h.astype(np.uint64).copy()
        x ^= x >> np.uint64(33)
        x *= _BLOOM_MIX
        x ^= x >> np.uint64(33)
        x *= _BLOOM_MIX2
        x ^= x >> np.uint64(33)
    return x | np.uint64(1)


def bloom_words_from_hashes(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Bitmap (uint64 words, len m_bits//64) with the k double-hashed
    positions of every input uint64 hash set. m_bits must be a power of
    two. Vectorized; OR-combinable across calls."""
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    words = np.zeros(m_bits // 64, np.uint64)
    if len(h) == 0:
        return words
    h = h.astype(np.uint64)
    h2 = _bloom_h2(h)
    mask = np.uint64(m_bits - 1)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h + np.uint64(i) * h2) & mask
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
    return words


def bloom_contains(words: np.ndarray, h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set (may
    false-positive, never false-negatives)."""
    if len(h) == 0:
        return np.zeros(0, bool)
    h = h.astype(np.uint64)
    h2 = _bloom_h2(h)
    mask = np.uint64(m_bits - 1)
    out = np.ones(len(h), bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h + np.uint64(i) * h2) & mask
            bit = np.uint64(1) << (pos & np.uint64(63))
            out &= (words[(pos >> np.uint64(6)).astype(np.int64)] & bit) != 0
    return out


def bloom_sketch(ds, hash_fn, m_bits: int = 1 << 20, k: int = 6):
    """Distributed bloom-filter build: ``hash_fn(batch) -> uint64 array``
    extracts the hashes of each Arrow batch; each block emits only its
    NONZERO bitmap words as sparse (word_idx, bits) rows (bits viewed as
    int64 for Arrow), merged by a groupby(word_idx) bitwise-OR over at
    most m_bits/64 tiny rows — like the HLL sketch, input size never
    crosses the shuffle, and the OR is order-independent so the sketch
    is deterministic across block layouts."""

    def partial(batch: pa.Table) -> pa.Table:
        words = bloom_words_from_hashes(hash_fn(batch), m_bits, k)
        nz = np.nonzero(words)[0]
        return pa.table(
            {
                "word_idx": pa.array(nz, pa.int64()),
                "bits": pa.array(words[nz].view(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        bits = np.bitwise_or.reduce(g["bits"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "word_idx": pa.array([g["word_idx"][0].as_py()], pa.int64()),
                "bits": pa.array([int(bits)], pa.int64()),
            }
        )

    return partials.groupby("word_idx").map_groups(merge, batch_format="pyarrow")


def bloom_assemble(sketch_tbl, m_bits: int) -> np.ndarray:
    """(word_idx, bits) rows -> the dense uint64 bitmap (driver-side; at
    most m_bits/64 rows arrive regardless of input size)."""
    words = np.zeros(m_bits // 64, np.uint64)
    if hasattr(sketch_tbl, "to_pandas"):
        sketch_tbl = sketch_tbl.to_pandas()
    idx = np.asarray(sketch_tbl["word_idx"], np.int64)
    bits = np.asarray(sketch_tbl["bits"], np.int64).view(np.uint64)
    words[idx] = bits
    return words


# ---------------------------------------- exact heavy hitters (two-pass)
#
# Frequency-threshold heavy hitters (all words with count*DEN >= NUM*N,
# phi = NUM/DEN) computed EXACTLY in two bounded passes — the classic
# "local heavy hitters then verify" distributed scheme:
#
# pass 1: each batch emits its LOCAL heavy hitters (count >= phi *
#   batch_tokens, a vectorized np.unique — no sketch loop needed). By
#   averaging, any global heavy hitter is a local heavy hitter in at
#   least one batch, so the candidate union (<= #batches/phi rows, tiny)
#   has NO false negatives.
# pass 2: the candidate set is broadcast; each batch counts ONLY
#   candidate words exactly; one groupby(word) of candidate-sized
#   partials; filter by the integer threshold.
#
# Both passes are pruned single-column scans; nothing corpus-sized ever
# moves. The word rule is DuckDB string_split parity (_split_words), so
# the result equals a GROUP BY/HAVING oracle bit-for-bit.


def heavy_hitters(ds, phi_num: int, phi_den: int, text_col: str = "text"):
    """Dataset[text] -> (word, n) rows for every word with
    ``n * phi_den >= phi_num * total_words``, exact."""
    import ray as _ray

    from .text import _split_words

    def token_total(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        words = _pc.split_pattern(batch[text_col], " ")
        n = _pc.sum(_pc.list_value_length(words)).as_py() or 0
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    total = int(
        ds.map_batches(token_total, batch_format="pyarrow", zero_copy_batch=True)
        .sum("n")
        or 0
    )
    if total == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        )

    def local_hh(batch: pa.Table) -> pa.Table:
        _, codes, dictionary = _split_words(batch[text_col])
        if len(codes) == 0:
            return pa.table({"word": pa.array([], pa.string())})
        cnt = np.bincount(codes, minlength=len(dictionary))
        keep = np.flatnonzero(cnt.astype(np.int64) * phi_den >= phi_num * len(codes))
        return pa.table({"word": pa.array(dictionary.take(pa.array(keep)), pa.string())})

    cands = (
        ds.map_batches(local_hh, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .count()
        .to_pandas()["word"]
        .tolist()
    )
    cand_ref = _ray.put(np.sort(np.asarray(cands, dtype=object)))

    class CountCandidates:
        def __init__(self, ref=cand_ref):
            self.cands = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            _, codes, dictionary = _split_words(batch[text_col])
            if len(codes) == 0:
                return pa.table(
                    {"word": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
                )
            words = np.asarray(dictionary.to_pylist(), dtype=object)
            pos = np.searchsorted(self.cands, words)
            pos[pos >= len(self.cands)] = 0
            is_cand = (
                self.cands[pos] == words if len(self.cands) else np.zeros(len(words), bool)
            )
            cnt = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
            keep = np.flatnonzero(is_cand & (cnt > 0))
            return pa.table(
                {
                    "word": pa.array(words[keep].tolist(), pa.string()),
                    "c": pa.array(cnt[keep], pa.int64()),
                }
            )

    from ._cluster import pool

    partials = ds.map_batches(
        CountCandidates, batch_format="pyarrow", concurrency=pool(2), zero_copy_batch=True
    )

    def finalize(group: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        n = int(_pc.sum(group["c"]).as_py())
        if n * phi_den < phi_num * total:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "word": pa.array([group["word"][0].as_py()], pa.string()),
                "n": pa.array([n], pa.int64()),
            }
        )

    return partials.groupby("word").map_groups(finalize, batch_format="pyarrow").sort("word")
