"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design: every variant is hash-partitioned — the only all-to-all
moves are groupbys on a small key column (hash / band bucket / simhash
prefix), never the document payload. Candidate verification happens inside
the bucket group (map_groups), bounded by bucket size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .similarity import emb_matrix
from .text import md5_batch

# ------------------------------------------------------------ exact dedup


_HEX2 = [f"{i:02x}" for i in range(256)]


def _md5_prefix_bucket(batch: pa.Table) -> pa.Table:
    """Append a 256-way coarse partition keyed on the md5 hex prefix —
    a pure function of the group key, so every md5 group lands whole in
    one bucket and per-bucket processing can reduce MANY groups in one
    vectorized pass (per-md5 map_groups would pay a Python call per
    distinct text: hours at 10^9 groups)."""
    if len(batch) == 0:
        return batch.append_column("bucket", pa.array([], pa.int32()))
    pre = pc.utf8_slice_codeunits(batch["text_md5"], 0, 2)
    return batch.append_column("bucket", pc.index_in(pre, pa.array(_HEX2)))


def exact_dedup_groups(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partitioned exact dedup: md5(text) groupby -> one row per
    distinct text with representative (min id) and duplicate count.

    Only (text_md5, id) cross the shuffle — payload stays columnar in the
    upstream blocks. The exchange is bucketed on the md5 prefix and each
    bucket reduces all its md5 groups in ONE Arrow group_by (no per-group
    Python)."""

    def hash_project(batch: pa.Table) -> pa.Table:
        b = md5_batch(batch, text_col=text_col)
        return _md5_prefix_bucket(b.select([id_col, "text_md5"]))

    hashed = docs_ds.map_batches(hash_project, batch_format="pyarrow", zero_copy_batch=True)

    def reduce_bucket(group: pa.Table) -> pa.Table:
        t = (
            group.select(["text_md5", id_col])
            .group_by("text_md5")
            .aggregate([(id_col, "min"), (id_col, "count")])
        )
        return t.rename_columns(["text_md5", "rep_doc_id", "dup_count"])

    return hashed.groupby("bucket").map_groups(reduce_bucket, batch_format="pyarrow")


def exact_dedup_keep_first(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of surviving ids (min id per distinct text)."""
    groups = exact_dedup_groups(docs_ds, text_col, id_col)
    return groups.select_columns(["rep_doc_id"])


def exact_dedup_filter(
    docs_ds, keep_cols: list[str], text_col: str = "text", id_col: str = "doc_id"
):
    """Dedup applied as a row filter with NO driver-side state: each batch
    hashes its text and drops the payload; one groupby(text_md5) then keeps
    the min-id row per group. Only (md5, id, keep_cols) enter the shuffle —
    at corpus scale nothing is ever materialized on the driver (replaces
    the broadcast survivor-id set the round-1 version used)."""

    def hash_project(batch: pa.Table) -> pa.Table:
        b = md5_batch(batch, text_col=text_col)
        return _md5_prefix_bucket(b.select([id_col, *keep_cols, "text_md5"]))

    hashed = docs_ds.map_batches(hash_project, batch_format="pyarrow", zero_copy_batch=True)

    def pick_reps(group: pa.Table) -> pa.Table:
        # all md5 groups of the bucket at once: sort (md5, id), keep the
        # first row of each md5 run (= the min-id representative)
        idx = pc.sort_indices(
            group, sort_keys=[("text_md5", "ascending"), (id_col, "ascending")]
        )
        s = group.take(idx)
        md5 = s["text_md5"]
        first = np.concatenate(
            (
                [True],
                pc.not_equal(md5.slice(1), md5.slice(0, len(s) - 1)).to_numpy(
                    zero_copy_only=False
                ),
            )
        )
        return s.filter(pa.array(first)).select([id_col, *keep_cols])

    return hashed.groupby("bucket").map_groups(pick_reps, batch_format="pyarrow")


# ------------------------------------------------------- shingle/minhash

_MERSENNE = (1 << 61) - 1

# coarse partition count (2^bits) for the bucketed vectorized group
# stages in minhash_lsh_pairs: enough groups to spread across a large
# cluster's reduce tasks, few enough that per-group Python dispatch is
# negligible at any scale
_NPART_BITS = 8


def grouped_pairs_table(
    group: pa.Table, key_col: str, id_col: str, cap: int | None = None
) -> pa.Table:
    """(key, id) rows -> distinct unordered id pairs within each key
    group, ALL groups of the table in one vectorized pass: lexsort,
    unique (key, id), run-length split, then all-pairs via the
    repeat/tail-index construction — or, when ``cap`` is set and a run
    exceeds it, the sorted-consecutive chain (connected components are
    preserved; only redundant intra-cluster edges drop). Replaces
    per-group map_groups, whose one-Python-call-per-group dispatch is
    hours at 10^9 buckets."""
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    if len(group) == 0:
        return empty
    key = group[key_col].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, key))
    k_s, i_s = key[order], ids[order]
    keep = np.concatenate(([True], (k_s[1:] != k_s[:-1]) | (i_s[1:] != i_s[:-1])))
    k_u, i_u = k_s[keep], i_s[keep]
    starts = np.concatenate(([0], np.flatnonzero(k_u[1:] != k_u[:-1]) + 1))
    lens = np.diff(np.concatenate((starts, [len(k_u)])))
    outs_a, outs_b = [], []
    big = lens > cap if cap is not None else np.zeros(len(lens), dtype=bool)
    if big.any():
        s, n = starts[big], lens[big]
        tot = int((n - 1).sum())
        base = np.repeat(s, n - 1)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n - 1)[:-1])), n - 1
        )
        ai = base + within
        outs_a.append(i_u[ai])
        outs_b.append(i_u[ai + 1])
    small = (~big) & (lens >= 2)
    if small.any():
        s, n = starts[small], lens[small]
        tot_e = int(n.sum())
        base = np.repeat(s, n)
        loc = np.arange(tot_e, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n)[:-1])), n
        )
        gidx = base + loc
        reps = np.repeat(n, n) - 1 - loc  # tail length per element
        a_idx = np.repeat(gidx, reps)
        npairs = int(reps.sum())
        ofs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        b_idx = np.repeat(gidx + 1, reps) + (
            np.arange(npairs, dtype=np.int64) - np.repeat(ofs, reps)
        )
        outs_a.append(i_u[a_idx])
        outs_b.append(i_u[b_idx])
    if not outs_a:
        return empty
    return pa.table(
        {
            "id_a": pa.array(np.concatenate(outs_a), pa.int64()),
            "id_b": pa.array(np.concatenate(outs_b), pa.int64()),
        }
    )


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling 64-bit hashes of character k-shingles (vectorized)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    n = len(data) - k + 1
    # polynomial rolling hash via cumulative powers (vectorized)
    base = np.uint64(1000003)
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, k):
            powers[i] = powers[i - 1] * base  # mod-2^64 wraparound intended
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    return (windows * powers[::-1]).sum(axis=1, dtype=np.uint64)


class MinHashKernel:
    """Actor-pool kernel: per-doc MinHash signature + LSH band keys.

    ``num_perm`` universal-hash parameters are drawn once per actor in
    ``__init__`` from a fixed seed (identical across actors)."""

    def __init__(
        self,
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        text_col: str = "text",
        id_col: str = "doc_id",
        seed: int = 1234,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = np.unique(_shingle_hashes(text, self.k))
        # (num_perm, n_shingles) universal hashing, min over shingles
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    # byte budget per vectorized sub-chunk: bounds the (n_windows, k)
    # uint64 sliding-window matrix to ~64 MB regardless of doc sizes
    _CHUNK_BYTES = 64 * 1024 * 1024

    def signatures_batch(self, texts: list[str]) -> np.ndarray:
        """All signatures of a batch in a few numpy passes (bit-identical
        to per-doc ``signature``: same dtypes, same op order, same
        mod-2^64 wraparound before the Mersenne reduction). Docs are
        concatenated into one byte stream per sub-chunk; windows that
        straddle doc boundaries are dropped by position; per-doc shingle
        dedup is a lexsort; the per-permutation min is a reduceat over
        doc segments — no per-doc Python in the hot path."""
        k = self.k
        enc = [t.encode("utf-8") for t in texts]
        enc = [e if len(e) >= k else e + b" " * (k - len(e)) for e in enc]
        sigs = np.empty((len(enc), self.num_perm), dtype=np.uint64)
        base = np.uint64(1000003)
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            for i in range(1, k):
                powers[i] = powers[i - 1] * base
        rpow = powers[::-1].copy()
        mers = np.uint64(_MERSENNE)
        budget = max(self._CHUNK_BYTES // (k * 8), 4 * k)
        lo = 0
        while lo < len(enc):
            hi, nbytes = lo, 0
            while hi < len(enc) and (hi == lo or nbytes + len(enc[hi]) <= budget):
                nbytes += len(enc[hi])
                hi += 1
            chunk = enc[lo:hi]
            lens = np.fromiter((len(e) for e in chunk), np.int64, len(chunk))
            data = np.frombuffer(b"".join(chunk), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens)))
            windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
            with np.errstate(over="ignore"):
                h_all = (windows * rpow).sum(axis=1, dtype=np.uint64)
            n_i = lens - k + 1  # windows per doc (>=1: short docs padded)
            total = int(n_i.sum())
            doc_of = np.repeat(np.arange(len(chunk), dtype=np.int64), n_i)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(n_i)[:-1])), n_i
            )
            h = h_all[starts[:-1].repeat(n_i) + within]
            # per-doc unique shingles (== np.unique per doc)
            order = np.lexsort((h, doc_of))
            d_s, h_s = doc_of[order], h[order]
            keep = np.concatenate(
                ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1]))
            )
            d_u, h_u = d_s[keep], h_s[keep]
            seg = np.concatenate(([0], np.flatnonzero(np.diff(d_u)) + 1))
            # hash/min in cache-sized slabs: all num_perm rows x ~8k
            # shingles (~4 MB of temporaries) so the three elementwise
            # temps stay in LLC instead of streaming DRAM. Slab cuts land
            # on doc-segment boundaries so reduceat segments stay whole.
            out = np.empty((len(chunk), self.num_perm), dtype=np.uint64)
            a = self.a[:, None]
            b = self.b[:, None]
            target = 8192
            s0 = 0
            while s0 < len(seg):
                s1 = int(
                    np.searchsorted(seg, seg[s0] + target, side="left")
                )
                s1 = max(s1, s0 + 1)
                end = seg[s1] if s1 < len(seg) else len(h_u)
                with np.errstate(over="ignore"):
                    vals = (h_u[None, seg[s0] : end] * a + b) % mers
                out[s0:s1] = np.minimum.reduceat(
                    vals, seg[s0:s1] - seg[s0], axis=1
                ).T
                s0 = s1
            sigs[lo:hi] = out
            lo = hi
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        sigs = self.signatures_batch(texts)
        # band key: hash of the band's signature rows, salted by band index
        out_id, out_band, out_key = [], [], []
        for bi in range(self.bands):
            seg = sigs[:, bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
            key = (
                seg * np.uint64(1000003) ** np.arange(self.rows_per_band, dtype=np.uint64)
            ).sum(axis=1, dtype=np.uint64)
            key = key ^ np.uint64((bi * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            out_id.extend(ids.tolist())
            out_band.extend([bi] * len(ids))
            out_key.extend(key.astype(np.int64).tolist())
        return pa.table(
            {
                self.id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
            }
        )


def minhash_lsh_pairs(
    docs_ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=None,
    max_bucket_size: int = 512,
):
    """Candidate near-duplicate pairs via MinHash LSH banding: docs whose
    band signature collides in any band. Returns distinct (id_a, id_b),
    id_a < id_b. Buckets larger than ``max_bucket_size`` emit a chain
    instead of all pairs (see bucket_pairs) so one hot bucket cannot
    explode quadratically."""
    if concurrency is None:
        # SAFE default (min=1): several callers chain a second actor pool
        # after this one (md5-verify, components) — an eager half-cluster
        # floor here plus theirs would reserve every CPU slot and starve
        # the read/sort tasks on small clusters (the pool() docstring's
        # starvation mode). Single-pool plans that want the pre-started
        # half-cluster floor (Ray's backlog autoscaler otherwise runs 1-3
        # actors for a whole short stage; profiled round 5: 10.6 s of
        # signature work in 10.65 s wall at min=1) pass half_pool()
        # explicitly — bench.py's minhash workloads do.
        from ._cluster import pool

        concurrency = pool()
    banded = docs_ds.map_batches(
        MinHashKernel,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )

    # Bucket-count for the two exchanges below. Per-band-key map_groups
    # would call Python once per bucket (~40 us each — hours at 10^9
    # buckets); instead band keys are hash-folded into _NPART coarse
    # partitions and each partition processes ALL its buckets in one
    # vectorized pass (lexsort + run arithmetic). Same exchange volume,
    # O(_NPART) Python calls total.
    golden = np.uint64(0x9E3779B97F4A7C15)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        k = batch["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((k * golden) >> np.uint64(64 - _NPART_BITS)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    def bucket_pairs_vec(group: pa.Table) -> pa.Table:
        """All band buckets of one coarse partition in one vectorized
        pass (see grouped_pairs_table)."""
        return grouped_pairs_table(group, "band_key", id_col, cap=max_bucket_size)

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_pairs_vec, batch_format="pyarrow")
    )

    def block_distinct(batch: pa.Table) -> pa.Table:
        # pre-distinct inside each block before the exchange: the same
        # true pair collides in up to `bands` bands, so this cuts the
        # distinct-shuffle volume by up to that factor for free
        if len(batch) == 0 or "id_a" not in batch.column_names:
            # empty shuffle partitions emit zero-row bare-schema blocks
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        return batch.group_by(["id_a", "id_b"]).aggregate([])

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ((a * golden + b) * golden) >> np.uint64(64 - _NPART_BITS)
        return batch.append_column("bucket", pa.array(h.astype(np.int64), pa.int64()))

    def distinct_vec(group: pa.Table) -> pa.Table:
        return (
            group.select(["id_a", "id_b"]).group_by(["id_a", "id_b"]).aggregate([])
        )

    # distinct (id_a, id_b): same pair may collide in several bands
    return (
        pairs.map_batches(block_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(distinct_vec, batch_format="pyarrow")
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity (the verifier for LSH
    candidates)."""
    a = set(np.unique(_shingle_hashes(text_a, k)).tolist())
    b = set(np.unique(_shingle_hashes(text_b, k)).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------- simhash


_SIMHASH_MAX_TOKEN = 32  # tokens are hashed on their first 32 bytes


class SimHashKernel:
    """64-bit SimHash over token hashes; near-dups share hamming-close
    signatures. Emits the signature + 4 x 16-bit blocks as bucket keys
    (hamming distance <= 3 guarantees one identical block).

    The whole batch is hashed in one vectorized pass: all tokens of all
    docs form a single zero-padded byte matrix; token hashes are one
    polynomial matmul (zero padding contributes nothing, and utf-8 text
    never contains NUL so no cross-length collisions); per-doc bit votes
    aggregate with np.add.at. No per-token Python loop."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        base = np.uint64(1099511628211)  # FNV prime as the polynomial base
        with np.errstate(over="ignore"):
            p = np.empty(_SIMHASH_MAX_TOKEN, dtype=np.uint64)
            p[0] = np.uint64(1)
            for i in range(1, _SIMHASH_MAX_TOKEN):
                p[i] = p[i - 1] * base  # mod-2^64 wraparound intended
        self.powers = p
        self.bit_shifts = np.arange(64, dtype=np.uint64)

    def simhash_batch(self, texts: list[str]) -> np.ndarray:
        """Vectorized: texts -> uint64 signatures."""
        tokens: list[bytes] = []
        n_per_doc = np.empty(len(texts), dtype=np.int64)
        for di, t in enumerate(texts):
            toks = t.split()
            tokens.extend(tok.encode("utf-8")[:_SIMHASH_MAX_TOKEN] for tok in toks)
            n_per_doc[di] = len(toks)
        sigs = np.zeros(len(texts), dtype=np.uint64)
        if not tokens:
            return sigs
        lengths = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=len(tokens))
        joined = np.frombuffer(b"".join(tokens), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(lengths[:-1])])
        # polynomial hash, one vectorized pass per byte position (<= 32):
        # no (n_tokens x 32) matrix ever materializes
        h = np.zeros(len(tokens), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(int(lengths.max())):
                sel = lengths > i
                h[sel] += joined[starts[sel] + i].astype(np.uint64) * self.powers[i]
        # per-bit vote totals: 64 contiguous shift+reduceat passes (an
        # order of magnitude faster than any 2D bit-matrix layout here);
        # votes_j = 2 * ones_j - n_tokens
        nonempty = n_per_doc > 0
        n_ne = n_per_doc[nonempty]
        seg_starts = np.concatenate([[0], np.cumsum(n_ne[:-1])])
        ones = np.empty((64, len(n_ne)), dtype=np.uint64)
        one = np.uint64(1)
        for j in range(64):
            ones[j] = np.add.reduceat((h >> np.uint64(j)) & one, seg_starts)
        sig_bits = ((2 * ones.astype(np.int64) - n_ne[None, :]) > 0).astype(np.uint64)
        sigs[nonempty] = (sig_bits.T << self.bit_shifts[None, :]).sum(axis=1, dtype=np.uint64)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sigs = self.simhash_batch(batch[self.text_col].to_pylist())
        out = {
            self.id_col: pa.array(ids, pa.int64()),
            "simhash": pa.array(sigs.astype(np.int64), pa.int64()),
        }
        for blk in range(4):
            key = (sigs >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            out[f"block{blk}"] = pa.array(key.astype(np.int64), pa.int64())
        return pa.table(out)


# ------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(
    emb_ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
):
    """Cosine near-duplicate pairs via random-hyperplane LSH bucketing +
    exact in-bucket verification. Buckets = sign pattern of ``n_planes``
    projections; exact cosine computed inside each bucket only."""

    def project(batch: pa.Table) -> pa.Table:
        embs = emb_matrix(batch[emb_col])
        dim = embs.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        signs = (embs @ planes) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(keys.astype(np.int64), pa.int64()),
                emb_col: batch[emb_col],
            }
        )

    bucketed = emb_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def verify(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        embs = emb_matrix(group[emb_col])
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = embs / norms
        sim = unit @ unit.T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sim[ia, ib] >= threshold
        a, b = ids[ia[mask]], ids[ib[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "cosine": pa.array(sim[ia[mask], ib[mask]], pa.float64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")


# ----------------------------------------------------------- SemDeDup


def semantic_dedup(
    emb_ds,
    k: int = 8,
    n_iter: int = 6,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster
    the corpus embeddings, then inside each cluster mark every vector
    whose cosine to a LOWER-id cluster member is >= ``threshold`` as a
    semantic duplicate (keep iff NO strictly-lower-id cluster member is
    within threshold). Returns one (id, cluster_id, keep) row per input
    vector. ``threshold`` must be positive.

    Physical plan: ``kmeans_train_int`` (int64 fixed-point — bit-exact
    across block layouts) -> broadcast the (k, d) centroid matrix ->
    per-batch INTEGER argmin assignment (the training score kernel, so
    assignment is bit-identical to training's final E-step) -> ONE
    ``groupby(cluster_id)`` exchange -> in-cluster exact cosine verify
    (float64 matmul over id-sorted rows: each cluster lands on one
    worker, so the float reduction order is fixed and the result is
    layout-independent).

    Scale bounds, stated (SURVEY custom-op rule): this is the one dedup
    variant whose exchange moves the embedding payload (the verify needs
    vectors); pick k so a cluster's (n/k, d) block fits a worker, and
    the in-cluster O((n/k)^2) matmul is the SemDeDup cost model's own
    bound — for clusters beyond it, sub-bucket with the hyperplane-LSH
    trick of ``embedding_neardup_pairs``.
    """
    import ray as _ray

    from .similarity import kmeans_train_int

    if threshold <= 0:  # tril(...)-based verify assumes a positive cut
        raise ValueError("threshold must be > 0")
    cents, _counts = kmeans_train_int(emb_ds, k, n_iter=n_iter, emb_col=emb_col)
    cref = _ray.put(cents)

    class AssignKernel:
        def __init__(self, ref=cref):
            self.cents = _ray.get(ref)
            self.c_sq = np.sum(self.cents * self.cents, axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .similarity import _micro_block

            if len(batch) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "cluster_id": pa.array([], pa.int64()),
                        emb_col: batch[emb_col],
                    }
                )
            x = _micro_block(batch, emb_col)
            scores = self.c_sq[None, :] - 2 * (x @ self.cents.T)
            assign = np.argmin(scores, axis=1).astype(np.int64)
            return pa.table(
                {
                    id_col: pa.array(
                        batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                        pa.int64(),
                    ),
                    "cluster_id": pa.array(assign, pa.int64()),
                    emb_col: batch[emb_col],
                }
            )

    from ._cluster import pool

    assigned = emb_ds.map_batches(
        AssignKernel, batch_format="pyarrow", concurrency=pool(2), zero_copy_batch=True
    )

    def verify(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        cluster = int(group["cluster_id"][0].as_py())
        keep = np.ones(len(ids), bool)
        if len(ids) > 1:
            embs = emb_matrix(group[emb_col])[order]
            norms = np.linalg.norm(embs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = embs / norms
            sim = unit @ unit.T
            # dup if ANY strictly-lower-id row is >= threshold
            dup = (np.tril(sim, k=-1) >= threshold).any(axis=1)
            keep = ~dup
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster_id": pa.array(np.full(len(ids), cluster), pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return assigned.groupby("cluster_id").map_groups(verify, batch_format="pyarrow")


# ------------------------------------------- incremental dedup vs a store

def _md5_bucket(hexes: list[str], n_buckets: int) -> np.ndarray:
    """Deterministic bucket from the md5 hex prefix (uniform by
    construction); storage layout key, never part of the result."""
    return np.array([int(h[:8], 16) % n_buckets for h in hexes], np.int64)


def dedup_store_write(docs_ds, path: str, n_buckets: int = 64,
                      text_col: str = "text", id_col: str = "doc_id") -> str:
    """Persist a corpus' content-hash index for INCREMENTAL ingestion:
    ``path/bucket=<i>/*.parquet`` holding one (text_md5, rep_doc_id)
    row per distinct text — the payload never enters the store, and the
    md5 groupby reduction happens before the write so the store is
    already minimal. New shards then dedup against the corpus by
    probing ONLY the buckets their own hashes land in (targeted
    storage reads — the ivf_write_partitioned shape applied to dedup).
    """
    groups = exact_dedup_groups(docs_ds, text_col=text_col, id_col=id_col)

    def tag(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch["text_md5"].to_pylist(), n_buckets)
        return pa.table(
            {
                "text_md5": batch["text_md5"],
                "rep_doc_id": batch["rep_doc_id"],
                "bucket": pa.array(b, pa.int64()),
            }
        )

    groups.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        path, partition_cols=["bucket"]
    )
    return path


class StoreProbeKernel:
    """Actor-pool stage: dedup a new shard against a persisted store.
    Per batch, rows are hashed and grouped by bucket; each needed bucket
    is read ONCE from storage (per-actor cache, bounded by n_buckets
    index-only files) into a sorted-md5 probe array; membership is one
    searchsorted per bucket group. Emits (doc_id, text_md5, is_dup,
    dup_of) — dup_of is the corpus representative id or -1."""

    def __init__(self, store_path: str, n_buckets: int,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.store_path = store_path
        self.n_buckets = n_buckets
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _bucket_index(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._cache.get(b)
        if got is None:
            import os

            import pyarrow.parquet as pq

            d = f"{self.store_path}/bucket={b}"
            if os.path.isdir(d):
                t = pq.read_table(d, columns=["text_md5", "rep_doc_id"])
                md5s = np.asarray(t["text_md5"].to_pylist())
                reps = t["rep_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                order = np.argsort(md5s)
                got = (md5s[order], reps[order])
            else:  # no corpus row hashed into this bucket
                got = (np.empty(0, dtype="U32"), np.empty(0, np.int64))
            self._cache[b] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import md5_batch

        hashed = md5_batch(batch, text_col=self.text_col)
        hexes = hashed["text_md5"].to_pylist()
        ids = hashed[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = _md5_bucket(hexes, self.n_buckets)
        md5s = np.asarray(hexes)
        dup_of = np.full(len(ids), -1, np.int64)
        for b in np.unique(buckets):
            sorted_md5, reps = self._bucket_index(int(b))
            sel = buckets == b
            if len(sorted_md5) == 0:
                continue
            pos = np.searchsorted(sorted_md5, md5s[sel])
            pos_c = np.minimum(pos, len(sorted_md5) - 1)
            hit = sorted_md5[pos_c] == md5s[sel]
            vals = np.where(hit, reps[pos_c], -1)
            dup_of[sel] = vals
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "is_dup": pa.array(dup_of >= 0, pa.bool_()),
                "dup_of": pa.array(dup_of, pa.int64()),
            }
        )


def dedup_against_store(new_ds, store_path: str, n_buckets: int = 64,
                        text_col: str = "text", id_col: str = "doc_id",
                        concurrency=None):
    """New-shard rows -> (doc_id, is_dup, dup_of) against the persisted
    corpus index; no shuffle — the exchange already happened once at
    store-write time, every later shard streams straight through."""
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    return new_ds.map_batches(
        StoreProbeKernel,
        fn_constructor_kwargs=dict(
            store_path=store_path, n_buckets=n_buckets,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def edit_distance(a: str, b: str) -> int:
    """Unit-cost Levenshtein distance (DuckDB ``levenshtein`` parity),
    vectorized row DP: the insert relaxation ``cur[j] =
    min(c[j], cur[j-1]+1)`` is a prefix-min of ``c - j`` (so each DP row
    is pure numpy, no inner Python loop). Operates on UTF-8 BYTES —
    deliberately: DuckDB 1.0.0's ``levenshtein`` is byte-oriented
    (``levenshtein('日','a') = 3``), and the non-ASCII fuzz cases in
    tests/test_training_ops.py pin that parity. On codepoint-oriented
    engines, decode to utf-32 arrays instead."""
    A = np.frombuffer(a.encode("utf-8"), np.uint8)
    B = np.frombuffer(b.encode("utf-8"), np.uint8)
    if len(A) == 0:
        return len(B)
    if len(B) == 0:
        return len(A)
    ar = np.arange(len(B) + 1, dtype=np.int64)
    prev = ar.copy()
    for i, ca in enumerate(A, 1):
        c = np.empty(len(B) + 1, np.int64)
        c[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (B != ca), out=c[1:])
        cur = np.minimum(c, np.minimum.accumulate(c - ar) + ar)
        prev = cur
    return int(prev[-1])


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity (DuckDB ``jaro_winkler_similarity``
    parity: match window floor(max/2)-1, transpositions/2, Winkler
    prefix boost p=0.1 up to 4 chars when jaro > 0.7) — the fuzzy-match
    scalar for name/title matching. Vectorized per candidate row with
    numpy over UTF-8 BYTE arrays — deliberately: DuckDB 1.0.0's
    ``jaro_winkler_similarity`` is byte-oriented (verified:
    ``('日本語','日本') = 0.9333...`` = the 9-vs-6-byte jaro), and the
    non-ASCII fuzz cases pin that parity bit-close."""
    A = np.frombuffer(a.encode("utf-8"), np.uint8)
    B = np.frombuffer(b.encode("utf-8"), np.uint8)
    la, lb = len(A), len(B)
    if la == 0 or lb == 0:
        return 0.0  # DuckDB convention: any empty side (even both) -> 0
    window = max(max(la, lb) // 2 - 1, 0)
    b_taken = np.zeros(lb, bool)
    a_match = np.full(la, -1, np.int64)
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        cand = np.nonzero((B[lo:hi] == A[i]) & ~b_taken[lo:hi])[0]
        if len(cand):
            j = lo + int(cand[0])
            b_taken[j] = True
            a_match[i] = j
    m = int((a_match >= 0).sum())
    if m == 0:
        return 0.0
    # transpositions: compare the matched char SEQUENCES (A's matches in
    # a-order vs B's matched chars in b-order), mismatches / 2
    a_seq = A[a_match >= 0]
    b_seq = B[np.sort(a_match[a_match >= 0])]
    trans = int((a_seq != b_seq).sum()) // 2
    jaro = (m / la + m / lb + (m - trans) / m) / 3.0
    if jaro > 0.7:
        prefix = 0
        for i in range(min(4, la, lb)):
            if A[i] == B[i]:
                prefix += 1
            else:
                break
        jaro += prefix * 0.1 * (1.0 - jaro)
    return float(jaro)
