"""Deterministic epoch shuffle: global corpus reorder by a keyed hash.

The pre-epoch shuffle of LLM training pipelines — every document gets a
position in a pseudorandom permutation of the corpus, reproducible from
``(doc_id, seed)`` alone — expressed as ONE bounded exchange that never
moves the payload.

Physical plan (the 100-TB shape):

1. one pruned pass computes ``shuffle_key = splitmix64(doc_id + seed)``
   per row (vectorized uint64; splitmix64 is bijective, so distinct ids
   give distinct keys — no tie-breaking, and the permutation is exactly
   "sort by key"). Uniformity of the mix makes the key's TOP bits a
   perfect range partitioner: ``bucket = key >> (64 - log2 B)`` needs no
   sample-sort pass;
2. per-batch bucket-count partials -> ``groupby(bucket)`` of B rows ->
   exclusive cumsum on the driver (O(B));
3. a second keyed pass groups rows by bucket; each group sorts WITHIN
   the bucket by key and adds its broadcast bucket offset ->
   ``(doc_id, epoch_pos)``.

Only 16-byte ``(doc_id, key)`` rows cross the exchange — training
readers join ``epoch_pos`` back by ``doc_id`` (or the result is written
range-partitioned by ``epoch_pos`` and streamed in order). Partitioning
assumption (SURVEY custom-op rule): one bucket's rows fit in a worker —
at 10^12 docs pick B so each bucket holds ~10^8 rows.

No reference counterpart: rasterstats has no ordering operators (its
output order is the sequential generator's input order,
reference ``src/rasterstats/main.py:183``); this module serves the
driver's training-data-pipeline axis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import _splitmix64

EPOCH_BUCKETS = 64  # power of two: bucket = key >> (64 - log2 B)


def shuffle_keys(ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64(doc_id + seed) as uint64 (wraparound addition)."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.int64).astype(np.uint64) + np.uint64(seed % (1 << 64))
    return _splitmix64(z)


def epoch_shuffle(ds, seed: int = 0, id_col: str = "doc_id", n_buckets: int = EPOCH_BUCKETS):
    """Dataset[id_col, ...] -> Dataset[(id_col, epoch_pos)] sorted by id.

    ``epoch_pos`` is the row's rank in ascending ``splitmix64(id+seed)``
    order — a deterministic pseudorandom permutation of the corpus.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = shuffle_keys(ids, seed)
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64), pa.int64()),
                "skey": pa.array(key, pa.uint64()),
                "bucket": pa.array((key >> shift).astype(np.int64), pa.int64()),
            }
        )

    def bucket_partials(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(ub, pa.int64()), "c": pa.array(cnt.astype(np.int64))}
        )

    base = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    tot = (
        base.map_batches(bucket_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .sum("c")
        .to_pandas()
    )
    if tot.empty:
        import ray.data

        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "epoch_pos": pa.array([], pa.int64())})
        )
    tot = tot.sort_values("bucket")
    csum = tot["sum(c)"].cumsum().shift(fill_value=0)
    offsets = dict(zip(tot["bucket"].astype(int), csum.astype(int)))

    def assign(group: pa.Table) -> pa.Table:
        group = group.sort_by("skey")  # splitmix64 keys are distinct: total order
        off = offsets[int(group["bucket"][0].as_py())]
        return pa.table(
            {
                id_col: group[id_col],
                "epoch_pos": pa.array(
                    off + np.arange(len(group), dtype=np.int64), pa.int64()
                ),
            }
        )

    return base.groupby("bucket").map_groups(assign, batch_format="pyarrow").sort(id_col)


def corpus_mix(
    ds,
    weights: dict[str, float],
    budget: int,
    seed: int = 0,
    id_col: str = "doc_id",
    group_col: str = "lang",
):
    """Deterministic data-mixture selection: fill a ``budget``-doc corpus
    at the given per-domain ``weights`` (a DoReMi/DSIR-style mixture
    spec), choosing WITHIN each domain by smallest shuffle key — i.e.
    each domain contributes a seed-reproducible pseudorandom sample of
    exactly ``floor(weight * budget)`` docs (fewer if the domain is
    smaller). Domains absent from ``weights`` contribute nothing.

    Physical plan: per-batch PARTIAL top-k per domain (each batch emits
    at most quota rows per domain, so the exchange is bounded at
    #blocks x quota regardless of corpus size) -> ``groupby(domain)``
    of those partials -> final quota-smallest-keys per domain. Only
    (id, domain, key) rows move; the payload is re-attached by id
    downstream if needed.
    """
    quotas = {g: int(w * budget) for g, w in weights.items()}

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        groups = batch[group_col].to_pylist()
        key = shuffle_keys(ids, seed)
        out_ids: list[np.ndarray] = []
        out_grp: list[str] = []
        out_key: list[np.ndarray] = []
        garr = np.asarray(groups, dtype=object)
        for g, q in quotas.items():
            m = np.flatnonzero(garr == g)
            if len(m) == 0 or q <= 0:
                continue
            if len(m) > q:
                m = m[np.argsort(key[m], kind="stable")[:q]]
            out_ids.append(ids[m])
            out_grp.extend([g] * len(m))
            out_key.append(key[m])
        if not out_ids:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    group_col: pa.array([], pa.string()),
                    "skey": pa.array([], pa.uint64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids), pa.int64()),
                group_col: pa.array(out_grp, pa.string()),
                "skey": pa.array(np.concatenate(out_key), pa.uint64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        g = group[group_col][0].as_py()
        group = group.sort_by(
            [("skey", "ascending"), (id_col, "ascending")]
        ).slice(0, quotas[g])
        return pa.table({id_col: group[id_col], group_col: group[group_col]})

    return partials.groupby(group_col).map_groups(final_topk, batch_format="pyarrow").sort(id_col)


def token_budget_fill(
    ds,
    budgets: dict[str, int],
    seed: int = 0,
    id_col: str = "doc_id",
    group_col: str = "lang",
    size_col: str = "n_tokens",
    n_buckets: int = EPOCH_BUCKETS,
):
    """Budget-capped curation: within each domain, walk docs in shuffle-key
    order (a seed-reproducible pseudorandom order) and keep each doc iff
    it still fits the domain's remaining token budget under a straight
    cutoff — keep iff ``cum_tokens_before + n_tokens <= budget``. Domains
    absent from ``budgets`` are dropped.

    The grouped ORDERED PREFIX SUM is distributed with the two-pass
    bucket scheme of ``docs_pack_sequences``: the uniform shuffle key's
    top bits range-partition each domain into ``n_buckets`` buckets, so

    1. per-batch (domain, bucket, sum_tokens) partials -> groupby of
       |domains| x B rows -> exclusive cumsum per domain on the driver;
    2. groupby((domain, bucket)) sorts WITHIN the bucket by key, local
       cumsum + broadcast bucket offset -> keep decision per row.

    ``ds`` must carry (id, domain, size) columns — compute ``size_col``
    upstream (it is scanned twice; at 100 TB that beats materializing a
    corpus-sized intermediate, same trade as pack_sequences).
    Partitioning assumption: one (domain, bucket)'s thin rows fit a
    worker; size B accordingly.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.asarray(batch[group_col].to_pylist(), dtype=object)
        size = batch[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = shuffle_keys(ids, seed)
        m = np.flatnonzero(np.isin(grp, list(budgets)))
        return pa.table(
            {
                id_col: pa.array(ids[m], pa.int64()),
                group_col: pa.array(grp[m].tolist(), pa.string()),
                size_col: pa.array(size[m], pa.int64()),
                "skey": pa.array(key[m], pa.uint64()),
                "gb": pa.array(
                    [f"{g}#{b}" for g, b in zip(grp[m], (key[m] >> shift).astype(np.int64))],
                    pa.string(),
                ),
            }
        )

    def partials_fn(batch: pa.Table) -> pa.Table:
        gb = np.asarray(batch["gb"].to_pylist(), dtype=object)
        size = batch[size_col].to_numpy(zero_copy_only=False)
        ug, inv = np.unique(gb, return_inverse=True)
        sums = np.zeros(len(ug), np.int64)
        np.add.at(sums, inv, size)
        return pa.table(
            {"gb": pa.array(ug.tolist(), pa.string()), "c": pa.array(sums, pa.int64())}
        )

    base = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    tot = (
        base.map_batches(partials_fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gb")
        .sum("c")
        .to_pandas()
    )
    if tot.empty:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    group_col: pa.array([], pa.string()),
                    size_col: pa.array([], pa.int64()),
                }
            )
        )
    split = tot["gb"].str.rsplit("#", n=1, expand=True)
    tot["grp"] = split[0]
    tot["bucket"] = split[1].astype(int)
    tot = tot.sort_values(["grp", "bucket"])
    tot["off"] = tot.groupby("grp")["sum(c)"].cumsum() - tot["sum(c)"]
    offsets = dict(zip(tot["gb"], tot["off"].astype(int)))

    def fill(group: pa.Table) -> pa.Table:
        group = group.sort_by(
            [("skey", "ascending"), (id_col, "ascending")]
        ).combine_chunks()
        g = group[group_col][0].as_py()
        n = group[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        before = offsets[group["gb"][0].as_py()] + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        kept = group.filter(pa.array(before + n <= budgets[g]))
        return pa.table(
            {
                id_col: kept[id_col],
                group_col: kept[group_col],
                size_col: kept[size_col],
            }
        )

    return base.groupby("gb").map_groups(fill, batch_format="pyarrow").sort(id_col)


def select_top_exact(
    ds,
    frac: float,
    score_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Exact corpus-level top-``frac`` selection: keep the first
    ``k = floor(n * frac)`` rows in (score DESC, id ASC) order — the
    quality-threshold filter of a curation pipeline, made EXACT and
    order-independent without a global sort.

    Physical plan (two pruned passes, no corpus-sized exchange):

    1. per-batch (score -> count) partials over the integer score column
       -> ``groupby(score)`` of |distinct scores| thin rows -> driver
       cumsum in descending score order finds the boundary score ``t``:
       everything ABOVE ``t`` is kept outright, and ``m`` of the ties AT
       ``t`` still fit;
    2. the tie rows (score == t) alone are pulled to pick the ``m``
       smallest ids -> the (t, id_cut) pair broadcasts into a stateless
       filter: keep iff score > t OR (score == t AND id <= id_cut).

    Bounds (SURVEY custom-op rule): the distinct-score table and the
    boundary-tie id set must fit the driver — O(|distinct scores|) and
    O(ties at one score); a degenerate all-one-score corpus degrades to
    pulling k ids. Output: the kept (id, score) rows, id-sorted.
    """
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"frac must be in (0, 1], got {frac}")

    def score_counts(batch: pa.Table) -> pa.Table:
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    counts = (
        ds.map_batches(score_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .sum("c")
        .to_pandas()
        .sort_values("v", ascending=False)
    )
    import ray.data

    n = int(counts["sum(c)"].sum()) if len(counts) else 0
    k = int(np.floor(n * frac))
    if k == 0:
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), score_col: pa.array([], pa.int64())})
        )
    cum = counts["sum(c)"].cumsum().to_numpy()
    i_star = int(np.searchsorted(cum, k, side="left"))
    t = int(counts["v"].iloc[i_star])
    kept_above = int(cum[i_star - 1]) if i_star > 0 else 0
    m = k - kept_above

    def tie_ids(batch: pa.Table) -> pa.Table:
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.sort(ids[s == t])[:m]  # per-block partial top-m
        return pa.table({id_col: pa.array(sel, pa.int64())})

    ties = (
        ds.map_batches(tie_ids, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()[id_col]
        .to_numpy()
    )
    id_cut = int(np.sort(ties)[m - 1]) if m > 0 else None

    def keep(batch: pa.Table) -> pa.Table:
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = s > t
        if id_cut is not None:
            sel |= (s == t) & (ids <= id_cut)
        return pa.table(
            {
                id_col: pa.array(ids[sel], pa.int64()),
                score_col: pa.array(s[sel], pa.int64()),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).sort(id_col)


# ------------------------------------------------------- convex hull


def _hull_chain(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over int64 (x, y) rows, STRICT hull
    (collinear edge-interior points excluded). ``pts`` must be
    lexicographically sorted and unique. Exact integer cross products."""
    n = len(pts)
    if n <= 2:
        return pts

    def build(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                ax, ay = out[-2]
                bx, by = out[-1]
                if (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append((int(p[0]), int(p[1])))
        return out

    lower = build(pts)
    upper = build(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.int64)


def _extreme_prune(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized pre-prune: only the min/max y per distinct x can be
    hull vertices, so the sequential chain runs on <= 2 * distinct_x
    points (unique+scatter, no Python over raw rows)."""
    ux, inv = np.unique(x, return_inverse=True)
    big = np.iinfo(np.int64).max
    ymin = np.full(len(ux), big)
    ymax = np.full(len(ux), -big)
    np.minimum.at(ymin, inv, y)
    np.maximum.at(ymax, inv, y)
    cand = np.unique(
        np.concatenate(
            [np.stack([ux, ymin], axis=1), np.stack([ux, ymax], axis=1)]
        ),
        axis=0,
    )
    return cand


def convex_hull_points(ds, x_col: str = "x", y_col: str = "y"):
    """Distributed STRICT convex hull of an integer point set — the
    geometry instance of algebraic aggregation: hull(S ∪ T) =
    hull(hull(S) ∪ hull(T)), so each block reduces to its local hull
    (a vectorized min/max-y-per-x prune, then the monotone chain over
    the tiny candidate set) and only hull vertices cross the exchange;
    the driver merges the candidate union with one final chain. Returns
    a pyarrow Table (x, y) of hull vertices sorted lexicographically.
    Exactness: int64 coordinates make every cross product exact, and
    the strict (no collinear) rule makes the vertex set unique."""
    import pyarrow as pa

    def local(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) == 0:
            return pa.table({"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())})
        cand = _extreme_prune(x, y)
        hull = _hull_chain(cand)
        return pa.table(
            {"x": pa.array(hull[:, 0], pa.int64()), "y": pa.array(hull[:, 1], pa.int64())}
        )

    parts = [
        b for b in ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow") if len(b)
    ]
    if not parts:
        return pa.table({"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())})
    allc = pa.concat_tables(parts)
    pts = np.unique(
        np.stack(
            [allc["x"].to_numpy().astype(np.int64), allc["y"].to_numpy().astype(np.int64)],
            axis=1,
        ),
        axis=0,
    )
    hull = _hull_chain(_extreme_prune(pts[:, 0], pts[:, 1]))
    order = np.lexsort((hull[:, 1], hull[:, 0]))
    hull = hull[order]
    return pa.table(
        {"x": pa.array(hull[:, 0], pa.int64()), "y": pa.array(hull[:, 1], pa.int64())}
    )


# -------------------------------------------------- weighted sampling (A-ES)


_TWO64 = 18446744073709551616.0


def weighted_sample(
    ds,
    k: int = 10,
    seed: int = 0,
    id_col: str = "doc_id",
    group_col: str = "lang",
    text_col: str = "text",
):
    """Deterministic weighted sampling WITHOUT replacement, k per group:
    Efraimidis-Spirakis A-ES with weight = whitespace token count, i.e.
    keep each group's k largest u^(1/w) — computed as ln(u)/w (ties
    doc_id ascending) with u = (splitmix64(id+seed) + 1) / 2^64. The
    curation primitive "sample docs proportional to length/quality,
    reproducibly from (id, seed) alone" — no RNG state, so any worker
    can score any row.

    Physical plan: stateless pass computes (id, group, wkey) + per-batch
    PARTIAL top-k per group (the exchange is bounded at #blocks x k x
    #groups regardless of corpus size) -> groupby(group) of those thin
    partials -> final top-k per group. Payload never moves.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.asarray(batch[group_col].to_pylist(), dtype=object)
        w = (
            pc.count_substring_regex(batch[text_col], r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        w = np.maximum(w, 1.0)  # empty doc: weight floor (oracle: greatest(w,1))
        u = (shuffle_keys(ids, seed).astype(np.float64) + 1.0) / _TWO64
        akey = np.log(u) / w
        order = np.lexsort((ids, -akey, grp))
        g_s, a_s, i_s = grp[order], akey[order], ids[order]
        starts = np.concatenate(([0], np.flatnonzero(g_s[1:] != g_s[:-1]) + 1))
        rk = np.arange(len(g_s)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(g_s)])))
        )
        keep = rk < k
        return pa.table(
            {
                id_col: pa.array(i_s[keep], pa.int64()),
                group_col: pa.array(list(g_s[keep]), pa.string()),
                "wkey": pa.array(a_s[keep], pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        a = group["wkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -a))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                group_col: group[group_col].take(pa.array(order)),
                "wkey": pa.array(a[order], pa.float64()),
                "rk": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partials.groupby(group_col).map_groups(final, batch_format="pyarrow")
