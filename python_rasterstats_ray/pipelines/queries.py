"""Driver-contract query pipelines over the testdata tables.

Each ``q_*`` function takes ``sf_dir`` and returns a Ray Dataset / pandas
DataFrame whose columns match the paired oracle SQL in ``ORACLE_SQL``
exactly (the driver compares row counts, schema and order-insensitive
value hashes).

Design rules applied throughout (see repo SURVEY.md section 7):
- reads prune columns at the source (``read_parquet(columns=[...])``)
- aggregations are partial-per-batch (vectorized pandas/numpy) followed by
  a tiny groupby-of-partials — the full rows never enter the shuffle
- small join sides are broadcast (driver-side pyarrow read + ray.put),
  never shuffled
- per-batch kernels are Arrow/numpy vectorized
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages._cluster import pool


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _small_table(sf_dir: str, table: str, columns=None) -> pa.Table:
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _partial_final_groupby(ds, partial_fn, keys: list[str], final_fn):
    """Pre-aggregate inside map_batches (zero-copy Arrow), then groupby
    the tiny partials; ``final_fn`` merges one group's pa.Table (a
    handful of rows) — all-Arrow, no pandas conversion round-trip."""
    partials = ds.map_batches(partial_fn, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(keys).map_groups(final_fn, batch_format="pyarrow")


def _int_sum_merge(key_cols: list[str], sum_cols: list[str]):
    """Group-merge kernel for the common partial shape: carry the key
    columns through, int64-sum everything else. All-Arrow."""

    def merge(g: pa.Table) -> pa.Table:
        cols = {k: g[k][:1] for k in key_cols}
        for s in sum_cols:
            cols[s] = pa.array([int(pc.sum(g[s]).as_py())], pa.int64())
        return pa.table(cols)

    return merge


# ------------------------------------------------------------------ TPC-H


def _cents(col) -> np.ndarray:
    """Exact 2-decimal money column -> int64 hundredths. Makes distributed
    sums order-independent (bit-exact vs a DuckDB DECIMAL(.,2) sum cast to
    DOUBLE — verified identical on all testdata money columns)."""
    return np.round(np.asarray(col, dtype=np.float64) * 100.0).astype(np.int64)


def q_tpch_q1(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pd.Timestamp("1998-09-02")

    def partial(batch: pa.Table) -> pa.Table:
        # zero-copy Arrow path: filter + native hash aggregation, no pandas
        t = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff)))
        price100 = _cents(t["l_extendedprice"])
        disc100 = _cents(t["l_discount"])
        g = (
            pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty": t["l_quantity"],
                    "price100": pa.array(price100, pa.int64()),
                    # price (2dp) x (1 - disc) (2dp) is an exact 4dp value:
                    # accumulate in units of 1e-4 as int64
                    "disc_price4": pa.array(price100 * (100 - disc100), pa.int64()),
                    "disc100": pa.array(disc100, pa.int64()),
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("qty", "sum"),
                    ("price100", "sum"),
                    ("disc_price4", "sum"),
                    ("disc100", "sum"),
                    ("qty", "count"),
                ]
            )
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_price100",
                "sum_disc_price4",
                "sum_disc100",
                "count_order",
            ]
        )

    def final(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["count_order"]).as_py())
        sum_qty = float(pc.sum(g["sum_qty"]).as_py())
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"][:1],
                "l_linestatus": g["l_linestatus"][:1],
                "sum_qty": pa.array([sum_qty], pa.float64()),
                "sum_base_price": pa.array(
                    [int(pc.sum(g["sum_price100"]).as_py()) / 100.0], pa.float64()
                ),
                "sum_disc_price": pa.array(
                    [int(pc.sum(g["sum_disc_price4"]).as_py()) / 10000.0], pa.float64()
                ),
                "avg_qty": pa.array([sum_qty / n], pa.float64()),
                "avg_disc": pa.array(
                    [(int(pc.sum(g["sum_disc100"]).as_py()) / 100.0) / n], pa.float64()
                ),
                "count_order": pa.array([n], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        final, batch_format="pyarrow"
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       sum(l_quantity) / count(*) AS avg_qty,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_orders_by_nation(sf_dir: str):
    """Broadcast hash-join spelled Arrow-native: the small side ships once
    as (sorted custkeys, nation codes) numpy arrays via ray.put; each batch
    joins with one searchsorted gather and pre-aggregates with Arrow
    group_by — no pandas copy, no Python dict probe in the hot path."""
    import ray

    cust = _small_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _small_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    nk = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(ck)
    names = nation["n_name"].to_pylist()
    nkeys = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    code_of_nation = np.empty(int(nkeys.max()) + 1, dtype=np.int64)
    code_of_nation[nkeys] = np.arange(len(nkeys))
    ref = ray.put((ck[order], code_of_nation[nk[order]]))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class Lookup:
        def __init__(self):
            import ray as _r

            self.keys, self.codes = _r.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ok = batch["o_custkey"].to_numpy(zero_copy_only=False)
            code = self.codes[np.searchsorted(self.keys, ok)]
            t = pa.table(
                {
                    "n_code": pa.array(code, pa.int64()),
                    "rev100": pa.array(_cents(batch["o_totalprice"]), pa.int64()),
                }
            )
            return (
                t.group_by("n_code")
                .aggregate([("rev100", "count"), ("rev100", "sum")])
                .rename_columns(["n_code", "n_orders", "rev100"])
            )

    partials = ds.map_batches(
        Lookup, batch_format="pyarrow", concurrency=pool(), zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        code = int(g["n_code"][0].as_py())
        return pa.table(
            {
                "n_name": pa.array([names[code]], pa.string()),
                "n_orders": pa.array([pc.sum(g["n_orders"]).as_py()], pa.int64()),
                "total_revenue": pa.array(
                    [pc.sum(g["rev100"]).as_py() / 100.0], pa.float64()
                ),
            }
        )

    return partials.groupby("n_code").map_groups(final, batch_format="pyarrow")


SQL_ORDERS_BY_NATION = """
SELECT n_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_parts_by_brand(sf_dir: str):
    """Same Arrow-native broadcast-join shape as q_orders_by_nation:
    (sorted partkeys, brand codes) ship once; searchsorted gather + Arrow
    group_by partials per batch."""
    import ray

    part = _small_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(part["p_brand"].combine_chunks())
    brand_codes = enc.indices.to_numpy(zero_copy_only=False)
    brands = enc.dictionary.to_pylist()
    order = np.argsort(pk)
    ref = ray.put((pk[order], brand_codes.astype(np.int64)[order]))
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    class Lookup:
        def __init__(self):
            import ray as _r

            self.keys, self.codes = _r.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            code = self.codes[np.searchsorted(self.keys, lk)]
            rev4 = _cents(batch["l_extendedprice"]) * (100 - _cents(batch["l_discount"]))
            t = pa.table(
                {
                    "b_code": pa.array(code, pa.int64()),
                    "rev4": pa.array(rev4, pa.int64()),
                }
            )
            return (
                t.group_by("b_code")
                .aggregate([("rev4", "count"), ("rev4", "sum")])
                .rename_columns(["b_code", "n_items", "rev4"])
            )

    partials = ds.map_batches(
        Lookup, batch_format="pyarrow", concurrency=pool(), zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        code = int(g["b_code"][0].as_py())
        return pa.table(
            {
                "p_brand": pa.array([brands[code]], pa.string()),
                "n_items": pa.array([pc.sum(g["n_items"]).as_py()], pa.int64()),
                "revenue": pa.array([pc.sum(g["rev4"]).as_py() / 10000.0], pa.float64()),
            }
        )

    return partials.groupby("b_code").map_groups(final, batch_format="pyarrow")


SQL_PARTS_BY_BRAND = """
SELECT p_brand, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_top_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20)


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def q_top_docs_per_lang(sf_dir: str, k: int = 3):
    """Grouped top-k as a distributed primitive: every batch emits its own
    per-lang top-k partial (one lexsort + group-rank mask, Arrow-native,
    no Python row loop), and the final per-lang merge re-ranks only the
    tiny (n_langs x k x n_blocks) candidate set. The full table is never
    globally sorted and never crosses a shuffle — only candidates do."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_pylist())
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nch, lang))
        l_sorted = lang[order]
        _, starts = np.unique(l_sorted, return_index=True)
        grp_start = np.repeat(starts, np.diff(np.append(starts, len(l_sorted))))
        rank = np.arange(len(l_sorted)) - grp_start
        return batch.take(pa.array(order[rank < k]))

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pa.Table) -> pa.Table:
        nch = g["n_chars"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nch))[:k]
        out = g.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1), pa.int64())
        )

    return partials.groupby("lang").map_groups(final, batch_format="pyarrow")


SQL_TOP_DOCS_PER_LANG = """
SELECT doc_id, lang, n_chars, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents
) t WHERE rnk <= 3
"""


_SAMPLE_RATES = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.4}


def q_docs_stratified_sample(sf_dir: str):
    """Deterministic content-hash stratified sampling: keep a doc iff
    uniform(sha256(text)) < rate[lang]. A pure function of content — the
    sample is identical across runs, cluster sizes and row order (unlike
    RNG-state sampling), and each batch filters independently with no
    coordination. The training-data subsampling primitive."""
    from ..sources.synthetic import _sha_hash64

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def sample(batch: pa.Table) -> pa.Table:
        texts = np.asarray(batch["text"].to_pylist())
        langs = batch["lang"].to_pylist()
        u = (_sha_hash64(texts) % np.uint64(1_000_000)).astype(np.float64) / 1e6
        rates = np.fromiter(
            (_SAMPLE_RATES.get(la, 0.0) for la in langs), dtype=np.float64,
            count=len(langs),
        )
        keep = np.nonzero(u < rates)[0]
        return batch.take(pa.array(keep)).select(["doc_id", "lang"])

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def _stratified_sample_sql() -> str:
    le = " || ".join(f"substr(su, {off}, 2)" for off in (15, 13, 11, 9, 7, 5, 3, 1))
    rates = "\n            ".join(
        f"WHEN lang = '{la}' THEN {r!r}" for la, r in _SAMPLE_RATES.items()
    )
    return f"""
WITH h AS (
  SELECT doc_id, lang,
         CAST('0x' || {le} AS UBIGINT) AS hv
  FROM (SELECT doc_id, lang, sha256(text) AS su FROM documents)
)
SELECT doc_id, lang FROM h
WHERE (hv % CAST(1000000 AS UBIGINT)) / 1000000.0 <
      (CASE {rates} ELSE 0.0 END)
"""


def q_pages_host_stats(sf_dir: str):
    """Per-host aggregation over the Common-Crawl-style corpus: host
    parsed from the url with one Arrow regex kernel, per-batch partial
    aggregates (host, n_pages, total_tokens), tiny final merge — the
    host-level statistics every crawl pipeline starts with."""
    from ..sources.synthetic import pages_dataset

    ds = pages_dataset(10_000, seed=42)

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(batch["url"], r"^https://(?P<host>[^/]+)/"), "host"
        )
        n_tokens = pc.cast(
            pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
        )
        t = pa.table({"host": host, "n_tokens": n_tokens})
        return (
            t.group_by("host")
            .aggregate([("n_tokens", "count"), ("n_tokens", "sum")])
            .rename_columns(["host", "n_pages", "total_tokens"])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.array([g["host"][0].as_py()], pa.string()),
                "n_pages": pa.array([pc.sum(g["n_pages"]).as_py()], pa.int64()),
                "total_tokens": pa.array(
                    [pc.sum(g["total_tokens"]).as_py()], pa.int64()
                ),
            }
        )

    return partials.groupby("host").map_groups(final, batch_format="pyarrow")


def _pages_host_stats_sql() -> str:
    from ..sources.oracle_fixtures import ORACLE_DIR

    return f"""
SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       count(*) AS n_pages,
       CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens
FROM read_parquet('{ORACLE_DIR}/pages10k.parquet')
GROUP BY host
"""


def q_customer_segments(sf_dir: str):
    ds = _read(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["c_acctbal"], 0.0))
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "bal100": pa.array(_cents(batch["c_acctbal"]), pa.int64()),
            }
        )
        return (
            t.group_by("c_mktsegment")
            .aggregate([("bal100", "count"), ("bal100", "sum")])
            .rename_columns(["c_mktsegment", "n_customers", "bal100"])
        )

    def final(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"][:1],
                "n_customers": pa.array(
                    [int(pc.sum(g["n_customers"]).as_py())], pa.int64()
                ),
                "total_bal": pa.array(
                    [int(pc.sum(g["bal100"]).as_py()) / 100.0], pa.float64()
                ),
            }
        )

    return _partial_final_groupby(ds, partial, ["c_mktsegment"], final)


SQL_CUSTOMER_SEGMENTS = """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
"""


# ----------------------------------------------------------------- events


def q_events_by_type(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "v100": pa.array(_cents(batch["value"]), pa.int64()),
                "value": batch["value"],
            }
        )
        return (
            t.group_by("event_type")
            .aggregate(
                [
                    ("v100", "count"),
                    ("v100", "sum"),
                    ("value", "min"),
                    ("value", "max"),
                ]
            )
            .rename_columns(
                ["event_type", "n_events", "v100", "min_value", "max_value"]
            )
        )

    def final(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": g["event_type"][:1],
                "n_events": pa.array([int(pc.sum(g["n_events"]).as_py())], pa.int64()),
                "total_value": pa.array(
                    [int(pc.sum(g["v100"]).as_py()) / 100.0], pa.float64()
                ),
                "min_value": pa.array(
                    [pc.min(g["min_value"]).as_py()], g["min_value"].type
                ),
                "max_value": pa.array(
                    [pc.max(g["max_value"]).as_py()], g["max_value"].type
                ),
            }
        )

    return _partial_final_groupby(ds, partial, ["event_type"], final)


SQL_EVENTS_BY_TYPE = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type
"""


def q_events_running(sf_dir: str):
    """Per-key ORDERED window analytics (the SUM/ROW_NUMBER/LAG OVER
    operator class): every event annotated with its rank, running total
    and gap to the previous event of the same user in (ts, event_id)
    order. The running metric is exact integer cents
    ``floor(value * 100 + 0.5)`` — the identical three IEEE ops on both
    sides — so the cumulative int64 sums are order-rounding-free (a raw
    float running sum would depend on DuckDB's segment-tree association
    order). Same 64-user bucketed groupby as sessionize: one vectorized
    segmented-cumsum kernel per bucket, no per-user Python; documented
    bound: one bucket's events fit a worker."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("_kb", pc.shift_right(batch["user_id"], 6))

    def running_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        ).combine_chunks()
        ts = (
            g["ts"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        users = g["user_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            g["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(g)
        new_user = np.concatenate([[True], users[1:] != users[:-1]])
        starts = np.nonzero(new_user)[0]
        seg_id = np.cumsum(new_user) - 1
        total = np.cumsum(cents)
        base = (total[starts] - cents[starts])[seg_id]
        rk = np.arange(n, dtype=np.int64) - starts[seg_id] + 1
        gap = np.empty(n, np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        gap[starts] = 0  # nulled below
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "rk": pa.array(rk, pa.int64()),
                "run_sum_cents": pa.array(total - base, pa.int64()),
                # float64 with null firsts: nullable BIGINT lands as
                # float64 on the DuckDB->pandas side; gaps are exact
                # integers well under 2^53
                "gap_us": pa.array(gap.astype(np.float64), mask=new_user),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb")
        .map_groups(running_bucket, batch_format="pyarrow")
    )


SQL_EVENTS_RUNNING = """
SELECT event_id, user_id,
       row_number() OVER w AS rk,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS run_sum_cents,
       CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_lineitem_corr(sf_dir: str):
    """Exact distributed Pearson correlation (the statistical-aggregate
    class): corr(quantity, price) per returnflag from INTEGER moment
    sums — quantities are integers and prices exact cents, so the five
    moments are exact; per-batch int64 partials (one row per flag per
    batch) merge on the driver as Python bigints (no int64 overflow at
    any scale), and the final float64 expression converts each exact
    integer once (correctly rounded) then applies the identical IEEE
    chain as the SQL mirror — bit-exact despite floats."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        q = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        p = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        flags = batch["l_returnflag"].to_numpy(zero_copy_only=False)
        # int64-overflow guard for the np.add.at partials: the largest
        # single addend is max(p)^2; the explicit batch_size below keeps
        # rows-per-batch bounded, and this assert makes the bound
        # load-bearing rather than an accident of Ray defaults.
        worst = max(int(np.abs(p).max(initial=0)), int(np.abs(q).max(initial=0))) ** 2
        assert worst * len(q) < 2**62, "corr partial would overflow int64; shrink batch_size"
        uniq, inv = np.unique(flags, return_inverse=True)
        def acc(v):
            out = np.zeros(len(uniq), np.int64)
            np.add.at(out, inv, v)
            return out
        return pa.table(
            {
                "flag": pa.array(list(uniq), pa.string()),
                "n": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64), pa.int64()),
                "sq": pa.array(acc(q), pa.int64()),
                "sp": pa.array(acc(p), pa.int64()),
                "sqq": pa.array(acc(q * q), pa.int64()),
                "spp": pa.array(acc(p * p), pa.int64()),
                "sqp": pa.array(acc(q * p), pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
    ).to_pandas()
    rows = {"l_returnflag": [], "n": [], "corr_qty_price": []}
    for flag, g in parts.groupby("flag"):
        # Python bigints: exact at any corpus size
        n = int(g["n"].sum())
        sq = sum(int(x) for x in g["sq"])
        sp = sum(int(x) for x in g["sp"])
        sqq = sum(int(x) for x in g["sqq"])
        spp = sum(int(x) for x in g["spp"])
        sqp = sum(int(x) for x in g["sqp"])
        num = float(n * sqp - sq * sp)
        den = np.sqrt(float(n * sqq - sq * sq)) * np.sqrt(float(n * spp - sp * sp))
        rows["l_returnflag"].append(flag)
        rows["n"].append(n)
        rows["corr_qty_price"].append(num / den if den else None)
    return pd.DataFrame(rows)


SQL_LINEITEM_CORR = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sq,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sp,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sqq,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS spp,
         sum(CAST(l_quantity AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(n * sqp - sq * sp AS DOUBLE)
         / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
            * sqrt(CAST(n * spp - sp * sp AS DOUBLE))) AS corr_qty_price
FROM s
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str):
    """PIVOT + semi-structured extraction in one pass: per user, one
    column per event type (counts) plus the integer sum of the JSON
    ``props.k`` field — parsed with ONE vectorized regex per batch (the
    PII-scrub pattern), never a per-row json.loads. Per-batch partials
    (factorized users x np.bincount per type) merge in one thin
    groupby."""
    import re

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "props"])
    pat = re.compile(r'"k":\s*(-?\d+)')

    def partial(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        etype = batch["event_type"].to_numpy(zero_copy_only=False)
        props = pd.Series(batch["props"].to_pylist(), dtype="object")
        kvals = (
            props.str.extract(pat, expand=False).fillna("0").astype(np.int64).to_numpy()
        )
        uniq, uidx = np.unique(users, return_inverse=True)
        cols = {"user_id": pa.array(uniq, pa.int64())}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pa.array(
                np.bincount(uidx, weights=(etype == t).astype(np.float64),
                            minlength=len(uniq)).astype(np.int64),
                pa.int64(),
            )
        ksum = np.zeros(len(uniq), np.int64)
        np.add.at(ksum, uidx, kvals)
        cols["k_total"] = pa.array(ksum, pa.int64())
        return pa.table(cols)

    merge = _int_sum_merge(
        ["user_id"], [f"n_{t}" for t in EVENT_TYPES] + ["k_total"]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(merge, batch_format="pyarrow")
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'error') AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'view') AS n_view,
       CAST(sum(coalesce(
                TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT),
                0)) AS BIGINT) AS k_total
FROM events GROUP BY user_id
"""


WEEK_US = 7 * 24 * 3600 * 1_000_000


def q_events_retention(sf_dir: str):
    """Retention cohort analysis: users cohorted by the epoch week of
    their FIRST event; for every (cohort_week, week_offset), the number
    of cohort users active that week. All-integer week arithmetic
    (epoch-us floor-divided by a positive constant, where trunc == floor
    on both sides). Per 64-user bucket one vectorized pass derives each
    user's first week and distinct active weeks; buckets partition
    users, so per-bucket (cohort, offset, n) partials are disjoint and
    one thin groupby sums them."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("_kb", pc.shift_right(batch["user_id"], 6))

    def cohort_bucket(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        wk = ts // WEEK_US
        users = g["user_id"].to_numpy(zero_copy_only=False)
        uw = np.unique(np.stack([users, wk], axis=1), axis=0)  # distinct (user, week)
        uniq, uidx = np.unique(uw[:, 0], return_inverse=True)
        first = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(first, uidx, uw[:, 1])
        cohort = first[uidx]
        off = uw[:, 1] - cohort
        key = np.stack([cohort, off], axis=1)
        cells, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(cells[:, 0], pa.int64()),
                "week_offset": pa.array(cells[:, 1], pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb")
        .map_groups(cohort_bucket, batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": g["cohort_week"][:1],
                "week_offset": g["week_offset"][:1],
                "n_users": pa.array([int(pc.sum(g["n"]).as_py())], pa.int64()),
            }
        )

    return partials.groupby(["cohort_week", "week_offset"]).map_groups(
        merge, batch_format="pyarrow"
    )


SQL_EVENTS_RETENTION = f"""
WITH w AS (
  SELECT user_id, epoch_us(ts) // {WEEK_US} AS wk FROM events
),
f AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id),
act AS (
  SELECT DISTINCT w.user_id, f.cw, w.wk - f.cw AS off
  FROM w JOIN f USING (user_id)
)
SELECT CAST(cw AS BIGINT) AS cohort_week, CAST(off AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM act GROUP BY cw, off
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(sf_dir: str):
    """Ordered funnel analysis (product-analytics staple): per user, the
    earliest strictly-ordered completion of view -> click -> purchase —
    t1 = min ts(view), t2 = min ts(click) with ts > t1, t3 = min
    ts(purchase) with ts > t2 — and the step count reached (0-3).
    Vectorized per 64-user bucket: one integer scatter-min
    (np.minimum.at over factorized user indices) per step, no per-user
    Python; timestamps compare as exact epoch-us int64 and emit as
    float64 with NaN for unreached steps (the nullable-BIGINT pandas
    landing)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("_kb", pc.shift_right(batch["user_id"], 6))

    def funnel_bucket(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        users = g["user_id"].to_numpy(zero_copy_only=False)
        etype = g["event_type"].to_numpy(zero_copy_only=False)
        uniq, uidx = np.unique(users, return_inverse=True)
        n = len(uniq)
        INF = np.iinfo(np.int64).max
        prev = np.full(n, np.int64(-1))  # every ts > -1: step 1 unconstrained
        mins = []
        for step in FUNNEL_STEPS:
            cur = np.full(n, INF)
            sel = (etype == step) & (ts > prev[uidx])
            np.minimum.at(cur, uidx[sel], ts[sel])
            mins.append(cur)
            prev = cur
        t1, t2, t3 = mins
        step_reached = (
            (t1 < INF).astype(np.int64)
            + (t2 < INF).astype(np.int64)
            + (t3 < INF).astype(np.int64)
        )

        def col(t):
            return pa.array(t.astype(np.float64), mask=t >= INF)

        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "step_reached": pa.array(step_reached, pa.int64()),
                "t1_us": col(t1),
                "t2_us": col(t2),
                "t3_us": col(t3),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb")
        .map_groups(funnel_bucket, batch_format="pyarrow")
    )


SQL_EVENTS_FUNNEL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND epoch_us(e.ts) > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND epoch_us(e.ts) > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT u.user_id,
       CAST((s1.user_id IS NOT NULL)::BIGINT + (s2.user_id IS NOT NULL)::BIGINT
            + (s3.user_id IS NOT NULL)::BIGINT AS BIGINT) AS step_reached,
       CAST(s1.t1 AS DOUBLE) AS t1_us,
       CAST(s2.t2 AS DOUBLE) AS t2_us,
       CAST(s3.t3 AS DOUBLE) AS t3_us
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


def q_events_sessionize(sf_dir: str, gap_us: int = 1_800_000_000):
    """Per-user session count: a new session starts after a >30 min gap.
    Derived from the bucketed session_windows operator (one vectorized
    kernel per 64-user bucket, no per-user Python call) with an Arrow
    group_by rollup of the per-session rows."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("_kb", pc.shift_right(batch["user_id"], 6))

    def sessions_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        ).combine_chunks()
        ts = (
            g["ts"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        users = g["user_id"].to_numpy(zero_copy_only=False)
        new_user = np.concatenate([[True], users[1:] != users[:-1]])
        new_session = new_user | np.concatenate([[True], np.diff(ts) > gap_us])
        uidx = np.cumsum(new_user) - 1
        n_events = np.bincount(uidx)
        n_sessions = np.bincount(uidx, weights=new_session).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users[new_user], pa.int64()),
                "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb")
        .map_groups(sessions_bucket, batch_format="pyarrow")
    )


SQL_EVENTS_SESSIONIZE = """
SELECT user_id, count(*) AS n_events,
       CAST(1 + sum(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events) t
GROUP BY user_id
"""


# ------------------------------------------------------------- documents


def q_docs_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_groups(ds)


SQL_DOCS_EXACT_DEDUP = """
SELECT md5(text) AS text_md5, min(doc_id) AS rep_doc_id, count(*) AS dup_count
FROM documents GROUP BY md5(text)
"""


def q_docs_token_stats(sf_dir: str):
    """Per-lang corpus totals with BOTH token counters the brief names:
    whitespace runs and the BPE-ish pre-tokenizer segment count (the
    LLM token-budget estimate). Arrow-native partial-then-merge."""
    from ..stages.text import bpe_token_count_batch, token_count_batch

    ds = _read(sf_dir, "documents", columns=["lang", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        b = bpe_token_count_batch(token_count_batch(batch))
        return (
            b.select(["lang", "n_tokens", "n_bpe_tokens", "n_chars"])
            .group_by("lang")
            .aggregate(
                [
                    ("n_tokens", "count"),
                    ("n_tokens", "sum"),
                    ("n_bpe_tokens", "sum"),
                    ("n_chars", "sum"),
                ]
            )
            .rename_columns(
                ["lang", "n_docs", "total_tokens", "total_bpe_tokens", "total_chars"]
            )
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": pa.array([g["lang"][0].as_py()], pa.string()),
                "n_docs": pa.array([pc.sum(g["n_docs"]).as_py()], pa.int64()),
                "total_tokens": pa.array(
                    [pc.sum(g["total_tokens"]).as_py()], pa.int64()
                ),
                "total_bpe_tokens": pa.array(
                    [pc.sum(g["total_bpe_tokens"]).as_py()], pa.int64()
                ),
                "total_chars": pa.array([pc.sum(g["total_chars"]).as_py()], pa.int64()),
            }
        )

    return partials.groupby("lang").map_groups(final, batch_format="pyarrow")


SQL_DOCS_TOKEN_STATS = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
       CAST(sum(len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+')))
            AS BIGINT) AS total_bpe_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def q_docs_quality(sf_dir: str):
    from ..stages.text import quality_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def kernel(batch: pa.Table) -> pa.Table:
        b = quality_batch(batch)
        n_space = pc.cast(pc.count_substring_regex(batch["text"], r"\s"), pa.int64())
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars_calc": b["n_chars_calc"],
                "n_tokens": b["n_tokens"],
                "n_alpha": pc.cast(
                    pc.utf8_length(
                        pc.replace_substring_regex(batch["text"], "[^A-Za-z]", "")
                    ),
                    pa.int64(),
                ),
                "n_space": n_space,
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def q_corpus_curation(sf_dir: str, min_tokens: int = 50):
    """The composed training-data curation pipeline: quality filter
    (length floor + alpha-ratio >= 0.5, expressed as exact INTEGER
    predicates so no float compare can drift) -> language allowlist ->
    exact dedup keeping the min-id representative. Each stage is one of
    the engine's standalone operators; this query proves they compose
    into the end-to-end corpus-curation flow with a single SQL mirror."""
    from ..stages.dedup import exact_dedup_filter
    from ..stages.text import ALPHA_RE, TOKEN_RE

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    allow = pa.array(["en", "de", "fr", "es"], pa.string())

    def filt(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
        n_alpha = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(text, ALPHA_RE, "")), pa.int64()
        )
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(n_tokens, min_tokens),
                pc.greater_equal(pc.multiply(n_alpha, 2), n_chars),
            ),
            pc.is_in(batch["lang"], value_set=allow),
        )
        return batch.filter(keep)

    filtered = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    return exact_dedup_filter(filtered, keep_cols=["lang"])


SQL_CORPUS_CURATION = """
WITH q AS (
  SELECT doc_id, lang, text,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
)
SELECT doc_id, lang FROM q
WHERE n_tokens >= 50 AND 2 * n_alpha >= n_chars
  AND lang IN ('en', 'de', 'fr', 'es')
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
"""


def q_docs_hll_sketch(sf_dir: str, b: int = 10):
    """Distributed HyperLogLog cardinality sketch of the text column:
    per-batch partial sketches merged by register max — only <= 2^b
    (register, rho) rows ever shuffle. The register table is a pure
    function of sha256(text), so the ORACLE REPRODUCES THE SKETCH
    BIT-EXACTLY; estimate accuracy is pinned separately in pytest."""
    from ..stages.sketch import hll_sketch

    ds = _read(sf_dir, "documents", columns=["text"])
    return hll_sketch(ds, col="text", b=b)


def _hll_sketch_sql(b: int = 10) -> str:
    w = 64 - b
    low_mask = (1 << w) - 1
    le = " || ".join(f"substr(su, {off}, 2)" for off in (15, 13, 11, 9, 7, 5, 3, 1))
    return f"""
WITH h AS (
  SELECT CAST('0x' || {le} AS UBIGINT) AS hv
  FROM (SELECT sha256(text) AS su FROM documents)
),
rr AS (
  SELECT CAST(hv >> {w} AS BIGINT) AS register,
         CAST({w} + 1
              - length(ltrim(bin(hv & CAST({low_mask} AS UBIGINT)), '0'))
              AS BIGINT) AS rho
  FROM h
)
SELECT register, max(rho) AS max_rho FROM rr GROUP BY register
"""


def q_pages_host_cms(sf_dir: str, d: int = 4, w: int = 1024):
    """Count-min sketch of the host-frequency stream over the
    Common-Crawl-style corpus (host parsed per batch, d x w sum-combinable
    cells; only <= d*w rows shuffle). Exact-integer cells -> the oracle
    reproduces the sketch bit-exactly."""
    from ..sources.synthetic import pages_dataset
    from ..stages.sketch import cms_sketch

    ds = pages_dataset(10_000, seed=42)

    def hostify(batch: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(batch["url"], r"^https://(?P<host>[^/]+)/"), "host"
        )
        return pa.table({"host": host})

    hosts = ds.map_batches(hostify, batch_format="pyarrow", zero_copy_batch=True)
    return cms_sketch(hosts, col="host", d=d, w=w)


def _pages_host_cms_sql(d: int = 4, w: int = 1024) -> str:
    from ..sources.oracle_fixtures import ORACLE_DIR

    branches = []
    for j in range(d):
        base = 16 * j
        le = " || ".join(
            f"substr(su, {base + off}, 2)" for off in (15, 13, 11, 9, 7, 5, 3, 1)
        )
        branches.append(
            f"SELECT CAST({j} AS BIGINT) AS cms_row,\n"
            f"       CAST(CAST('0x' || {le} AS UBIGINT) % {w} AS BIGINT) AS cms_col\n"
            f"FROM h"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""
WITH h AS (
  SELECT sha256(regexp_extract(url, '^https://([^/]+)/', 1)) AS su
  FROM read_parquet('{ORACLE_DIR}/pages10k.parquet')
),
cells AS (
{union}
)
SELECT cms_row, cms_col, count(*) AS count
FROM cells GROUP BY cms_row, cms_col
"""


def q_url_canonical_dedup(sf_dir: str):
    """URL canonicalization dedup — the crawl-frontier primitive: every
    5th page (by sha256(url) % 5, deterministic) is PLANTED a tracking
    variant (?utm_source=feed&ref=rss), canonicalization strips the
    query/fragment, and a canonical-key groupby counts crawled variants
    per true page. Rows with n_variants = 2 are exactly the planted set."""
    from ..sources.synthetic import _sha_hash64, pages_dataset

    ds = pages_dataset(10_000, seed=42)

    def plant_and_canon(batch: pa.Table) -> pa.Table:
        urls = np.asarray(batch["url"].to_pylist())
        planted = (_sha_hash64(urls) % np.uint64(5)) == 0
        all_urls = np.concatenate(
            [urls, np.char.add(urls[planted], "?utm_source=feed&ref=rss")]
        )
        canon = pc.replace_substring_regex(
            pa.array(all_urls.tolist(), pa.string()), r"[?#].*$", ""
        )
        t = (
            pa.table({"canonical_url": canon})
            .group_by("canonical_url")
            .aggregate([("canonical_url", "count")])
            .rename_columns(["canonical_url", "n_variants"])
        )
        # coarse bucket = pure function of the group key, so each URL
        # group lands whole in one bucket and the merge below reduces
        # ALL its URL groups in one Arrow group_by (per-URL map_groups
        # would pay a Python call per distinct URL)
        b = _sha_hash64(np.asarray(t["canonical_url"].to_pylist())) % np.uint64(256)
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    partials = ds.map_batches(
        plant_and_canon, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        t = (
            g.select(["canonical_url", "n_variants"])
            .group_by("canonical_url")
            .aggregate([("n_variants", "sum")])
        )
        return pa.table(
            {
                "canonical_url": t["canonical_url"],
                "n_variants": t["n_variants_sum"].cast(pa.int64()),
            }
        )

    return partials.groupby("bucket").map_groups(final, batch_format="pyarrow")


def _url_canonical_sql() -> str:
    from ..sources.oracle_fixtures import ORACLE_DIR

    le = " || ".join(f"substr(su, {off}, 2)" for off in (15, 13, 11, 9, 7, 5, 3, 1))
    return f"""
WITH u AS (
  SELECT url, CAST('0x' || {le} AS UBIGINT) % 5 = 0 AS planted
  FROM (SELECT url, sha256(url) AS su
        FROM read_parquet('{ORACLE_DIR}/pages10k.parquet'))
),
stream AS (
  SELECT url FROM u
  UNION ALL
  SELECT url || '?utm_source=feed&ref=rss' FROM u WHERE planted
)
SELECT regexp_replace(url, '[?#].*$', '') AS canonical_url,
       count(*) AS n_variants
FROM stream GROUP BY canonical_url
"""


SQL_DOCS_QUALITY = """
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       len(regexp_extract_all(text, '\\s')) AS n_space
FROM documents
"""


# ------------------------------------------------------------ embeddings


def q_embeddings_knn(sf_dir: str, k: int = 10, n_queries: int = 5):
    from ..stages.similarity import knn_embeddings

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.less(qt["vec_id"], n_queries)
    qt = qt.filter(mask)
    qids = np.asarray(qt["vec_id"].to_pylist(), dtype=np.int64)
    qmat = np.stack(qt["embedding"].to_pylist()).astype(np.float64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_embeddings(ds, (qids, qmat), k=k)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "neighbor_id", "knn_rank"]) if "knn_rank" in batch.column_names else pa.table(
            {
                "query_id": batch["query_id"],
                "neighbor_id": batch["neighbor_id"],
                "knn_rank": batch["rank"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_EMBEDDINGS_KNN = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5
)
SELECT query_id, neighbor_id, knn_rank FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id
         ) AS knn_rank
  FROM q CROSS JOIN embeddings e
) t
WHERE knn_rank <= 10
"""


# ------------------------------------------------------- geospatial / docs


def _doc_points(ids) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic lon/lat per doc_id array; formula mirrored verbatim in
    the oracle SQL (same IEEE op order -> identical doubles)."""
    ids = np.asarray(ids, dtype=np.int64)
    lon = ((ids * 2654435761) % 360000) / 1000.0 - 180.0
    lat = ((ids * 40503) % 120000) / 1000.0 - 60.0
    return lon, lat


def q_docs_geocells(sf_dir: str):
    """Synthetic geotag -> engine grid-cell assignment -> per-cell zonal
    aggregation of n_chars (the cell-index operator with a SQL oracle)."""
    from ..functions.affine import Affine

    affine = Affine(10.0, 0.0, -180.0, 0.0, -10.0, 60.0)
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        lon, lat = _doc_points(batch["doc_id"].to_numpy(zero_copy_only=False))
        # vectorized rowcol (functions/affine.py parity): floor((y-f)/e), floor((x-c)/a)
        cell_row = np.floor((lat - affine.f) / affine.e).astype(np.int64)
        cell_col = np.floor((lon - affine.c) / affine.a).astype(np.int64)
        t = pa.table(
            {
                "cell_row": pa.array(cell_row, pa.int64()),
                "cell_col": pa.array(cell_col, pa.int64()),
                "n_chars": batch["n_chars"],
            }
        )
        return (
            t.group_by(["cell_row", "cell_col"])
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
            .rename_columns(["cell_row", "cell_col", "n_docs", "total_chars"])
        )

    final = _int_sum_merge(["cell_row", "cell_col"], ["n_docs", "total_chars"])
    return _partial_final_groupby(ds, partial, ["cell_row", "cell_col"], final)


def q_docs_quadkey_rollup(sf_dir: str):
    """Hierarchical quadtree-cell rollup (the H3/S2-style multi-resolution
    index over geotagged docs): each doc's synthetic geotag is assigned
    its level-6 quadtree cell (a 64x64 grid over the lon/lat domain) in
    PURE INTEGER arithmetic (milli-degree residues * 2^6 // domain — no
    floats anywhere), per-batch Arrow partials merge once at level 6,
    then ancestor levels 4 and 2 derive from level 6 by `>> 2` — the
    pyramid property: associative integer sums make level-from-level
    equal level-from-base, so the base table is scanned ONCE no matter
    how many levels roll up. Output: (level, cell_row, cell_col, n_docs,
    total_chars)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon_m = (ids * 2654435761) % 360000  # milli-degree residues
        lat_m = (ids * 40503) % 120000
        r6 = lat_m * 64 // 120000
        c6 = lon_m * 64 // 360000
        t = pa.table(
            {
                "cell_row": pa.array(r6, pa.int64()),
                "cell_col": pa.array(c6, pa.int64()),
                "n_chars": batch["n_chars"],
            }
        )
        return (
            t.group_by(["cell_row", "cell_col"])
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
            .rename_columns(["cell_row", "cell_col", "n_docs", "total_chars"])
        )

    merge6 = _int_sum_merge(["cell_row", "cell_col"], ["n_docs", "total_chars"])
    lvl6 = _partial_final_groupby(ds, partial, ["cell_row", "cell_col"], merge6)

    def fan_levels(batch: pa.Table) -> pa.Table:
        r = batch["cell_row"].to_numpy().astype(np.int64)
        c = batch["cell_col"].to_numpy().astype(np.int64)
        n = batch["n_docs"].to_numpy().astype(np.int64)
        ch = batch["total_chars"].to_numpy().astype(np.int64)
        lv, rr, cc = [], [], []
        for level, shift in ((6, 0), (4, 2), (2, 4)):
            lv.append(np.full(len(r), level, np.int64))
            rr.append(r >> shift)
            cc.append(c >> shift)
        k = 3
        return pa.table(
            {
                "level": pa.array(np.concatenate(lv), pa.int64()),
                "cell_row": pa.array(np.concatenate(rr), pa.int64()),
                "cell_col": pa.array(np.concatenate(cc), pa.int64()),
                "n_docs": pa.array(np.tile(n, k), pa.int64()),
                "total_chars": pa.array(np.tile(ch, k), pa.int64()),
            }
        )

    merge_lvl = _int_sum_merge(
        ["level", "cell_row", "cell_col"], ["n_docs", "total_chars"]
    )

    fanned = lvl6.map_batches(fan_levels, batch_format="pyarrow", zero_copy_batch=True)
    return fanned.groupby(["level", "cell_row", "cell_col"]).map_groups(
        merge_lvl, batch_format="pyarrow"
    )


# Quadkey rollup oracle: the identical integer cell derivation (milli-
# degree residues * 64 // domain) grouped per level; >> in DuckDB is the
# same arithmetic shift on BIGINT.
SQL_DOCS_QUADKEY_ROLLUP = """
WITH pts AS (
  SELECT CAST(((doc_id * 40503) % 120000) * 64 // 120000 AS BIGINT) AS r6,
         CAST(((doc_id * 2654435761) % 360000) * 64 // 360000 AS BIGINT) AS c6,
         n_chars
  FROM documents
), lv AS (
  SELECT 6 AS level, r6 AS cell_row, c6 AS cell_col, n_chars FROM pts
  UNION ALL
  SELECT 4, r6 >> 2, c6 >> 2, n_chars FROM pts
  UNION ALL
  SELECT 2, r6 >> 4, c6 >> 4, n_chars FROM pts
)
SELECT CAST(level AS BIGINT) AS level, cell_row, cell_col,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM lv GROUP BY level, cell_row, cell_col
"""


SQL_DOCS_GEOCELLS = """
WITH pts AS (
  SELECT doc_id, n_chars,
         ((doc_id * 2654435761) % 360000) / 1000.0 - 180.0 AS lon,
         ((doc_id * 40503) % 120000) / 1000.0 - 60.0 AS lat
  FROM documents
)
SELECT CAST(floor((lat - 60.0) / -10.0) AS BIGINT) AS cell_row,
       CAST(floor((lon - (-180.0)) / 10.0) AS BIGINT) AS cell_col,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM pts GROUP BY cell_row, cell_col
"""


# Rectangular zones with boundary offsets no geotag can hit (coords are
# multiples of 1e-3; bounds end in .0007/.0003).
_RECT_ZONES = [
    (0, -180.0007, -60.0007, -90.0003, 0.0003),
    (1, -90.0003, -60.0007, -0.0007, 0.0003),
    (2, -0.0007, -60.0007, 90.0003, 0.0003),
    (3, 90.0003, -60.0007, 180.0007, 0.0003),
    (4, -180.0007, 0.0003, -0.0007, 60.0007),
    (5, -0.0007, 0.0003, 180.0007, 60.0007),
]


def q_docs_pip_zones(sf_dir: str):
    """Point-in-polygon join of geotagged docs against literal rectangle
    zones, using the engine's even-odd PIP kernel (functions/pip.py)."""
    import ray

    from ..functions.geometry import from_wkb, make_box, to_wkb
    from ..functions.pip import points_in_geom

    zone_wkbs = [(zid, to_wkb(make_box(w, s, e, n))) for zid, w, s, e, n in _RECT_ZONES]
    ref = ray.put(zone_wkbs)

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    class PIPKernel:
        def __init__(self):
            import ray as _r

            self.zones = [(zid, from_wkb(w)) for zid, w in _r.get(ref)]

        def __call__(self, batch: pa.Table) -> pa.Table:
            lon, lat = _doc_points(batch["doc_id"].to_numpy(zero_copy_only=False))
            chars = batch["n_chars"].to_numpy(zero_copy_only=False)
            zids, docs, totals = [], [], []
            for zid, geom in self.zones:
                inside = points_in_geom(lon, lat, geom)
                if inside.any():
                    zids.append(zid)
                    docs.append(int(inside.sum()))
                    totals.append(int(chars[inside].sum()))
            return pa.table(
                {
                    "zone_id": pa.array(zids, pa.int64()),
                    "n_docs": pa.array(docs, pa.int64()),
                    "total_chars": pa.array(totals, pa.int64()),
                }
            )

    partials = ds.map_batches(
        PIPKernel, batch_format="pyarrow", concurrency=pool(), zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": pa.array([g["zone_id"][0].as_py()], pa.int64()),
                "n_docs": pa.array([pc.sum(g["n_docs"]).as_py()], pa.int64()),
                "total_chars": pa.array([pc.sum(g["total_chars"]).as_py()], pa.int64()),
            }
        )

    return partials.groupby("zone_id").map_groups(final, batch_format="pyarrow")


SQL_DOCS_PIP_ZONES = """
WITH zones(zone_id, xmin, ymin, xmax, ymax) AS (VALUES
  (0, -180.0007, -60.0007, -90.0003, 0.0003),
  (1, -90.0003, -60.0007, -0.0007, 0.0003),
  (2, -0.0007, -60.0007, 90.0003, 0.0003),
  (3, 90.0003, -60.0007, 180.0007, 0.0003),
  (4, -180.0007, 0.0003, -0.0007, 60.0007),
  (5, -0.0007, 0.0003, 180.0007, 60.0007)
),
pts AS (
  SELECT doc_id, n_chars,
         ((doc_id * 2654435761) % 360000) / 1000.0 - 180.0 AS lon,
         ((doc_id * 40503) % 120000) / 1000.0 - 60.0 AS lat
  FROM documents
)
SELECT CAST(zone_id AS BIGINT) AS zone_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM zones JOIN pts
  ON lon > xmin AND lon < xmax AND lat > ymin AND lat < ymax
GROUP BY zone_id
"""


def q_events_windowed(sf_dir: str, window_us: int = 3_600_000_000):
    """Tumbling 1-hour window aggregate over the events stream table."""
    from ..stages.temporal import tumbling_window_agg

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    return tumbling_window_agg(ds, window_us, value_scale=100)


SQL_EVENTS_WINDOWED = """
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def q_events_hopping(sf_dir: str):
    """Hopping (overlapping) 1-hour windows advancing every 15 minutes:
    each event fans out to 4 windows (vectorized np.repeat), then the
    usual partial/final groupby with exact scaled-int value sums."""
    from ..stages.temporal import hopping_window_agg

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    return hopping_window_agg(
        ds, window_us=3_600_000_000, hop_us=900_000_000, value_scale=100
    )


SQL_EVENTS_HOPPING = """
SELECT window_start, event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM (
  SELECT (epoch_us(ts) // 900000000) * 900000000 - s.i * 900000000 AS window_start,
         event_type, value
  FROM events CROSS JOIN generate_series(0, 3) AS s(i)
) t
GROUP BY window_start, event_type
"""


def q_events_sessions(sf_dir: str, gap_us: int = 1_800_000_000):
    """Session-window operator: one row per (user, session) with event
    count and [t_start, t_end] epoch-us bounds (gap > 30 min starts a new
    session; ties ordered by event_id)."""
    from ..stages.temporal import session_windows

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    return session_windows(ds, gap_us)


SQL_EVENTS_SESSIONS = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, t,
         sum(new_s) OVER (
           PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING
         ) - 1 AS session_idx
  FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       CAST(min(t) AS BIGINT) AS t_start, CAST(max(t) AS BIGINT) AS t_end
FROM s GROUP BY user_id, session_idx
"""


def q_events_session_attribution(sf_dir: str, gap_us: int = 1_800_000_000):
    """Range (interval) join: every event attributed to the session window
    containing it — sessions derived by the bucketed session_windows
    operator, then interval_join co-partitions events and session
    intervals by user bucket and assigns with one searchsorted per key
    slice. NO broadcast: the interval side scales with the data."""
    from ..stages.temporal import interval_join, session_windows

    events = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    sessions = session_windows(
        _read(sf_dir, "events", columns=["user_id", "event_id", "ts"]), gap_us
    )
    out = interval_join(events, sessions)

    def project(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["user_id", "event_id", "ts_us", "session_idx"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_EVENTS_SESSION_ATTRIBUTION = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, t AS ts_us,
       CAST(sum(new_s) OVER (
         PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING
       ) - 1 AS BIGINT) AS session_idx
FROM e
"""


def q_events_asof_orders(sf_dir: str):
    """As-of join: each event picks the user's latest order at or before
    the event time (ties: greatest orderkey). Unmatched events dropped to
    mirror the SQL inner join."""
    import pyarrow.compute as pc_

    from ..stages.temporal import asof_join

    build = _small_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    ).to_pandas()
    probe = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = asof_join(
        probe,
        build,
        key_col="user_id",
        build_key_col="o_custkey",
        probe_ts_col="ts",
        build_ts_col="o_orderdate",
        build_id_col="o_orderkey",
    )

    def project(batch: pa.Table) -> pa.Table:
        mask = pc_.is_valid(batch["asof_id"])
        b = batch.filter(mask)
        return pa.table(
            {"event_id": b["event_id"], "asof_orderkey": b["asof_id"]}
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_EVENTS_ASOF_ORDERS = """
SELECT event_id, asof_orderkey FROM (
  SELECT e.event_id, o.o_orderkey AS asof_orderkey,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) t WHERE rn = 1
"""


def q_docs_dedup_filtered(sf_dir: str):
    """Dedup applied as a filter: keep only each text's min-doc_id
    representative, returning the surviving rows (id, lang, n_chars).
    Single pass, fully distributed: md5 computed per batch (payload
    dropped immediately), one groupby(md5) picks the min-id row — nothing
    is ever materialized on the driver or broadcast back."""
    from ..stages.dedup import exact_dedup_filter

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars", "text"])
    return exact_dedup_filter(ds, keep_cols=["lang", "n_chars"])


SQL_DOCS_DEDUP_FILTERED = """
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
JOIN (
  SELECT md5(text) AS h, min(doc_id) AS m FROM documents GROUP BY md5(text)
) k ON md5(d.text) = k.h AND d.doc_id = k.m
"""


def q_orders_by_region(sf_dir: str):
    """4-table broadcast join (orders -> customer -> nation -> region),
    pre-collapsed driver-side to one (sorted custkeys, region codes) pair
    — the Arrow-native searchsorted-gather shape of q_orders_by_nation."""
    import ray

    cust = _small_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _small_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = _small_table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rnames = region["r_name"].to_pylist()
    rkeys = region["r_regionkey"].to_numpy(zero_copy_only=False)
    rcode_of = np.empty(int(rkeys.max()) + 1, dtype=np.int64)
    rcode_of[rkeys] = np.arange(len(rkeys))
    nkeys = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    nreg = nation["n_regionkey"].to_numpy(zero_copy_only=False)
    ncode_of = np.empty(int(nkeys.max()) + 1, dtype=np.int64)
    ncode_of[nkeys] = rcode_of[nreg]
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    nk = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(ck)
    ref = ray.put((ck[order], ncode_of[nk[order]]))
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class Lookup:
        def __init__(self):
            import ray as _r

            self.keys, self.codes = _r.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ok = batch["o_custkey"].to_numpy(zero_copy_only=False)
            code = self.codes[np.searchsorted(self.keys, ok)]
            t = pa.table(
                {
                    "r_code": pa.array(code, pa.int64()),
                    "rev100": pa.array(_cents(batch["o_totalprice"]), pa.int64()),
                }
            )
            return (
                t.group_by("r_code")
                .aggregate([("rev100", "count"), ("rev100", "sum")])
                .rename_columns(["r_code", "n_orders", "rev100"])
            )

    partials = ds.map_batches(
        Lookup, batch_format="pyarrow", concurrency=pool(), zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        code = int(g["r_code"][0].as_py())
        return pa.table(
            {
                "r_name": pa.array([rnames[code]], pa.string()),
                "n_orders": pa.array([pc.sum(g["n_orders"]).as_py()], pa.int64()),
                "total_revenue": pa.array(
                    [pc.sum(g["rev100"]).as_py() / 100.0], pa.float64()
                ),
            }
        )

    return partials.groupby("r_code").map_groups(final, batch_format="pyarrow")


SQL_ORDERS_BY_REGION = """
SELECT r_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_knn_points_geo(sf_dir: str, k: int = 5, n_queries: int = 100):
    """Grid-index kNN of the first ``n_queries`` geotagged docs against all
    docs (per-cell grid index actor stage, functions/state/grid_index.py).
    Ordering = (squared euclidean distance, doc_id) — reproduced verbatim
    by the SQL oracle."""
    import ray.data

    from ..stages.knn_points import knn_points

    full = _small_table(sf_dir, "documents", columns=["doc_id"])
    ids = np.asarray(full["doc_id"].to_pylist(), dtype=np.int64)
    lon, lat = _doc_points(ids)

    qmask = ids < n_queries
    queries = pa.table(
        {
            "pt_id": pa.array(ids[qmask], pa.int64()),
            "x": pa.array(lon[qmask], pa.float64()),
            "y": pa.array(lat[qmask], pa.float64()),
        }
    )
    out = knn_points(
        ray.data.from_arrow(queries), lon, lat, ids, k=k
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "neighbor_id", "knn_rank"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_KNN_POINTS_GEO = """
WITH pts AS (
  SELECT doc_id,
         ((doc_id * 2654435761) % 360000) / 1000.0 - 180.0 AS lon,
         ((doc_id * 40503) % 120000) / 1000.0 - 60.0 AS lat
  FROM documents
),
q AS (SELECT * FROM pts WHERE doc_id < 100)
SELECT query_id, neighbor_id, knn_rank FROM (
  SELECT q.doc_id AS query_id, p.doc_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.doc_id
           ORDER BY (q.lon - p.lon) * (q.lon - p.lon)
                    + (q.lat - p.lat) * (q.lat - p.lat),
                    p.doc_id
         ) AS knn_rank
  FROM q CROSS JOIN pts p
) t
WHERE knn_rank <= 5
"""


def q_knn_ivf_exact(sf_dir: str, k: int = 10, n_queries: int = 3):
    """IVF kNN in its exact limit: nprobe = n_centroids probes every
    partition, so the full IVF machinery (centroid training, list
    assignment, probe routing, partial top-k + merge) must reproduce the
    brute-force answer — which the SQL oracle computes directly."""
    import ray.data

    from ..stages.similarity import knn_ivf, train_centroids

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = _small_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt["vec_id"], n_queries))
    qids = np.asarray(qt["vec_id"].to_pylist(), dtype=np.int64)
    qmat = np.stack(qt["embedding"].to_pylist()).astype(np.float64)
    cents = train_centroids(ds, n_centroids=8)
    out = knn_ivf(ds, (qids, qmat), cents, k=k, nprobe=8)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch["query_id"],
                "neighbor_id": batch["neighbor_id"],
                "knn_rank": batch["rank"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_KNN_IVF_EXACT = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3
)
SELECT query_id, neighbor_id, knn_rank FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id
         ) AS knn_rank
  FROM q CROSS JOIN embeddings e
) t
WHERE knn_rank <= 10
"""


def q_embedding_neardup(sf_dir: str, threshold: float = 0.95, n_base: int = 1000):
    """Hyperplane-LSH near-duplicate pairs with PLANTED exact duplicates
    (ids shifted by 10^9): identical vectors always collide in every LSH
    bucket, so the planted pairs are guaranteed output — giving this
    approximate operator a deterministic, SQL-checkable core. Projected to
    (id_a, id_b); the cosine column is dropped (numpy vs DuckDB cosine
    differ in the last ulp)."""
    import ray.data

    from ..stages.dedup import embedding_neardup_pairs

    base_tbl = _small_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    base_tbl = base_tbl.filter(pc.less(base_tbl["vec_id"], n_base))
    dup_tbl = base_tbl.filter(pc.less(base_tbl["vec_id"], 20))
    dup_tbl = dup_tbl.set_column(
        0, "vec_id", pc.add(dup_tbl["vec_id"], pa.scalar(1_000_000_000, pa.int64()))
    )
    ds = ray.data.from_arrow(base_tbl).union(ray.data.from_arrow(dup_tbl))
    out = embedding_neardup_pairs(ds, threshold=threshold)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["id_a", "id_b"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_EMBEDDING_NEARDUP = """
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
),
al AS (
  SELECT * FROM base
  UNION ALL
  SELECT vec_id + 1000000000 AS vec_id, embedding FROM base WHERE vec_id < 20
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM al a JOIN al b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.95
"""


def _planted_dup_docs(sf_dir: str, n_base: int = 300, n_dup: int = 30):
    """documents subset + exact-duplicate rows (ids shifted by 10^9) — the
    deterministic core for candidate-generation oracles: identical texts
    are GUARANTEED to collide (identical shingles/signatures), and an
    md5-equality verify drops any accidental candidate on both sides."""
    base = _small_table(sf_dir, "documents", columns=["doc_id", "text"])
    base = base.filter(pc.less(base["doc_id"], n_base))
    dup = base.filter(pc.less(base["doc_id"], n_dup))
    dup = dup.set_column(
        0, "doc_id", pc.add(dup["doc_id"], pa.scalar(1_000_000_000, pa.int64()))
    )
    return base, dup


def _md5_verified_pairs(pairs_ds, base: pa.Table, dup: pa.Table):
    """Filter candidate (id_a, id_b) pairs to md5-equal texts via a
    broadcast id->md5 map (tiny: the planted subset only)."""
    import hashlib

    import ray

    md5s = {}
    for tbl in (base, dup):
        for i, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
            md5s[int(i)] = hashlib.md5(t.encode()).hexdigest()
    ref = ray.put(md5s)

    class Verify:
        def __init__(self):
            import ray as _r

            self.md5s = _r.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                (self.md5s.get(int(x)) == self.md5s.get(int(y)) for x, y in zip(a, b)),
                dtype=bool,
                count=len(a),
            )
            return batch.filter(pa.array(keep)).select(["id_a", "id_b"])

    return pairs_ds.map_batches(
        Verify, batch_format="pyarrow", concurrency=pool(divisor=2), zero_copy_batch=True
    )


def q_minhash_dup_pairs(sf_dir: str):
    """MinHash+LSH banding over the planted-duplicate corpus, verified by
    md5 equality: drives shingling, signatures, band bucketing and bucket
    pairing end-to-end with a deterministic SQL-checkable result."""
    import ray.data

    from ..stages.dedup import minhash_lsh_pairs

    base, dup = _planted_dup_docs(sf_dir)
    ds = ray.data.from_arrow(base).union(ray.data.from_arrow(dup))
    return _md5_verified_pairs(minhash_lsh_pairs(ds), base, dup)


def q_simhash_dup_pairs(sf_dir: str):
    """SimHash signatures over the planted-duplicate corpus: identical
    texts share the full 64-bit signature, so groupby(simhash) pairing +
    md5 verify yields exactly the duplicate pairs."""
    import ray.data

    from ..stages.dedup import SimHashKernel

    base, dup = _planted_dup_docs(sf_dir)
    ds = ray.data.from_arrow(base).union(ray.data.from_arrow(dup))
    sigs = ds.map_batches(
        SimHashKernel, batch_format="pyarrow", concurrency=pool(divisor=2), zero_copy_batch=True
    )

    from ..stages.dedup import grouped_pairs_table

    golden = np.uint64(0x9E3779B97F4A7C15)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        k = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((k * golden) >> np.uint64(56)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    def sig_pairs_vec(group: pa.Table) -> pa.Table:
        # all signature groups of the coarse partition in one pass
        return grouped_pairs_table(group, "simhash", "doc_id")

    pairs = (
        sigs.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sig_pairs_vec, batch_format="pyarrow")
    )
    return _md5_verified_pairs(pairs, base, dup)


SQL_PLANTED_DUP_PAIRS = """
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
al AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text FROM base WHERE doc_id < 30
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM al a JOIN al b ON a.doc_id < b.doc_id AND md5(a.text) = md5(b.text)
"""


def q_docs_fuzzy_dedup(sf_dir: str):
    """The COMPLETE fuzzy-dedup pipeline a 100-TB corpus runs end to end:
    MinHash-LSH candidate pairs -> md5 verify -> connected components
    over the verified-pair graph (components_auto: broadcast min-label
    here, shuffle-join plan beyond the node bound) -> canonical survivor
    = min doc_id per cluster. One row per doc: (doc_id, cluster_id,
    keep). Oracle: verified pairs are md5-equality relations, so the
    pair graph's components are exactly the md5 equivalence classes —
    SQL window MIN over PARTITION BY md5(text)."""
    import ray.data

    from ..stages.dedup import minhash_lsh_pairs
    from ..stages.graph import components_auto

    base, dup = _planted_dup_docs(sf_dir)
    ds = ray.data.from_arrow(base).union(ray.data.from_arrow(dup))
    pairs = _md5_verified_pairs(minhash_lsh_pairs(ds), base, dup)

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["id_a"], "dst": batch["id_b"]})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    nodes = ds.select_columns(["doc_id"])
    cc = components_auto(edges, nodes, n_nodes=base.num_rows + dup.num_rows)

    def finish(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = batch["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(node, pa.int64()),
                "cluster_id": pa.array(lbl, pa.int64()),
                "keep": pa.array(node == lbl, pa.bool_()),
            }
        )

    return cc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


SQL_DOCS_FUZZY_DEDUP = """
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
al AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text FROM base WHERE doc_id < 30
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
FROM al
ORDER BY doc_id
"""


def q_docs_edit_pairs(sf_dir: str, max_dist: int = 20, n_base: int = 200):
    """Near-duplicate pairs by exact EDIT DISTANCE <= 20 (the
    string-similarity join), found via MinHash-LSH candidates and
    verified with a vectorized Levenshtein DP (DuckDB ``levenshtein``
    parity, fuzz-tested). Same determinism argument as
    docs_jaccard_pairs: every <= 20-edit pair of ~200-char docs has
    5-gram jaccard far above the 16-band LSH miss regime, so the SQL
    oracle — all-pairs levenshtein over the same subset — reproduces
    the result exactly."""
    import ray
    import ray.data

    from ..stages.dedup import edit_distance, minhash_lsh_pairs

    base = _small_table(sf_dir, "documents", columns=["doc_id", "text"])
    base = base.filter(pc.less(base["doc_id"], n_base))
    texts = dict(zip(base["doc_id"].to_pylist(), base["text"].to_pylist()))
    tref = ray.put(texts)
    cands = minhash_lsh_pairs(ray.data.from_arrow(base))

    class Verify:
        def __init__(self):
            import ray as _r

            self.texts = _r.get(tref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_pylist()
            b = batch["id_b"].to_pylist()
            ed = [edit_distance(self.texts[x], self.texts[y]) for x, y in zip(a, b)]
            keep = [e <= max_dist for e in ed]
            out = pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "edit_dist": pa.array(ed, pa.int64()),
                }
            )
            return out.filter(pa.array(keep))

    verified = cands.map_batches(
        Verify, batch_format="pyarrow", concurrency=pool(divisor=2), zero_copy_batch=True
    )
    seed = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "edit_dist": pa.array([], pa.int64()),
            }
        )
    )
    return seed.union(verified)


SQL_DOCS_EDIT_PAIRS = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 20
"""


DAY_US = 24 * 3600 * 1_000_000


def q_orders_daily_ma(sf_dir: str):
    """Calendar gap-fill + trailing moving window (time-series
    densification): daily order-revenue totals in exact cents, densified
    over EVERY day between the corpus min and max (missing days = 0,
    n_orders 0) and annotated with the 7-day trailing moving sum. The
    distributed part is the thin per-day pre-aggregation (one row per
    day per block enters the shuffle); the dense day axis and the
    integer window run vectorized on the driver-side result (one row per
    calendar day — bounded by time, not data)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        days = (
            batch["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view("int64") // DAY_US
        )
        cents = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        ud, inv = np.unique(days, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, cents)
        return pa.table(
            {
                "day": pa.array(ud, pa.int64()),
                "n": pa.array(np.bincount(inv, minlength=len(ud)).astype(np.int64), pa.int64()),
                "cents": pa.array(tot, pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum(["n", "cents"])
        .to_pandas()
    )
    days = parts["day"].to_numpy().astype(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dense_n = np.zeros(hi - lo + 1, np.int64)
    dense_c = np.zeros(hi - lo + 1, np.int64)
    dense_n[days - lo] = parts["sum(n)"].to_numpy().astype(np.int64)
    dense_c[days - lo] = parts["sum(cents)"].to_numpy().astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(dense_c)])
    ma7 = cum[1:] - cum[np.maximum(np.arange(len(dense_c)) - 6, 0)]
    return pd.DataFrame(
        {
            "day": np.arange(lo, hi + 1, dtype=np.int64),
            "n_orders": dense_n,
            "cents": dense_c,
            "ma7_cents": ma7.astype(np.int64),
        }
    )


SQL_ORDERS_DAILY_MA = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {DAY_US} AS day,
         count(*) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY day
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
dense AS (
  SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(coalesce(da.n, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(da.cents, 0) AS BIGINT) AS cents,
       CAST(sum(coalesce(da.cents, 0)) OVER (
            ORDER BY d.day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS ma7_cents
FROM dense d LEFT JOIN daily da ON da.day = d.day
"""


def q_orders_skyline(sf_dir: str):
    """Distributed 2-D SKYLINE (Pareto front — the multi-objective
    dominance operator): orders not dominated on (totalprice MAX,
    orderdate MIN); a dominates b iff price >= AND date <= with at
    least one strict. Dominance is transitive, so the global skyline is
    a subset of the union of per-block local skylines — each block
    prunes to its own front (vectorized: sort by (-price, date), a row
    survives iff its date is strictly below the running min of all
    strictly-better-priced rows), and only the tiny candidate union
    reaches the final exact prune. Prices compare as exact cents.
    Output: (o_orderkey, price_cents, date_us)."""

    def local_skyline(prices: np.ndarray, dates: np.ndarray, keys: np.ndarray):
        # vectorized sweep over descending price groups: a row survives
        # iff its date equals its price-group's min (equal-price rows
        # with a later date are dominated within the group; ties on BOTH
        # dims dominate neither way and all survive) AND that group min
        # beats the running min date of all strictly-higher-price groups
        order = np.lexsort((dates, -prices))
        p, d, k = prices[order], dates[order], keys[order]
        n = len(p)
        keep = np.zeros(n, bool)
        best_prev = np.iinfo(np.int64).max
        i = 0
        while i < n:
            j = i
            while j < n and p[j] == p[i]:
                j += 1
            gmin = int(d[i:j].min())
            if gmin < best_prev:
                keep[i:j] = d[i:j] == gmin
                best_prev = gmin
            i = j
        return k[keep], p[keep], d[keep]

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        prices = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dates = (
            batch["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view("int64")
        )
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k, p, d = local_skyline(prices, dates, keys)
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "price_cents": pa.array(p, pa.int64()),
                "date_us": pa.array(d, pa.int64()),
            }
        )

    cands = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy().astype(np.int64)
        p = batch["price_cents"].to_numpy().astype(np.int64)
        d = batch["date_us"].to_numpy().astype(np.int64)
        k2, p2, d2 = local_skyline(p, d, keys)
        return pa.table(
            {
                "o_orderkey": pa.array(k2, pa.int64()),
                "price_cents": pa.array(p2, pa.int64()),
                "date_us": pa.array(d2, pa.int64()),
            }
        )

    # the candidate union is tiny (skylines shrink fast); one final task
    return cands.repartition(1).map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


SQL_ORDERS_SKYLINE = """
WITH o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         epoch_us(o_orderdate) AS date_us
  FROM orders
)
SELECT o_orderkey, price_cents, CAST(date_us AS BIGINT) AS date_us
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.price_cents >= a.price_cents AND b.date_us <= a.date_us
    AND (b.price_cents > a.price_cents OR b.date_us < a.date_us)
)
"""


JW_PROBE = "table scan fast value sort merge batch"


def q_docs_fuzzy_score(sf_dir: str, n_base: int = 200):
    """Query-to-corpus fuzzy match scoring: Jaro-Winkler similarity of
    every doc (doc_id < 200) against a fixed probe string — the fuzzy
    record-linkage scalar (name/title matching). No threshold, so the
    row set is exact and the float similarity compares under the
    oracle's 1e-9 tolerance (the from-scratch scorer is fuzz-tested to
    1e-9 against DuckDB's jaro_winkler_similarity over 800 cases).
    Stateless scan."""
    from ..stages.dedup import jaro_winkler

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less(batch["doc_id"], n_base))
        jw = [jaro_winkler(x, JW_PROBE) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "jw": pa.array(jw, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOCS_FUZZY_SCORE = f"""
SELECT doc_id, jaro_winkler_similarity(text, '{JW_PROBE}') AS jw
FROM documents WHERE doc_id < 200
"""


def q_docs_jaccard_pairs(sf_dir: str, threshold: float = 0.8, n_base: int = 200):
    """Near-duplicate pairs by exact character-5-gram Jaccard >= 0.8,
    found via MinHash-LSH candidate generation and verified with
    ngram_jaccard (the LSH verifier operator). The testdata contains real
    near-duplicates (max pair jaccard ~0.986); at >= 0.8 the 16-band LSH
    miss probability is < 4e-8 and the run is deterministic (fixed seeds),
    so the SQL oracle — exact 5-gram set jaccard over the same ASCII
    subset — reproduces the result."""
    import ray

    from ..stages.dedup import minhash_lsh_pairs, ngram_jaccard

    base = _small_table(sf_dir, "documents", columns=["doc_id", "text"])
    base = base.filter(pc.less(base["doc_id"], n_base))
    texts = dict(zip(base["doc_id"].to_pylist(), base["text"].to_pylist()))
    tref = ray.put(texts)

    import ray.data

    cands = minhash_lsh_pairs(ray.data.from_arrow(base))

    class Verify:
        def __init__(self):
            import ray as _r

            self.texts = _r.get(tref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_pylist()
            b = batch["id_b"].to_pylist()
            jacc = [ngram_jaccard(self.texts[x], self.texts[y]) for x, y in zip(a, b)]
            keep = [j >= threshold for j in jacc]
            out = pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "jaccard": pa.array(jacc, pa.float64()),
                }
            )
            return out.filter(pa.array(keep))

    verified = cands.map_batches(
        Verify, batch_format="pyarrow", concurrency=pool(divisor=2), zero_copy_batch=True
    )
    # schema stability: with zero candidate pairs (e.g. a corpus slice
    # with no near-dups) the empty result would lose its columns; a
    # 0-row typed seed keeps the output schema fixed
    seed = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    )
    return seed.union(verified)


SQL_DOCS_JACCARD_PAIRS = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
sh AS (
  SELECT DISTINCT doc_id, substring(text, s.i, 5) AS g
  FROM d CROSS JOIN generate_series(1, 20000) AS s(i)
  WHERE s.i <= length(text) - 4
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS m
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, CAST(m AS DOUBLE) / (sa.n + sb.n - m) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(m AS DOUBLE) / (sa.n + sb.n - m) >= 0.8
"""


def q_media_frame_sample(sf_dir: str):
    """Video-style frame sampling over the deterministic media fixture:
    FrameSampleKernel slices every 4th frame chunk out of the binary
    payload; the oracle recomputes the identical slices by substring
    arithmetic over a parallel hex encoding of the same payload (this
    DuckDB build has no BLOB substring)."""
    import ray.data

    from ..sources.oracle_fixtures import ORACLE_DIR, ensure_fixtures
    from ..stages.multimodal import FrameSampleKernel

    ensure_fixtures()
    ds = ray.data.read_parquet(
        f"{ORACLE_DIR}/media.parquet", columns=["media_id", "payload", "n_frames"]
    )
    out = ds.map_batches(
        FrameSampleKernel, batch_format="pyarrow", concurrency=pool(divisor=2), zero_copy_batch=True
    )

    def to_hex(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame": batch["frame"],
                "chunk_hex": pa.array(
                    [c.hex() for c in batch["chunk"].to_pylist()], pa.string()
                ),
            }
        )

    return out.map_batches(to_hex, batch_format="pyarrow", zero_copy_batch=True)


def _media_frame_sql() -> str:
    from ..sources.oracle_fixtures import ORACLE_DIR

    return f"""
WITH m AS (
  SELECT media_id, payload_hex, n_frames,
         greatest(1, (length(payload_hex) // 2) // greatest(1, n_frames)) AS sz
  FROM read_parquet('{ORACLE_DIR}/media.parquet')
)
SELECT media_id, CAST(s.i AS INTEGER) AS frame,
       substring(payload_hex, CAST(s.i * sz * 2 + 1 AS BIGINT), CAST(sz * 2 AS BIGINT)) AS chunk_hex
FROM m CROSS JOIN generate_series(0, 63, 4) AS s(i)
WHERE s.i < n_frames
"""


def q_lang_id(sf_dir: str):
    """n-gram-profile language id (stateful actor stage; patterns compiled
    once per actor) -> (doc_id, lang_guess). The scoring is count of
    profile-ngram regex hits per language with argmax-first tie-break —
    RE2 non-overlapping counting on both sides, so DuckDB's
    regexp_extract_all mirrors it exactly."""
    import ray.data

    from ..stages.text import LangIdKernel

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        LangIdKernel, batch_format="pyarrow", concurrency=pool(), zero_copy_batch=True
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "lang_guess"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def _langid_sql() -> str:
    from ..stages.text import _LANG_PROFILES

    scores = ",\n         ".join(
        f"len(regexp_extract_all(text, '{'|'.join(_LANG_PROFILES[lang])}')) AS s_{lang}"
        for lang in _LANG_PROFILES
    )
    langs = list(_LANG_PROFILES)
    m = ", ".join(f"s_{la}" for la in langs)
    # CASE order = the kernel's argmax-first tie-break (profile dict order)
    case = "\n       ".join(f"WHEN s_{la} = m THEN '{la}'" for la in langs)
    return f"""
WITH s AS (
  SELECT doc_id,
         {scores}
  FROM documents
),
sm AS (SELECT *, greatest({m}) AS m FROM s)
SELECT doc_id,
  CASE WHEN m = 0 THEN 'und'
       {case}
  END AS lang_guess
FROM sm
"""


def q_flagship_rect_zones(sf_dir: str):
    """The north-rule flagship shape (enrich -> PIP zone join -> per-zone
    aggregate) over literal rectangle zones so the WHOLE pipeline —
    geotag formula, the PIPZoneKernel actor grid index, the partial/merge
    aggregation — is driver-checkable in SQL (the production flagship uses
    irregular polygon zones and stays rows-only)."""
    import ray

    from ..functions.geometry import make_box, to_wkb
    from ..pipelines.webpages import PIPZoneKernel, enrich_batch

    zones_tbl = pa.table(
        {
            "zone_id": pa.array([z[0] for z in _RECT_ZONES], pa.int64()),
            "geom_wkb": pa.array(
                [to_wkb(make_box(w, s, e, n)) for _, w, s, e, n in _RECT_ZONES],
                pa.binary(),
            ),
        }
    )
    zones_ref = ray.put(zones_tbl)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    enriched = ds.map_batches(
        enrich_batch,
        fn_kwargs=dict(id_col="doc_id", text_col="text"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        PIPZoneKernel,
        fn_constructor_kwargs=dict(zones_ref=zones_ref),
        batch_format="pyarrow",
        concurrency=pool(),
        zero_copy_batch=True,
    )

    def partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "zone_id": batch["zone_id"],
                    "n_tokens": batch["n_tokens"],
                    "n_chars": batch["n_chars"],
                }
            )
            .group_by(["zone_id"])
            .aggregate([("n_tokens", "count"), ("n_tokens", "sum"), ("n_chars", "sum")])
            .rename_columns(["zone_id", "n_pages", "total_tokens", "total_chars"])
        )

    partials = enriched.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    merge = _int_sum_merge(["zone_id"], ["n_pages", "total_tokens", "total_chars"])
    return partials.groupby("zone_id").map_groups(merge, batch_format="pyarrow")


SQL_FLAGSHIP_RECT_ZONES = """
WITH zones(zone_id, xmin, ymin, xmax, ymax) AS (VALUES
  (0, -180.0007, -60.0007, -90.0003, 0.0003),
  (1, -90.0003, -60.0007, -0.0007, 0.0003),
  (2, -0.0007, -60.0007, 90.0003, 0.0003),
  (3, 90.0003, -60.0007, 180.0007, 0.0003),
  (4, -180.0007, 0.0003, -0.0007, 60.0007),
  (5, -0.0007, 0.0003, 180.0007, 60.0007)
),
pts AS (
  SELECT doc_id, n_chars,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         ((doc_id * 2654435761) % 360000) / 1000.0 - 180.0 AS lon,
         ((doc_id * 40503) % 120000) / 1000.0 - 60.0 AS lat
  FROM documents
)
SELECT CAST(zone_id AS BIGINT) AS zone_id, count(*) AS n_pages,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM zones JOIN pts
  ON lon > xmin AND lon < xmax AND lat > ymin AND lat < ymax
GROUP BY zone_id
"""


def _zone_edges_values(n_zones: int = 24) -> str:
    """SQL VALUES rows of the deterministic world-zone polygon edges
    (zone_id, x1, y1, x2, y2), horizontal edges dropped to mirror the
    pip.py keep mask. Float literals are repr() round-trips, so DuckDB
    parses exactly the doubles numpy computes."""
    from ..functions.geometry import from_wkb
    from .webpages import default_world_zones

    zones_tbl = default_world_zones(n_zones)
    rows = []
    for zid, wkb in zip(
        zones_tbl["zone_id"].to_pylist(), zones_tbl["geom_wkb"].to_pylist()
    ):
        g = from_wkb(wkb)
        for rings in g.polys:
            for ring in rings:
                pts = [(float(p[0]), float(p[1])) for p in ring]
                if pts[0] != pts[-1]:
                    pts.append(pts[0])
                for (x1, y1), (x2, y2) in zip(pts[:-1], pts[1:]):
                    if y1 == y2:
                        continue  # pip.py drops horizontal edges (keep mask)
                    rows.append(f"({zid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ",\n  ".join(rows)


def _sha_xor_expr(col: str = "sha") -> str:
    """xor_digest (webpages.py) mirrored in SQL: the order-insensitive
    256-bit xor of sha256 hex digests, as bit_xor over four 64-bit hex
    chunks (xor is bitwise, so chunking is exact)."""
    chunks = " ||\n       ".join(
        "lpad(lower(to_hex(bit_xor("
        f"CAST('0x' || substr({col}, {off}, 16) AS UBIGINT)))), 16, '0')"
        for off in (1, 17, 33, 49)
    )
    return chunks


def _flagship_zones_sql() -> str:
    """Independent SQL mirror of the production flagship pipeline over the
    irregular 24-polygon world zones: even-odd PIP expressed as an
    edge-crossing parity aggregate (edges inlined as literals from the
    deterministic zone generator), first-match assignment (the
    PIPZoneKernel scans candidates in ascending zone order = min zone_id
    among containers), and the per-zone byte-identity digest mirrored as
    bit_xor over four 64-bit chunks of sha256(text). Float literals are
    repr() round-trips and the crossing expression uses the same IEEE op
    order as functions/pip.py:points_in_ring, so doubles match
    bit-for-bit."""
    edges = _zone_edges_values()
    sha_xor = _sha_xor_expr()
    return f"""
WITH edges(zone_id, ex1, ey1, ex2, ey2) AS (VALUES
  {edges}
),
pts AS (
  SELECT doc_id, n_chars, text,
         ((doc_id * 2654435761) % 360000) / 1000.0 - 180.0 AS lon,
         ((doc_id * 40503) % 120000) / 1000.0 - 60.0 AS lat
  FROM documents
),
hits AS (
  SELECT p.doc_id, e.zone_id
  FROM pts p JOIN edges e
    ON ((e.ey1 > p.lat) <> (e.ey2 > p.lat))
   AND p.lon < e.ex1 + (p.lat - e.ey1) * (e.ex2 - e.ex1) / (e.ey2 - e.ey1)
  GROUP BY p.doc_id, e.zone_id
  HAVING count(*) % 2 = 1
),
assign AS (
  SELECT p.doc_id,
         any_value(p.n_chars) AS n_chars,
         any_value(p.text) AS text,
         coalesce(min(h.zone_id), -1) AS zone_id
  FROM pts p LEFT JOIN hits h ON p.doc_id = h.doc_id
  GROUP BY p.doc_id
),
sh AS (
  SELECT zone_id, n_chars, sha256(text) AS sha,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens
  FROM assign
)
SELECT CAST(zone_id AS BIGINT) AS zone_id,
       count(*) AS n_pages,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       {sha_xor} AS sha_xor
FROM sh
GROUP BY zone_id
"""


def _pages_pipeline_sql() -> str:
    """Independent SQL mirror of the north-rule pages pipeline over the
    exact input-hint schema (url, warc_ts, html, text, lang): the input
    corpus is the pages10k fixture (identical to what pages_dataset
    streams), geotag is re-derived from sha256(url) (first 8 bytes,
    little-endian — page_geotag), PIP assignment and the per-zone sha-xor
    byte-identity digest are recomputed with no engine code in the loop.
    n_identity_violations is mirrored as 0: a real violation would make
    the engine emit nonzero and the driver hash would catch it — and any
    text corruption independently breaks sha_xor."""
    from ..sources.oracle_fixtures import ORACLE_DIR

    edges = _zone_edges_values()
    sha_xor = _sha_xor_expr()
    # little-endian uint64 of sha256(url)[:8]: hex byte pairs reversed
    le = " || ".join(f"substr(su, {off}, 2)" for off in (15, 13, 11, 9, 7, 5, 3, 1))
    return f"""
WITH edges(zone_id, ex1, ey1, ex2, ey2) AS (VALUES
  {edges}
),
pg AS (
  SELECT url, text, html,
         CAST('0x' || {le} AS UBIGINT) AS h
  FROM (SELECT url, text, html, sha256(url) AS su
        FROM read_parquet('{ORACLE_DIR}/pages10k.parquet'))
),
pts AS (
  SELECT url, text, html,
         (h % CAST(3600000 AS UBIGINT)) / 10000.0 - 180.0 AS lon,
         ((h >> 21) % CAST(1200000 AS UBIGINT)) / 10000.0 - 60.0 AS lat
  FROM pg
),
hits AS (
  SELECT p.url, e.zone_id
  FROM pts p JOIN edges e
    ON ((e.ey1 > p.lat) <> (e.ey2 > p.lat))
   AND p.lon < e.ex1 + (p.lat - e.ey1) * (e.ex2 - e.ex1) / (e.ey2 - e.ey1)
  GROUP BY p.url, e.zone_id
  HAVING count(*) % 2 = 1
),
assign AS (
  SELECT p.url, any_value(p.text) AS text, any_value(p.html) AS html,
         coalesce(min(h.zone_id), -1) AS zone_id
  FROM pts p LEFT JOIN hits h ON p.url = h.url
  GROUP BY p.url
),
sh AS (
  SELECT zone_id, sha256(text) AS sha,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         octet_length(html) AS html_bytes
  FROM assign
)
SELECT CAST(zone_id AS BIGINT) AS zone_id,
       count(*) AS n_pages,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(html_bytes) AS BIGINT) AS total_html_bytes,
       {sha_xor} AS sha_xor,
       CAST(0 AS BIGINT) AS n_identity_violations
FROM sh
GROUP BY zone_id
"""


def _checkpointed_flagship_sql() -> str:
    """Per-doc mirror of the checkpointed flagship sink (doc_id, zone_id,
    text_sha, n_tokens): the partitioned write + resume machinery under
    test must reproduce exactly the rows this direct SQL derives from the
    documents table."""
    edges = _zone_edges_values()
    return f"""
WITH edges(zone_id, ex1, ey1, ex2, ey2) AS (VALUES
  {edges}
),
pts AS (
  SELECT doc_id, text,
         ((doc_id * 2654435761) % 360000) / 1000.0 - 180.0 AS lon,
         ((doc_id * 40503) % 120000) / 1000.0 - 60.0 AS lat
  FROM documents
),
hits AS (
  SELECT p.doc_id, e.zone_id
  FROM pts p JOIN edges e
    ON ((e.ey1 > p.lat) <> (e.ey2 > p.lat))
   AND p.lon < e.ex1 + (p.lat - e.ey1) * (e.ex2 - e.ex1) / (e.ey2 - e.ey1)
  GROUP BY p.doc_id, e.zone_id
  HAVING count(*) % 2 = 1
)
SELECT p.doc_id,
       CAST(coalesce(min(h.zone_id), -1) AS BIGINT) AS zone_id,
       any_value(sha256(p.text)) AS text_sha,
       CAST(any_value(len(regexp_extract_all(p.text, '\\S+'))) AS BIGINT) AS n_tokens
FROM pts p LEFT JOIN hits h ON p.doc_id = h.doc_id
GROUP BY p.doc_id
"""


# FNV-1a 64 re-derived byte-by-byte in SQL: a recursive CTE walks the
# hex-encoded UTF-8 bytes carrying the hash as HUGEINT mod 2^64 (the
# 104-bit intermediate product fits int128), then converts to the int64
# two's-complement view the engine emits. Exact for any byte content.
SQL_DOC_FINGERPRINT = """
WITH RECURSIVE src AS (
  SELECT doc_id, text, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT doc_id, text, hx, n, 0 AS i,
         CAST(14695981039346656037 AS HUGEINT) AS h
  FROM src
  UNION ALL
  SELECT doc_id, text, hx, n, i + 1,
         (xor(h, CAST(CAST('0x' || substr(hx, i * 2 + 1, 2) AS UBIGINT) AS HUGEINT))
          * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)
  FROM f WHERE i < n
)
SELECT doc_id, text,
       CAST(h - CASE WHEN h > 9223372036854775807
                     THEN CAST(18446744073709551616 AS HUGEINT)
                     ELSE 0 END AS BIGINT) AS fingerprint
FROM f WHERE i = n
"""


def _simhash_sql() -> str:
    """SimHashKernel mirrored in SQL: tokens via regexp_extract_all
    (occurrence multiplicity preserved through a synthetic token id), the
    32-byte-truncated polynomial token hash as a 32-term sum against
    precomputed base-power literals (same mod-2^64 wraparound the kernel's
    uint64 arithmetic produces), per-bit majority votes over
    generate_series(0,63), and the 4 x 16-bit LSH block keys."""
    mask = (1 << 64) - 1
    base = 1099511628211
    p, powers = 1, []
    for _ in range(32):
        powers.append(p)
        p = (p * base) & mask
    pow_vals = ",\n  ".join(
        f"({i}, CAST({v} AS HUGEINT))" for i, v in enumerate(powers)
    )
    blocks = ",\n       ".join(
        f"CAST((coalesce(s, 0) >> {16 * b}) & CAST(65535 AS UBIGINT) AS BIGINT)"
        f" AS block{b}"
        for b in range(4)
    )
    return f"""
WITH toks AS (
  SELECT row_number() OVER () AS tid, doc_id,
         substr(hex(encode(tok)), 1, 64) AS hx
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
        FROM documents)
),
powers(i, p) AS (VALUES
  {pow_vals}
),
th AS (
  SELECT tid, doc_id,
         CAST(sum(CAST(CAST('0x' || substr(hx, i * 2 + 1, 2) AS UBIGINT) AS HUGEINT) * p)
              % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT) AS h
  FROM toks JOIN powers ON i * 2 + 1 <= length(hx)
  GROUP BY tid, doc_id
),
bits AS (
  SELECT doc_id, j,
         CASE WHEN 2 * sum(CASE WHEN (h >> j) & CAST(1 AS UBIGINT) = CAST(1 AS UBIGINT)
                                THEN 1 ELSE 0 END) - count(*) > 0
              THEN 1 ELSE 0 END AS bit
  FROM th CROSS JOIN generate_series(0, 63) AS g(j)
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id, CAST(sum(CAST(bit AS UBIGINT) << j) AS UBIGINT) AS s
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CAST(coalesce(s, 0) AS HUGEINT)
            - CASE WHEN coalesce(s, 0) > 9223372036854775807
                   THEN CAST(18446744073709551616 AS HUGEINT)
                   ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS simhash,
       {blocks}
FROM (SELECT doc_id FROM documents) d
LEFT JOIN (SELECT doc_id, s FROM sig) USING (doc_id)
"""


def _minhash_pairs_sql(
    num_perm: int = 64, bands: int = 16, k: int = 5, max_bucket: int = 512
) -> str:
    """minhash_lsh_pairs mirrored in SQL: k-shingle rolling hashes (the
    kernel's polynomial with mod-2^64 wraparound), the 64 universal-hash
    (a, b) parameters inlined as literals from the same fixed seed, min
    over distinct shingles per permutation, band keys with the same salt
    xor, and the engine's bucket rules (unique ids, all pairs when the
    bucket holds <= max_bucket ids, sorted-consecutive chain otherwise,
    distinct pairs across bands)."""
    import numpy as np

    mask = (1 << 64) - 1
    mers = (1 << 61) - 1
    rng = np.random.default_rng(1234)
    a = rng.integers(1, mers, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, mers, size=num_perm, dtype=np.uint64)
    perm_vals = ",\n  ".join(
        f"({i}, CAST({int(a[i])} AS HUGEINT), CAST({int(b[i])} AS HUGEINT))"
        for i in range(num_perm)
    )
    p, shingle_pows = 1, []
    for _ in range(k):
        shingle_pows.append(p)
        p = (p * 1000003) & mask
    # kernel: windows * powers[::-1] -> byte j of the window gets power k-1-j
    shp_vals = ",\n  ".join(
        f"({j}, CAST({shingle_pows[k - 1 - j]} AS HUGEINT))" for j in range(k)
    )
    rows_per_band = num_perm // bands
    bp_vals = ",\n  ".join(
        f"({i}, CAST({1000003 ** i} AS HUGEINT))" for i in range(rows_per_band)
    )
    salt_vals = ",\n  ".join(
        f"({bi}, CAST({(bi * 0x9E3779B97F4A7C15) & mask} AS UBIGINT))"
        for bi in range(bands)
    )
    return f"""
WITH src AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
shp(j, p) AS (VALUES
  {shp_vals}
),
wins AS (  -- one row per k-shingle window start (exact per-doc bounds)
  SELECT doc_id, hx, unnest(generate_series(0, n - {k})) AS w FROM src
),
sh AS (  -- distinct k-shingle rolling hashes per doc (np.unique mirror)
  SELECT DISTINCT doc_id,
         CAST(sum(CAST(CAST('0x' || substr(hx, (w + j) * 2 + 1, 2) AS UBIGINT) AS HUGEINT) * p)
              % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT) AS shash
  FROM wins
  CROSS JOIN shp
  GROUP BY doc_id, w
),
perms(perm, pa, pb) AS (VALUES
  {perm_vals}
),
sig AS (  -- MinHash: min over shingles of ((sh*a mod 2^64) + b mod 2^64) % mersenne
  SELECT doc_id, perm,
         min(CAST(((CAST(shash AS HUGEINT) * pa) % CAST(18446744073709551616 AS HUGEINT) + pb)
                  % CAST(18446744073709551616 AS HUGEINT) % {mers} AS UBIGINT)) AS sv
  FROM sh CROSS JOIN perms
  GROUP BY doc_id, perm
),
bpow(i, p) AS (VALUES
  {bp_vals}
),
salts(band, salt) AS (VALUES
  {salt_vals}
),
bk AS (  -- per-band bucket key: polynomial over the band's rows, salt xor
  SELECT doc_id, band,
         xor(CAST(sum(CAST(sv AS HUGEINT) * p) % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT),
             salt) AS band_key
  FROM sig
  JOIN bpow ON perm % {rows_per_band} = i
  JOIN salts ON perm // {rows_per_band} = band
  GROUP BY doc_id, band, salt
),
bkd AS (SELECT DISTINCT band_key, doc_id FROM bk),
bk2 AS (
  SELECT band_key, doc_id,
         count(*) OVER (PARTITION BY band_key) AS bs,
         lead(doc_id) OVER (PARTITION BY band_key ORDER BY doc_id) AS nxt
  FROM bkd
)
SELECT id_a, id_b FROM (
  SELECT p.doc_id AS id_a, q.doc_id AS id_b
  FROM bk2 p JOIN bk2 q
    ON p.band_key = q.band_key AND p.doc_id < q.doc_id
  WHERE p.bs <= {max_bucket}
  UNION
  SELECT doc_id AS id_a, nxt AS id_b
  FROM bk2 WHERE bs > {max_bucket} AND nxt IS NOT NULL
)
"""


# ------------------------------------- repetition / decontamination


def q_docs_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document (duplicate
    word fraction + top-bigram fraction numerators/denominators, all
    int64): one stateless vectorized map_batches, no shuffle."""
    from ..stages.text import repetition_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOCS_REPETITION = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bc AS (
  SELECT doc_id, bigram, count(*) AS c
  FROM (
    SELECT doc_id,
           unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS bigram
    FROM w
  )
  GROUP BY doc_id, bigram
),
bs AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_count
  FROM bc GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.toks) AS BIGINT) AS n_words,
       CAST(len(list_distinct(w.toks)) AS BIGINT) AS n_distinct_words,
       CAST(coalesce(bs.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(bs.top_bigram_count, 0) AS BIGINT) AS top_bigram_count
FROM w LEFT JOIN bs USING (doc_id)
ORDER BY w.doc_id
"""


DECONTAM_NGRAM = 5
DECONTAM_BENCH_MAX_ID = 20  # docs below this id form the "benchmark" set


def q_docs_decontaminate(sf_dir: str):
    """Test-set decontamination: flag every training document (doc_id >=
    20) sharing any word-5-gram with the benchmark set (doc_id < 20).
    The benchmark gram-hash set is tiny by construction (an eval suite),
    broadcast once via ray.put; training docs stream through an
    actor-pool kernel with one vectorized membership probe per batch."""
    import ray

    from ..stages.text import DecontaminateKernel, benchmark_gram_set

    bench = _small_table(sf_dir, "documents", columns=["doc_id", "text"])
    mask = pc.less(bench["doc_id"], DECONTAM_BENCH_MAX_ID)
    grams = benchmark_gram_set(
        bench.filter(mask)["text"].to_pylist(), ngram=DECONTAM_NGRAM
    )
    ref = ray.put(grams)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keep_training(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["doc_id"], DECONTAM_BENCH_MAX_ID))

    return ds.map_batches(
        keep_training, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        DecontaminateKernel,
        fn_constructor_kwargs=dict(gram_set_ref=ref, ngram=DECONTAM_NGRAM),
        batch_format="pyarrow",
        concurrency=pool(),
        zero_copy_batch=True,
    )


SQL_DOCS_DECONTAMINATE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
  SELECT doc_id,
         unnest([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' ||
                 toks[i + 3] || ' ' || toks[i + 4]
                 for i in range(1, len(toks) - 3)]) AS gram
  FROM w
),
bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id < {DECONTAM_BENCH_MAX_ID}
),
hits AS (
  SELECT g.doc_id, count(*) AS n
  FROM grams g JOIN bench USING (gram)
  WHERE g.doc_id >= {DECONTAM_BENCH_MAX_ID}
  GROUP BY g.doc_id
)
SELECT w.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams
FROM w LEFT JOIN hits h USING (doc_id)
WHERE w.doc_id >= {DECONTAM_BENCH_MAX_ID}
ORDER BY w.doc_id
"""


# --------------------------------------------- PII scrub / unigram LM


def _pii_decorated(batch: pa.Table) -> pa.Table:
    """Deterministically plant PII-shaped spans into the synthetic corpus
    (which is bare words): docs with doc_id%3==0 get an email, %5==0 a
    phone, %7==0 an IPv4 — so per-category counts vary 0/1 per document
    and the redacted length varies with both text and id width. Pure
    Arrow/numpy (mask + element-wise join), mirrored 1:1 by CASE/|| SQL.
    """
    import numpy as np

    did = batch["doc_id"]
    d = did.to_numpy(zero_copy_only=False)
    s = pc.cast(did, pa.string())

    def _s(arr):
        return pc.cast(pa.array(arr, pa.int64()), pa.string())

    def _join(*parts):
        return pc.binary_join_element_wise(*parts, "")

    email = _join("contact doc", s, "@mail.example.com")
    phone = _join("call +1 555 010 ", _s(1000 + d % 9000))
    ipv4 = _join("from 10.", _s(d % 200), ".0.", _s(d % 250))
    empty = pa.scalar("", pa.string())
    dec = _join(
        batch["text"],
        pc.if_else(pa.array(d % 3 == 0), pc.binary_join_element_wise(" ", email, ""), empty),
        pc.if_else(pa.array(d % 5 == 0), pc.binary_join_element_wise(" ", phone, ""), empty),
        pc.if_else(pa.array(d % 7 == 0), pc.binary_join_element_wise(" ", ipv4, ""), empty),
    )
    return pa.table({"doc_id": did, "text": dec})


def q_docs_pii_scrub(sf_dir: str):
    """PII scrub pass over the (decorated) corpus: per-document email /
    phone / IPv4 match counts plus post-redaction length. Two stateless
    vectorized map_batches (decorate, scrub) — no shuffle, no state."""
    from ..stages.text import pii_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        _pii_decorated, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(pii_batch, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOCS_PII_SCRUB = r"""
WITH dec AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact doc' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call +1 555 010 ' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END AS t
  FROM documents
),
s1 AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM dec
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}')) AS n_phones,
         regexp_replace(t1, '\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}', '<PHONE>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_phones,
         len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
         regexp_replace(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t3
  FROM s2
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(length(t3) AS BIGINT) AS clean_len
FROM s3
ORDER BY doc_id
"""


def q_docs_unigram_lm(sf_dir: str):
    """CCNet-style unigram-LM quality score per document, two passes:

    1. vocabulary build — per-batch (token, count) partials (only
       distinct tokens enter the shuffle) -> tiny groupby('token') ->
       log-probs floored to int64 micronats on the driver. At 100 TB the
       vocab is capped by a min-count threshold before broadcast;
       everything below scores as the OOV floor.
    2. scoring — vocab broadcast once via ray.put, actor-pool kernel
       maps each batch's dictionary through the lookup and bincounts
       per-document integer scores (order-independent, SQL-exact).
    """
    import ray

    from ..stages.text import UnigramLMKernel, token_count_partials, vocab_micronats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = (
        ds.map_batches(token_count_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("c")
        .to_pandas()
    )
    tokens, micronats = vocab_micronats(vocab["token"].tolist(), vocab["sum(c)"].tolist())
    ref = ray.put((tokens, micronats))
    return ds.map_batches(
        UnigramLMKernel,
        fn_constructor_kwargs=dict(vocab_ref=ref),
        batch_format="pyarrow",
        concurrency=pool(),
        zero_copy_batch=True,
    )


SQL_DOCS_UNIGRAM_LM = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
),
tot AS (SELECT sum(c) AS t FROM vocab)
SELECT k.doc_id,
       count(*) AS n_lm_tokens,
       CAST(0 AS BIGINT) AS n_oov,
       CAST(sum(CAST(floor(ln(CAST(v.c AS DOUBLE) / CAST(tt.t AS DOUBLE)) * 1000000)
                AS BIGINT)) AS BIGINT) AS lm_score_micronats
FROM toks k
JOIN vocab v USING (tok)
CROSS JOIN tot tt
GROUP BY k.doc_id
ORDER BY k.doc_id
"""


def q_docs_convex_hull(sf_dir: str):
    """Strict convex hull of the synthetic doc geotags (integer
    milli-degree residues, the docs_geocells derivation): the geometry
    instance of algebraic aggregation — hull(S ∪ T) = hull(hull(S) ∪
    hull(T)), so each block reduces to its local hull and only hull
    vertices cross the exchange. Rows-only driver check (hull membership
    is not SQL-expressible without geometry functions); exactness pinned
    by tests/test_training_ops.py::test_convex_hull_properties
    (convexity, containment of every input point, extremality of every
    vertex, hand-built shapes with collinear edge points,
    layout-invariance)."""
    from ..stages.ordering import convex_hull_points

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_points(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "x": pa.array((ids * 2654435761) % 360000, pa.int64()),
                "y": pa.array((ids * 40503) % 120000, pa.int64()),
            }
        )

    pts = ds.map_batches(to_points, batch_format="pyarrow", zero_copy_batch=True)
    return convex_hull_points(pts)


def q_docs_ppl_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing: score every document with the
    corpus unigram LM (the q_docs_unigram_lm pipeline), normalize to an
    integer per-1k-token negative-log-likelihood
    (``ppl = -lm_score * 1000 // n_tokens`` — all-positive so floor and
    truncating division agree between numpy and SQL), then assign each
    doc its global tertile bucket (0 = head / lowest perplexity,
    1 = middle, 2 = tail) by the exact rank in (ppl, doc_id) order:
    ``bucket = rank0 * 3 // n``.

    Distributed exactness without a global sort: a distinct-ppl
    histogram pass (thin (ppl, cnt) partials -> one small groupby ->
    driver cumsum, the select_top_exact bound: distinct scores fit the
    driver) broadcasts rank offsets; one groupby(ppl) then ranks ties by
    doc_id locally. Only 16-byte rows ever shuffle."""
    import ray

    from ..stages.text import UnigramLMKernel, token_count_partials, vocab_micronats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = (
        ds.map_batches(token_count_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("c")
        .to_pandas()
    )
    tokens, micronats = vocab_micronats(vocab["token"].tolist(), vocab["sum(c)"].tolist())
    vref = ray.put((tokens, micronats))
    scored = ds.map_batches(
        UnigramLMKernel,
        fn_constructor_kwargs=dict(vocab_ref=vref),
        batch_format="pyarrow",
        concurrency=pool(),
        zero_copy_batch=True,
    )

    def to_ppl(batch: pa.Table) -> pa.Table:
        ntok = batch["n_lm_tokens"].to_numpy()
        lm = batch["lm_score_micronats"].to_numpy()
        keep = ntok > 0
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy()[keep], pa.int64()),
                "ppl": pa.array((-lm[keep]) * 1000 // ntok[keep], pa.int64()),
            }
        )

    ppl_ds = scored.map_batches(
        to_ppl, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # thin (id, ppl) rows, consumed twice

    def hist_partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch["ppl"].to_numpy(), return_counts=True)
        return pa.table(
            {"ppl": pa.array(v, pa.int64()), "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    hist = (
        ppl_ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ppl")
        .sum("c")
        .to_pandas()
        .sort_values("ppl")
    )
    svals = hist["ppl"].to_numpy().astype(np.int64)
    cnts = hist["sum(c)"].to_numpy().astype(np.int64)
    n = int(cnts.sum())
    cum_before = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
    rref = ray.put((svals, cum_before, n))

    def bucketize(group: pa.Table) -> pa.Table:
        sv, cb, total = ray.get(rref)
        s = int(group["ppl"][0].as_py())
        ids = group["doc_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        rank0 = cb[np.searchsorted(sv, s)] + np.arange(len(ids), dtype=np.int64)
        bucket = rank0 * 3 // total
        out_ids = ids[order]
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "ppl_micronats_per_1k": pa.array(np.full(len(ids), s, np.int64), pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    return ppl_ds.groupby("ppl").map_groups(bucketize, batch_format="pyarrow")


SQL_DOCS_PPL_BUCKETS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
),
tot AS (SELECT sum(c) AS t FROM vocab),
lm AS (
  SELECT k.doc_id,
         count(*) AS ntok,
         CAST(sum(CAST(floor(ln(CAST(v.c AS DOUBLE) / CAST(tt.t AS DOUBLE)) * 1000000)
                  AS BIGINT)) AS BIGINT) AS score
  FROM toks k JOIN vocab v USING (tok) CROSS JOIN tot tt
  GROUP BY k.doc_id
),
sc AS (
  SELECT doc_id, (-score) * 1000 // ntok AS ppl FROM lm WHERE ntok > 0
),
rk AS (
  SELECT doc_id, ppl,
         row_number() OVER (ORDER BY ppl, doc_id) AS rn,
         count(*) OVER () AS n
  FROM sc
)
SELECT doc_id, CAST(ppl AS BIGINT) AS ppl_micronats_per_1k,
       CAST((rn - 1) * 3 // n AS BIGINT) AS bucket
FROM rk
"""


CDC_K, CDC_BASE, CDC_MOD, CDC_DIV, CDC_REM = 8, 31, 1 << 31, 64, 0


def q_docs_cdc_chunks(sf_dir: str):
    """Content-defined chunking over documents (the storage-dedup
    primitive): Rabin-Karp boundary rule h(window) % 64 == 0, so chunk
    edges move with the content and shared runs chunk identically across
    near-duplicates. One stateless scan; (doc_id, chunk_idx, start, len,
    chunk_md5) per chunk."""
    from ..stages.text import cdc_chunks

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: cdc_chunks(b, k=CDC_K, base=CDC_BASE, mod=CDC_MOD,
                             div=CDC_DIV, rem=CDC_REM),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_DOCS_CDC_CHUNKS = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) > 0),
hs AS (
  SELECT doc_id, u['i'] AS i, u['h'] AS h
  FROM (
    SELECT doc_id,
           unnest([{{'i': i,
                     'h': CAST(list_sum([unicode(substr(text, i + j, 1))
                                         * CAST({CDC_BASE}**j AS BIGINT)
                                         for j in range(0, {CDC_K})])
                          AS BIGINT) % {CDC_MOD}}}
                   for i in range(1, n - {CDC_K} + 2)]) AS u
    FROM d WHERE n >= {CDC_K}
  )
),
cutrows AS (
  SELECT doc_id, i + {CDC_K} - 1 AS cut FROM hs WHERE h % {CDC_DIV} = {CDC_REM}
  UNION
  SELECT doc_id, n FROM d
),
spans AS (
  SELECT doc_id,
         coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) AS s,
         cut AS e,
         row_number() OVER (PARTITION BY doc_id ORDER BY cut) - 1 AS chunk_idx
  FROM cutrows
)
SELECT sp.doc_id, CAST(sp.chunk_idx AS BIGINT) AS chunk_idx,
       CAST(sp.s AS BIGINT) AS start, CAST(sp.e - sp.s AS BIGINT) AS len,
       md5(substr(d.text, CAST(sp.s + 1 AS BIGINT), CAST(sp.e - sp.s AS BIGINT))) AS chunk_md5
FROM spans sp JOIN d USING (doc_id)
"""


WINNOW_K = 3  # words per gram
WINNOW_W = 4  # grams per winnowing window


def q_docs_winnow(sf_dir: str):
    """Winnowing document fingerprints (Schleimer et al. 2003, MOSS):
    md5 every word 3-gram, select the rightmost minimal hash in each
    window of 4 consecutive grams — the plagiarism / near-match
    fingerprint set with the guarantee that any shared 6-word substring
    yields a shared fingerprint. Stateless per-batch scan, no shuffle;
    output (doc_id, pos, fp)."""
    from ..stages.text import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: winnow_fingerprints(b, k=WINNOW_K, w=WINNOW_W),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# Winnowing oracle: the same md5 gram keys (lowercase-hex compares
# bytewise identically in SQL and numpy), explicit window join, rightmost
# minimum via (fp ASC, pos DESC) ranking, DISTINCT selections.
SQL_DOCS_WINNOW = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
grams AS (
  SELECT doc_id, u['pos'] AS pos, u['fp'] AS fp
  FROM (
    SELECT doc_id,
           unnest([{'pos': i - 1,
                    'fp': md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])}
                   for i in range(1, len(toks) - 1)]) AS u
    FROM w
  )
),
ng AS (SELECT doc_id, max(pos) + 1 AS n FROM grams GROUP BY doc_id),
win AS (
  SELECT g.doc_id, s.pos AS wstart, g.pos, g.fp
  FROM grams s
  JOIN ng ON ng.doc_id = s.doc_id AND s.pos + 3 <= ng.n - 1
  JOIN grams g ON g.doc_id = s.doc_id AND g.pos BETWEEN s.pos AND s.pos + 3
),
sel AS (
  SELECT doc_id, wstart, pos, fp,
         row_number() OVER (PARTITION BY doc_id, wstart
                            ORDER BY fp ASC, pos DESC) AS rk
  FROM win
)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp FROM sel WHERE rk = 1
"""


def q_docs_dsir_weights(sf_dir: str):
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    unigram features): one corpus pass builds paired target/source
    token counts (target = lang='en' docs; only distinct tokens enter
    the shuffle), the driver turns them into integer micronat
    log-ratios (two separate floors so SQL reproduces them), and a
    broadcast kernel scatter-adds per-document importance scores —
    order-independent int64, bit-exact vs the oracle."""
    import ray

    from ..stages.text import TokenWeightKernel, dsir_count_partials, dsir_weights

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    vocab = (
        ds.map_batches(dsir_count_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum(["c_src", "c_tgt"])
        .to_pandas()
    )
    tokens, weights = dsir_weights(
        vocab["token"].tolist(), vocab["sum(c_src)"].tolist(), vocab["sum(c_tgt)"].tolist()
    )
    ref = ray.put((tokens, weights))
    scored = ds.drop_columns(["lang"]).map_batches(
        TokenWeightKernel,
        fn_constructor_kwargs=dict(weights_ref=ref),
        batch_format="pyarrow",
        concurrency=pool(),
        zero_copy_batch=True,
    )
    return scored.sort("doc_id")


SQL_DOCS_DSIR_WEIGHTS = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok,
         count(*) AS cs,
         count(*) FILTER (WHERE lang = 'en') AS ct
  FROM toks GROUP BY tok
),
tots AS (SELECT sum(cs) AS ts, sum(ct) AS tt FROM vocab)
SELECT k.doc_id,
       CAST(count(*) FILTER (WHERE v.ct > 0) AS BIGINT) AS n_ranked,
       CAST(count(*) FILTER (WHERE v.ct = 0) AS BIGINT) AS n_skipped,
       CAST(coalesce(sum(CASE WHEN v.ct > 0 THEN
              CAST(floor(ln(CAST(v.ct AS DOUBLE) / CAST(tt.tt AS DOUBLE)) * 1000000) AS BIGINT)
            - CAST(floor(ln(CAST(v.cs AS DOUBLE) / CAST(tt.ts AS DOUBLE)) * 1000000) AS BIGINT)
            ELSE 0 END), 0) AS BIGINT) AS dsir_micronats
FROM toks k JOIN vocab v USING (tok) CROSS JOIN tots tt
GROUP BY k.doc_id
ORDER BY k.doc_id
"""


PACK_SEQ_LEN = 256
PACK_BUCKETS = 16


def q_docs_pack_sequences(sf_dir: str):
    """GPT-style sequence packing (concat-and-chunk): lay every document's
    tokens end-to-end in doc_id order and assign each document its global
    token offset plus the first/last training sequence (length
    ``PACK_SEQ_LEN``) it lands in.

    The global offset is a distributed ORDERED PREFIX SUM, done without
    any driver-side per-doc state:

    1. one pruned pass computes per-batch (bucket, tokens) partials over
       contiguous doc_id ranges -> ``groupby(bucket)`` of PACK_BUCKETS
       rows -> exclusive cumsum of bucket offsets on the driver (O(#buckets));
    2. a second pass groups rows by bucket and cumsums WITHIN the bucket
       (sorted by doc_id) on workers, adding the broadcast bucket offset.

    Partitioning assumption (documented per SURVEY custom-op rule): one
    bucket's (doc_id, n_tokens) rows fit in a worker — at 10^12 docs
    pick #buckets so each holds ~10^8 16-byte rows. The token-count scan
    runs twice rather than materializing a corpus-sized intermediate.
    """
    import numpy as np

    max_id = _read(sf_dir, "documents", columns=["doc_id"]).max("doc_id")
    if max_id is None:  # empty corpus: empty result with the full schema
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in ("doc_id", "n_tokens", "tok_offset", "seq_first", "seq_last")
                }
            )
        )
    width = (int(max_id) + PACK_BUCKETS) // PACK_BUCKETS

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n,
                "bucket": pa.array(did // width, pa.int64()),
            }
        )

    def bucket_partials(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        ub = np.unique(b)
        sums = np.zeros(len(ub), np.int64)
        np.add.at(sums, np.searchsorted(ub, b), n)
        return pa.table({"bucket": pa.array(ub, pa.int64()), "c": pa.array(sums, pa.int64())})

    base = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    )
    tot = (
        base.map_batches(bucket_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .sum("c")
        .to_pandas()
        .sort_values("bucket")
    )
    csum = tot["sum(c)"].cumsum().shift(fill_value=0)
    offsets = dict(zip(tot["bucket"].astype(int), csum.astype(int)))

    def pack(group: pa.Table) -> pa.Table:
        group = group.sort_by("doc_id").combine_chunks()
        n = group["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets[int(group["bucket"][0].as_py())] + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        last = (off + np.maximum(n, 1) - 1) // PACK_SEQ_LEN
        return pa.table(
            {
                "doc_id": group["doc_id"],
                "n_tokens": pa.array(n, pa.int64()),
                "tok_offset": pa.array(off, pa.int64()),
                "seq_first": pa.array(off // PACK_SEQ_LEN, pa.int64()),
                "seq_last": pa.array(last, pa.int64()),
            }
        )

    return base.groupby("bucket").map_groups(pack, batch_format="pyarrow")


SQL_DOCS_PACK_SEQUENCES = rf"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(tok_offset // {PACK_SEQ_LEN} AS BIGINT) AS seq_first,
       CAST((tok_offset + greatest(n_tokens, 1) - 1) // {PACK_SEQ_LEN} AS BIGINT) AS seq_last
FROM c
ORDER BY doc_id
"""


DUP_NGRAM = 5


def q_docs_dup_ngram_spans(sf_dir: str):
    """Cross-document duplicated n-gram spans — the exact-substring
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499): per document, how many
    of its word-5-gram occurrences also appear in ANOTHER document.

    Scale shape (nothing corpus-sized touches the driver or a broadcast):

    - gram rows (doc_id, fnv-rolling-hash) are pre-reduced per batch to
      (hash, min_doc, max_doc) partials, so the first shuffle groups
      vocabulary-sized partials; a gram is cross-doc iff global
      min_doc < max_doc (Min/Max are combinable aggregates).
    - the duplicated-hash set is materialized (it is the artifact a real
      pipeline would persist) and routed through ``join_auto``:
      broadcast when it fits a worker heap, native hash-shuffle join
      when it does not — occurrences then aggregate per doc.
    - per-doc totals left-join the dup counts the same way; docs with
      zero duplicated grams coalesce to 0.

    Exactness caveat: grams travel as 64-bit rolling FNV hashes while
    the oracle compares gram STRINGS — a cross-document hash collision
    would overcount (probability ~G^2/2^64; negligible at test scale,
    and at 100 TB the standard remedy is a 128-bit gram hash, same
    plan shape).
    """
    from ray.data.aggregate import Max, Min

    from ..stages.joins import join_auto
    from ..stages.text import _split_words, _word_hashes, ngram_hashes

    def gram_rows(batch: pa.Table) -> pa.Table:
        doc_idx, codes, dictionary = _split_words(batch["text"])
        wh = _word_hashes(dictionary, codes)
        gdoc, gh = ngram_hashes(doc_idx, wh, DUP_NGRAM)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(did[gdoc], pa.int64()),
                "h": pa.array(gh.astype(np.int64), pa.int64()),
            }
        )

    def minmax_partial(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        uh, inv = np.unique(h, return_inverse=True)
        mn = np.full(len(uh), np.iinfo(np.int64).max, np.int64)
        mx = np.full(len(uh), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, inv, d)
        np.maximum.at(mx, inv, d)
        return pa.table(
            {
                "h": pa.array(uh, pa.int64()),
                "mn": pa.array(mn, pa.int64()),
                "mx": pa.array(mx, pa.int64()),
            }
        )

    def only_dup(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch["min(mn)"], batch["max(mx)"]))
        return keep.select(["h"])

    def doc_totals(batch: pa.Table) -> pa.Table:
        doc_idx, codes, dictionary = _split_words(batch["text"])
        gdoc, _ = ngram_hashes(doc_idx, _word_hashes(dictionary, codes), DUP_NGRAM)
        n = np.bincount(gdoc, minlength=len(batch)).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"], "n_grams": pa.array(n, pa.int64())})

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    grams = ds.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    dup = (
        grams.map_batches(minmax_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min("mn"), Max("mx"))
        .map_batches(only_dup, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    dup_counts = (
        join_auto(grams, dup, on=("h",)).groupby("doc_id").count().materialize()
    )
    totals = ds.map_batches(doc_totals, batch_format="pyarrow", zero_copy_batch=True)
    out = join_auto(totals, dup_counts, on=("doc_id",), join_type="left_outer")

    def finalize(batch: pa.Table) -> pa.Table:
        if "count()" in batch.column_names:
            n_dup = pc.coalesce(
                pc.cast(batch["count()"], pa.int64()), pa.scalar(0, pa.int64())
            )
        else:  # no duplicated gram anywhere: unmatched left-outer keeps schema
            n_dup = pa.array(np.zeros(len(batch), np.int64), pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": batch["n_grams"],
                "n_dup_grams": n_dup,
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOCS_DUP_NGRAM_SPANS = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
  SELECT doc_id,
         unnest([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' ||
                 toks[i + 3] || ' ' || toks[i + 4]
                 for i in range(1, len(toks) - 3)]) AS gram
  FROM w
),
gstat AS (
  SELECT gram, min(doc_id) AS mn, max(doc_id) AS mx
  FROM (SELECT DISTINCT doc_id, gram FROM grams)
  GROUP BY gram
),
dup AS (SELECT gram FROM gstat WHERE mn < mx),
dc AS (
  SELECT g.doc_id, count(*) AS n
  FROM grams g JOIN dup USING (gram)
  GROUP BY g.doc_id
),
tot AS (
  SELECT doc_id, CAST(greatest(len(toks) - 4, 0) AS BIGINT) AS n_grams FROM w
)
SELECT t.doc_id, t.n_grams, CAST(coalesce(dc.n, 0) AS BIGINT) AS n_dup_grams
FROM tot t LEFT JOIN dc USING (doc_id)
ORDER BY t.doc_id
"""


CHUNK_TOKENS = 64
CHUNK_STRIDE = 56  # 8-token overlap between consecutive chunks


def q_docs_chunk(sf_dir: str):
    """Fixed-size token-window chunking with overlap (RAG / pretraining
    prep): flat-expand every document into (chunk_idx, start_tok,
    n_chunk_tokens, chunk_md5) rows — 64-token windows, stride 56.

    One stateless map_batches doing a row-expanding transform (the
    flat_map shape); no shuffle, no state. Window arithmetic is numpy;
    the md5 per chunk is inherently scalar (same status as md5_batch).
    The md5 of the rejoined token window proves chunk CONTENT parity
    against the SQL mirror, not just the arithmetic.
    """
    import hashlib

    def chunk_rows(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        toks = words.to_pylist()
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        o_doc, o_idx, o_start, o_len, o_md5 = [], [], [], [], []
        for d, tl in zip(did, toks):
            n = len(tl)
            if n > CHUNK_TOKENS:
                nk = 1 + -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE)
            else:
                nk = 1
            for k in range(nk):
                s = k * CHUNK_STRIDE
                seg = tl[s : s + CHUNK_TOKENS]
                o_doc.append(int(d))
                o_idx.append(k)
                o_start.append(s)
                o_len.append(len(seg))
                o_md5.append(hashlib.md5(" ".join(seg).encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.int64()),
                "chunk_idx": pa.array(o_idx, pa.int64()),
                "start_tok": pa.array(o_start, pa.int64()),
                "n_chunk_tokens": pa.array(o_len, pa.int64()),
                "chunk_md5": pa.array(o_md5, pa.string()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(chunk_rows, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOCS_CHUNK = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
k AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) > {CHUNK_TOKENS}
              THEN 1 + CAST(ceil((len(toks) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS BIGINT)
              ELSE 1 END AS nk
  FROM w
),
c AS (
  SELECT doc_id, toks, n, unnest(generate_series(0, nk - 1)) AS ci FROM k
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(least({CHUNK_TOKENS}, n - ci * {CHUNK_STRIDE}) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(toks[ci * {CHUNK_STRIDE} + 1 : ci * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_idx
"""


BLOOM_M_BITS = 1 << 18
BLOOM_K = 6


def q_docs_decontaminate_bloom(sf_dir: str):
    """Decontamination, the 100-TB shape: when the benchmark gram set is
    too big to broadcast exactly, (1) build its bloom bitmap DISTRIBUTED
    (sparse per-block word partials OR-merged by groupby — like the HLL
    sketch, only set words cross the shuffle), (2) broadcast the bitmap
    once (fixed a-few-MB regardless of benchmark size), (3) stream the
    training corpus through a candidate kernel that keeps only
    bloom-positive gram occurrences, then (4) EXACT-verify the surviving
    (doc_id, gram_hash) rows with a semi-join against the distinct
    benchmark grams (join_auto: broadcast under the threshold, hash
    shuffle above) and count per doc. No false negatives, exact verify
    => bit-identical to ``docs_decontaminate`` and the same SQL oracle;
    pinned by tests/test_training_ops.py::test_decontaminate_bloom_*.
    """
    import ray

    from ..stages.joins import join_auto
    from ..stages.sketch import bloom_assemble, bloom_sketch
    from ..stages.text import (
        BloomDecontaminateCandidates,
        _split_words,
        _word_hashes,
        ngram_hashes,
    )

    ng = DECONTAM_NGRAM

    def gram_hashes_of(batch: pa.Table) -> np.ndarray:
        doc_idx, codes, dictionary = _split_words(batch["text"])
        wh = _word_hashes(dictionary, codes)
        return ngram_hashes(doc_idx, wh, ng)[1]

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keep_bench(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["doc_id"], DECONTAM_BENCH_MAX_ID))

    def keep_training(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["doc_id"], DECONTAM_BENCH_MAX_ID))

    bench = docs.map_batches(keep_bench, batch_format="pyarrow", zero_copy_batch=True)

    # (1) distributed bloom over benchmark grams; (2) assemble + broadcast
    sketch = bloom_sketch(bench, gram_hashes_of, m_bits=BLOOM_M_BITS, k=BLOOM_K)
    words_ref = ray.put(bloom_assemble(sketch.to_pandas(), BLOOM_M_BITS))

    # exact distinct benchmark grams — the verify side of the semi-join
    def bench_gram_rows(t: pa.Table) -> pa.Table:
        u = np.unique(gram_hashes_of(t))
        return pa.table({"gram_hash": pa.array(u.view(np.int64), pa.int64())})

    bench_grams = bench.map_batches(
        bench_gram_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # (3) bloom-prefiltered candidate gram occurrences from training docs
    cand = docs.map_batches(
        keep_training, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        BloomDecontaminateCandidates,
        fn_constructor_kwargs=dict(
            words_ref=words_ref, m_bits=BLOOM_M_BITS, k=BLOOM_K, ngram=ng
        ),
        batch_format="pyarrow",
        concurrency=pool(),
        zero_copy_batch=True,
    )

    # (4) exact verify + per-doc occurrence counts (partials, then a
    # small groupby sum — only (doc_id, n) rows cross the final shuffle)
    verified = join_auto(cand, bench_grams, on=["gram_hash"], join_type="left_semi")

    def count_partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by("doc_id")
            .aggregate([("doc_id", "count")])
            .rename_columns(["doc_id", "n"])
        )

    counts = (
        verified.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    # zero-fill: every training doc appears, clean docs get 0
    train_ids = docs.map_batches(
        lambda t: keep_training(t).select(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = join_auto(
        train_ids,
        counts,
        on=["doc_id"],
        join_type="left_outer",
        right_schema=pa.schema([("doc_id", pa.int64()), ("n", pa.int64())]),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t["n"], pa.scalar(0, pa.int64()))
        return pa.table(
            {"doc_id": t["doc_id"], "n_contaminated_grams": pc.cast(n, pa.int64())}
        )

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


INCR_DEDUP_SPLIT_ID = 100  # docs below this id form the already-ingested corpus


def q_docs_incremental_dedup(sf_dir: str):
    """Incremental ingestion dedup — the shape a 100-TB pipeline runs
    DAILY: the existing corpus' content-hash index is persisted ONCE,
    hash-bucketed by md5 prefix (``dedup_store_write``); each new shard
    then streams through a probe kernel that reads only the buckets its
    own hashes land in (targeted storage reads, per-actor bucket cache,
    NO shuffle at ingest time). Exact: searchsorted membership against
    the bucket's sorted md5 index."""
    import tempfile

    from ..stages.dedup import dedup_against_store, dedup_store_write

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keep_corpus(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["doc_id"], INCR_DEDUP_SPLIT_ID))

    def keep_shard(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["doc_id"], INCR_DEDUP_SPLIT_ID))

    store = tempfile.mkdtemp(prefix="prsr_dedup_store_", dir="/tmp")
    dedup_store_write(
        docs.map_batches(keep_corpus, batch_format="pyarrow", zero_copy_batch=True),
        store,
        n_buckets=16,
    )
    return dedup_against_store(
        docs.map_batches(keep_shard, batch_format="pyarrow", zero_copy_batch=True),
        store,
        n_buckets=16,
    )


SQL_DOCS_INCREMENTAL_DEDUP = f"""
WITH corpus AS (
  SELECT doc_id, md5(text) AS m FROM documents WHERE doc_id < {INCR_DEDUP_SPLIT_ID}
),
shard AS (
  SELECT doc_id, md5(text) AS m FROM documents WHERE doc_id >= {INCR_DEDUP_SPLIT_ID}
),
reps AS (SELECT m, min(doc_id) AS rep FROM corpus GROUP BY m)
SELECT s.doc_id,
       r.rep IS NOT NULL AS is_dup,
       CAST(coalesce(r.rep, -1) AS BIGINT) AS dup_of
FROM shard s LEFT JOIN reps r USING (m)
ORDER BY s.doc_id
"""


def q_events_range_window(sf_dir: str):
    """Time-window query over a RANGE-PARTITIONED store — the ordered
    complement of the hash-bucketed layouts: events are range-clustered
    on ts at write time (KLL-sampled cut points, one partial-sketch
    pass, no sort exchange), then the window [tmin + span/4, tmin +
    span/2) is answered by reading ONLY the overlapping partitions and
    re-filtering exactly. At 100 TB the same manifest prunes straight
    at storage; bound quality affects balance, never correctness."""
    import tempfile

    from ray.data.aggregate import Max, Min

    from ..stages.bucketed import read_range, write_range_partitioned

    events = _read(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])

    def ts_us(t: pa.Table) -> pa.Table:
        return pa.table({"ts_us": pc.cast(t["ts"], pa.int64())})

    mm = (
        events.map_batches(ts_us, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Min("ts_us"), Max("ts_us"))
    )
    tmin, tmax = int(mm["min(ts_us)"]), int(mm["max(ts_us)"])
    lo = tmin + (tmax - tmin) // 4
    hi = tmin + (tmax - tmin) // 2

    store = tempfile.mkdtemp(prefix="prsr_range_store_", dir="/tmp")
    write_range_partitioned(events, "ts", n_parts=8, path=store)

    pruned = read_range(store, lo, hi, columns=["event_id", "ts", "event_type", "value"])

    def exact_window(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        keep = pc.and_(pc.greater_equal(us, lo), pc.less(us, hi))
        t = t.filter(keep)
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "value": t["value"],
            }
        )

    return pruned.map_batches(exact_window, batch_format="pyarrow", zero_copy_batch=True)


SQL_EVENTS_RANGE_WINDOW = """
WITH b AS (
  SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS tmin,
         CAST(epoch_us(max(ts)) AS BIGINT) AS tmax
  FROM events
)
SELECT event_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       event_type,
       value
FROM events, b
WHERE epoch_us(ts) >= tmin + (tmax - tmin) // 4
  AND epoch_us(ts) <  tmin + (tmax - tmin) // 2
ORDER BY event_id
"""


EPOCH_SEED = 7


def q_docs_epoch_shuffle(sf_dir: str):
    """Deterministic epoch shuffle: every document's position in the
    seed-keyed pseudorandom permutation of the corpus (the pre-epoch
    global shuffle of LLM training). See ``stages/ordering.py`` for the
    single-bounded-exchange plan; only (doc_id, key) rows move."""
    from python_rasterstats_ray.stages.ordering import epoch_shuffle

    return epoch_shuffle(_read(sf_dir, "documents", columns=["doc_id"]), seed=EPOCH_SEED)


def q_docs_select_top(sf_dir: str):
    """Exact top-25% corpus selection by (n_chars DESC, doc_id ASC) —
    the quality-threshold filter of a curation pipeline, computed WITHOUT
    a global sort: a distinct-score histogram pass finds the boundary
    score, a tie pass picks the boundary ids, and a broadcast (t, id_cut)
    filter keeps exactly k = floor(n/4) rows (stages/ordering.py)."""
    from python_rasterstats_ray.stages.ordering import select_top_exact

    return select_top_exact(
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"]), frac=0.25
    )


SQL_DOCS_SELECT_TOP = """
WITH kk AS (SELECT count(*) // 4 AS k FROM documents),
r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.n_chars FROM r, kk WHERE r.rn <= kk.k
"""


def _splitmix_key_cte(seed: int, src: str = "documents", id_col: str = "doc_id") -> str:
    """CTE chain computing ``skey = splitmix64(id + seed)`` per row of
    ``src`` — bit-parity with ``stages.ordering.shuffle_keys``. HUGEINT
    (int128) arithmetic mod 2^64; the 64x64-bit multiplies are split
    into hi/lo 32-bit halves so no intermediate exceeds 2^96 (a full
    product would overflow int128)."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"CAST((((CAST({col} AS HUGEINT) * {hi}) % 4294967296) * 4294967296"
            f" + CAST({col} AS HUGEINT) * {lo}) % {m64} AS UBIGINT)"
        )

    return f"""s0 AS (
  SELECT {id_col},
         CAST(((CAST({id_col} AS HUGEINT) % {m64} + {m64}) % {m64}
               + 11400714819323198485 + {seed}) % {m64} AS UBIGINT) AS z
  FROM {src}
),
s1 AS (SELECT {id_col}, {mulmod("xor(z, z >> 30)", 0xBF58476D1CE4E5B9)} AS z FROM s0),
s2 AS (SELECT {id_col}, {mulmod("xor(z, z >> 27)", 0x94D049BB133111EB)} AS z FROM s1),
k AS (SELECT {id_col}, xor(z, z >> 31) AS skey FROM s2)"""


SQL_DOCS_EPOCH_SHUFFLE = f"""
WITH {_splitmix_key_cte(EPOCH_SEED)}
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY skey, doc_id) - 1 AS BIGINT) AS epoch_pos
FROM k
ORDER BY doc_id
"""


MIX_WEIGHTS = {"en": 0.35, "es": 0.20, "de": 0.15, "fr": 0.15, "zh": 0.15}
MIX_BUDGET = 200


def q_docs_corpus_mix(sf_dir: str):
    """Deterministic data-mixture selection: per-domain quotas from a
    DoReMi-style weight spec, each filled by the domain's smallest
    shuffle keys. See ``stages/ordering.py::corpus_mix`` (bounded
    partial-top-k exchange; only (id, lang, key) rows move)."""
    from python_rasterstats_ray.stages.ordering import corpus_mix

    return corpus_mix(
        _read(sf_dir, "documents", columns=["doc_id", "lang"]),
        MIX_WEIGHTS,
        MIX_BUDGET,
        seed=EPOCH_SEED,
    )


def _corpus_mix_sql() -> str:
    case = " ".join(
        f"WHEN '{g}' THEN {int(w * MIX_BUDGET)}" for g, w in MIX_WEIGHTS.items()
    )
    return f"""
WITH {_splitmix_key_cte(EPOCH_SEED)},
r AS (
  SELECT d.doc_id, d.lang,
         row_number() OVER (PARTITION BY d.lang ORDER BY k.skey, d.doc_id) AS rk
  FROM documents d JOIN k USING (doc_id)
)
SELECT doc_id, lang
FROM r
WHERE rk <= CASE lang {case} ELSE 0 END
ORDER BY doc_id
"""


SQL_DOCS_CORPUS_MIX = _corpus_mix_sql()


TOKEN_BUDGETS = {"en": 8000, "es": 3000, "de": 3000, "fr": 3000, "zh": 3000}


def q_docs_token_budget(sf_dir: str):
    """Budget-capped curation: per-domain token budgets filled in
    shuffle-key order (keep iff the doc still fits). Distributed grouped
    ordered prefix sum — see ``stages/ordering.py::token_budget_fill``."""
    from python_rasterstats_ray.stages.ordering import token_budget_fill

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        return pa.table(
            {"doc_id": batch["doc_id"], "lang": batch["lang"], "n_tokens": n}
        )

    base = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"]).map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    )
    return token_budget_fill(base, TOKEN_BUDGETS, seed=EPOCH_SEED)


def _token_budget_sql() -> str:
    case = " ".join(f"WHEN '{g}' THEN {b}" for g, b in TOKEN_BUDGETS.items())
    return rf"""
WITH {_splitmix_key_cte(EPOCH_SEED)},
t AS (
  SELECT d.doc_id, d.lang,
         len(regexp_extract_all(d.text, '\S+')) AS n_tokens, k.skey
  FROM documents d JOIN k USING (doc_id)
),
c AS (
  SELECT doc_id, lang, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY skey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM c
WHERE before + n_tokens <= CASE lang {case} ELSE 0 END
ORDER BY doc_id
"""


SQL_DOCS_TOKEN_BUDGET = _token_budget_sql()


BBOX_CELL = 256  # PBSM grid cell for the rect spatial self-join


def _doc_rects_batch(batch: pa.Table) -> pa.Table:
    """Deterministic integer rectangle per doc (hash-style arithmetic the
    SQL oracle reproduces verbatim): origin on a 3840-grid, size 64..255,
    every 97th rect 8x bigger (multi-cell skew path)."""
    import numpy as np

    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x0 = (d * 2654435761) % 3840
    y0 = (d * 40503) % 3840
    w = 64 + (d * 9973) % 192
    h = 64 + (d * 7817) % 192
    big = d % 97 == 0
    w = np.where(big, w * 8, w)
    h = np.where(big, h * 8, h)
    return pa.table(
        {
            "id": pa.array(d, pa.int64()),
            "xmin": pa.array(x0, pa.int64()),
            "ymin": pa.array(y0, pa.int64()),
            "xmax": pa.array(x0 + w, pa.int64()),
            "ymax": pa.array(y0 + h, pa.int64()),
        }
    )


def q_docs_bbox_join(sf_dir: str):
    """Polygon-polygon (bbox) spatial self-join over doc-derived
    rectangles — PBSM cell partitioning with canonical-cell pair
    reporting (no distinct pass); see ``stages/joins.py::bbox_self_join``."""
    from python_rasterstats_ray.stages.joins import bbox_self_join

    rects = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        _doc_rects_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return bbox_self_join(rects, cell_size=BBOX_CELL)


SQL_DOCS_BBOX_JOIN = """
WITH r AS (
  SELECT doc_id AS id,
         (doc_id * 2654435761) % 3840 AS xmin,
         (doc_id * 40503) % 3840 AS ymin,
         (doc_id * 2654435761) % 3840
           + (64 + (doc_id * 9973) % 192)
             * (CASE WHEN doc_id % 97 = 0 THEN 8 ELSE 1 END) AS xmax,
         (doc_id * 40503) % 3840
           + (64 + (doc_id * 7817) % 192)
             * (CASE WHEN doc_id % 97 = 0 THEN 8 ELSE 1 END) AS ymax
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b
FROM r a JOIN r b
  ON a.id < b.id
 AND a.xmin < b.xmax AND b.xmin < a.xmax
 AND a.ymin < b.ymax AND b.ymin < a.ymax
ORDER BY id_a, id_b
"""


def _cust_rects_batch(batch: pa.Table) -> pa.Table:
    """Deterministic integer rectangle per customer (distinct multipliers
    from the doc rects so the two sets interleave)."""
    import numpy as np

    d = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    x0 = (d * 1103515245) % 3840
    y0 = (d * 69069) % 3840
    w = 64 + (d * 6151) % 192
    h = 64 + (d * 3079) % 192
    return pa.table(
        {
            "id": pa.array(d, pa.int64()),
            "xmin": pa.array(x0, pa.int64()),
            "ymin": pa.array(y0, pa.int64()),
            "xmax": pa.array(x0 + w, pa.int64()),
            "ymax": pa.array(y0 + h, pa.int64()),
        }
    )


def q_docs_customer_bbox_join(sf_dir: str):
    """Two-table bbox spatial join (docs rects x customer rects) — the
    canonical A x B form of the PBSM plan; see
    ``stages/joins.py::bbox_join``."""
    from python_rasterstats_ray.stages.joins import bbox_join

    left = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        _doc_rects_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    right = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        _cust_rects_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return bbox_join(left, right, cell_size=BBOX_CELL)


SQL_DOCS_CUSTOMER_BBOX_JOIN = """
WITH l AS (
  SELECT doc_id AS id,
         (doc_id * 2654435761) % 3840 AS xmin,
         (doc_id * 40503) % 3840 AS ymin,
         (doc_id * 2654435761) % 3840
           + (64 + (doc_id * 9973) % 192)
             * (CASE WHEN doc_id % 97 = 0 THEN 8 ELSE 1 END) AS xmax,
         (doc_id * 40503) % 3840
           + (64 + (doc_id * 7817) % 192)
             * (CASE WHEN doc_id % 97 = 0 THEN 8 ELSE 1 END) AS ymax
  FROM documents
),
r AS (
  SELECT c_custkey AS id,
         (c_custkey * 1103515245) % 3840 AS xmin,
         (c_custkey * 69069) % 3840 AS ymin,
         (c_custkey * 1103515245) % 3840 + 64 + (c_custkey * 6151) % 192 AS xmax,
         (c_custkey * 69069) % 3840 + 64 + (c_custkey * 3079) % 192 AS ymax
  FROM customer
)
SELECT l.id AS left_id, r.id AS right_id
FROM l JOIN r
  ON l.xmin < r.xmax AND r.xmin < l.xmax
 AND l.ymin < r.ymax AND r.ymin < l.ymax
ORDER BY left_id, right_id
"""


def q_docs_bbox_overlap_area(sf_dir: str):
    """Spatial aggregate over the bbox join: per doc rect, TOTAL overlap
    area with the customer rect set — distributive per-cell clipped
    areas, NO duplicate-elimination pass (see
    ``stages/joins.py::bbox_join_area``)."""
    from python_rasterstats_ray.stages.joins import bbox_join_area

    left = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        _doc_rects_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    right = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        _cust_rects_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return bbox_join_area(left, right, cell_size=BBOX_CELL).rename_columns(
        {"left_id": "doc_id"}
    )


SQL_DOCS_BBOX_OVERLAP_AREA = """
WITH l AS (
  SELECT doc_id AS id,
         (doc_id * 2654435761) % 3840 AS xmin,
         (doc_id * 40503) % 3840 AS ymin,
         (doc_id * 2654435761) % 3840
           + (64 + (doc_id * 9973) % 192)
             * (CASE WHEN doc_id % 97 = 0 THEN 8 ELSE 1 END) AS xmax,
         (doc_id * 40503) % 3840
           + (64 + (doc_id * 7817) % 192)
             * (CASE WHEN doc_id % 97 = 0 THEN 8 ELSE 1 END) AS ymax
  FROM documents
),
r AS (
  SELECT c_custkey AS id,
         (c_custkey * 1103515245) % 3840 AS xmin,
         (c_custkey * 69069) % 3840 AS ymin,
         (c_custkey * 1103515245) % 3840 + 64 + (c_custkey * 6151) % 192 AS xmax,
         (c_custkey * 69069) % 3840 + 64 + (c_custkey * 3079) % 192 AS ymax
  FROM customer
)
SELECT l.id AS doc_id,
       CAST(sum((least(l.xmax, r.xmax) - greatest(l.xmin, r.xmin))
                * (least(l.ymax, r.ymax) - greatest(l.ymin, r.ymin))) AS BIGINT) AS area
FROM l JOIN r
  ON l.xmin < r.xmax AND r.xmin < l.xmax
 AND l.ymin < r.ymax AND r.ymin < l.ymax
GROUP BY l.id
ORDER BY doc_id
"""


HH_NUM, HH_DEN = 1, 33  # heavy-hitter threshold: count >= total/33 (~3%)


def q_docs_heavy_tokens(sf_dir: str):
    """Exact frequency-threshold heavy hitters over the corpus vocabulary
    (two bounded passes: vectorized local-heavy-hitter candidates, then a
    broadcast exact verify — see ``stages/sketch.py::heavy_hitters``)."""
    from python_rasterstats_ray.stages.sketch import heavy_hitters

    return heavy_hitters(
        _read(sf_dir, "documents", columns=["text"]), HH_NUM, HH_DEN
    )


SQL_DOCS_HEAVY_TOKENS = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
tot AS (SELECT count(*) AS n FROM w)
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM w, tot
GROUP BY word, tot.n
HAVING count(*) * {HH_DEN} >= {HH_NUM} * tot.n
ORDER BY word
"""


SHARD_DOCS = 64


def q_docs_training_shards(sf_dir: str):
    """End-to-end training-shard preparation: exact dedup (min-id per
    md5) -> deterministic epoch shuffle of the survivors -> fixed-size
    shards (``epoch_pos // SHARD_DOCS``) -> per-shard byte-identity
    digest (order-insensitive xor of sha256(text)) + doc count.

    The composite every stage is already oracled for, chained: only
    (md5, id) rows cross the dedup exchange, only (id, key) rows cross
    the shuffle exchange, and the payload moves exactly once — through
    the shard-assignment join that a real run would use to WRITE the
    shards (join_auto broadcasts the thin assignment side when it
    fits). The per-shard digest is what a resumable writer would store
    in its manifest (pipelines/checkpoint.py's lineage rule).
    """
    import numpy as np

    from python_rasterstats_ray.pipelines.webpages import sha256_hex
    from python_rasterstats_ray.stages.dedup import exact_dedup_keep_first
    from python_rasterstats_ray.stages.joins import join_auto
    from python_rasterstats_ray.stages.ordering import epoch_shuffle

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])
    survivors = exact_dedup_keep_first(base).rename_columns({"rep_doc_id": "doc_id"})
    pos = epoch_shuffle(survivors, seed=EPOCH_SEED)

    def to_shard(batch: pa.Table) -> pa.Table:
        ep = batch["epoch_pos"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shard_id": pa.array(ep // SHARD_DOCS, pa.int64()),
            }
        )

    assign = pos.map_batches(to_shard, batch_format="pyarrow", zero_copy_batch=True)
    joined = join_auto(base, assign, on=["doc_id"], join_type="inner")

    def shard_partials(batch: pa.Table) -> pa.Table:
        sh = batch["shard_id"].to_numpy(zero_copy_only=False)
        shas = sha256_hex(batch["text"].to_pylist())
        us = np.unique(sh)
        n = np.zeros(len(us), np.int64)
        acc = [0] * len(us)
        idx = np.searchsorted(us, sh)
        for i, h in zip(idx, shas):
            n[i] += 1
            acc[i] ^= int(h, 16)
        return pa.table(
            {
                "shard_id": pa.array(us, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "digest": pa.array([f"{a:064x}" for a in acc], pa.string()),
            }
        )

    partials = joined.map_batches(
        shard_partials, batch_format="pyarrow", zero_copy_batch=True
    )

    from python_rasterstats_ray.pipelines.webpages import shard_digest_merge

    return (
        partials.groupby("shard_id")
        .map_groups(shard_digest_merge, batch_format="pyarrow")
        .sort("shard_id")
    )


SQL_DOCS_TRAINING_SHARDS = f"""
WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
{_splitmix_key_cte(EPOCH_SEED, src="surv")},
pos AS (
  SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) - 1 AS ep FROM k
),
j AS (
  SELECT CAST(pos.ep // {SHARD_DOCS} AS BIGINT) AS shard_id, sha256(d.text) AS sha
  FROM pos JOIN documents d USING (doc_id)
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       {_sha_xor_expr("sha")} AS digest
FROM j
GROUP BY shard_id
ORDER BY shard_id
"""


ORACLE_SQL = {
    "docs_epoch_shuffle": SQL_DOCS_EPOCH_SHUFFLE,
    "docs_select_top": SQL_DOCS_SELECT_TOP,
    "docs_corpus_mix": SQL_DOCS_CORPUS_MIX,
    "docs_token_budget": SQL_DOCS_TOKEN_BUDGET,
    "docs_training_shards": SQL_DOCS_TRAINING_SHARDS,
    "docs_heavy_tokens": SQL_DOCS_HEAVY_TOKENS,
    "docs_bbox_join": SQL_DOCS_BBOX_JOIN,
    "docs_customer_bbox_join": SQL_DOCS_CUSTOMER_BBOX_JOIN,
    "docs_bbox_overlap_area": SQL_DOCS_BBOX_OVERLAP_AREA,
    "docs_chunk": SQL_DOCS_CHUNK,
    "docs_decontaminate_bloom": SQL_DOCS_DECONTAMINATE,
    "docs_incremental_dedup": SQL_DOCS_INCREMENTAL_DEDUP,
    "events_range_window": SQL_EVENTS_RANGE_WINDOW,
    "docs_dup_ngram_spans": SQL_DOCS_DUP_NGRAM_SPANS,
    "docs_pack_sequences": SQL_DOCS_PACK_SEQUENCES,
    "docs_pii_scrub": SQL_DOCS_PII_SCRUB,
    "docs_unigram_lm": SQL_DOCS_UNIGRAM_LM,
    "docs_repetition": SQL_DOCS_REPETITION,
    "docs_decontaminate": SQL_DOCS_DECONTAMINATE,
    "knn_points_geo": SQL_KNN_POINTS_GEO,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "simhash_signatures": _simhash_sql(),
    "minhash_pairs": _minhash_pairs_sql(),
    "flagship_zone_stats": _flagship_zones_sql(),
    "pages_pipeline": _pages_pipeline_sql(),
    "flagship_checkpointed": _checkpointed_flagship_sql(),
    "orders_by_region": SQL_ORDERS_BY_REGION,
    "docs_dedup_filtered": SQL_DOCS_DEDUP_FILTERED,
    "events_windowed": SQL_EVENTS_WINDOWED,
    "events_hopping": SQL_EVENTS_HOPPING,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "events_asof_orders": SQL_EVENTS_ASOF_ORDERS,
    "tpch_q1": SQL_TPCH_Q1,
    "orders_by_nation": SQL_ORDERS_BY_NATION,
    "parts_by_brand": SQL_PARTS_BY_BRAND,
    "top_orders": SQL_TOP_ORDERS,
    "top_docs_per_lang": SQL_TOP_DOCS_PER_LANG,
    "docs_stratified_sample": _stratified_sample_sql(),
    "pages_host_stats": _pages_host_stats_sql(),
    "customer_segments": SQL_CUSTOMER_SEGMENTS,
    "events_by_type": SQL_EVENTS_BY_TYPE,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_session_attribution": SQL_EVENTS_SESSION_ATTRIBUTION,
    "docs_exact_dedup": SQL_DOCS_EXACT_DEDUP,
    "docs_token_stats": SQL_DOCS_TOKEN_STATS,
    "docs_quality": SQL_DOCS_QUALITY,
    "corpus_curation": SQL_CORPUS_CURATION,
    "docs_hll_sketch": _hll_sketch_sql(),
    "pages_host_cms": _pages_host_cms_sql(),
    "url_canonical_dedup": _url_canonical_sql(),
    "embeddings_knn": SQL_EMBEDDINGS_KNN,
    "docs_geocells": SQL_DOCS_GEOCELLS,
    "docs_quadkey_rollup": SQL_DOCS_QUADKEY_ROLLUP,
    "docs_pip_zones": SQL_DOCS_PIP_ZONES,
    "lang_id": _langid_sql(),
    "flagship_rect_zones": SQL_FLAGSHIP_RECT_ZONES,
    "knn_ivf_exact": SQL_KNN_IVF_EXACT,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "docs_jaccard_pairs": SQL_DOCS_JACCARD_PAIRS,
    "media_frame_sample": _media_frame_sql(),
    "minhash_dup_pairs": SQL_PLANTED_DUP_PAIRS,
    "docs_fuzzy_dedup": SQL_DOCS_FUZZY_DEDUP,
    "docs_dsir_weights": SQL_DOCS_DSIR_WEIGHTS,
    "docs_winnow": SQL_DOCS_WINNOW,
    "docs_ppl_buckets": SQL_DOCS_PPL_BUCKETS,
    "docs_cdc_chunks": SQL_DOCS_CDC_CHUNKS,
    "events_running": SQL_EVENTS_RUNNING,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_pivot": SQL_EVENTS_PIVOT,
    "lineitem_corr": SQL_LINEITEM_CORR,
    "docs_edit_pairs": SQL_DOCS_EDIT_PAIRS,
    "docs_fuzzy_score": SQL_DOCS_FUZZY_SCORE,
    "orders_skyline": SQL_ORDERS_SKYLINE,
    "orders_daily_ma": SQL_ORDERS_DAILY_MA,
    "simhash_dup_pairs": SQL_PLANTED_DUP_PAIRS,
}

QUERIES = {
    "docs_chunk": q_docs_chunk,
    "docs_dup_ngram_spans": q_docs_dup_ngram_spans,
    "docs_pack_sequences": q_docs_pack_sequences,
    "docs_pii_scrub": q_docs_pii_scrub,
    "docs_unigram_lm": q_docs_unigram_lm,
    "docs_repetition": q_docs_repetition,
    "docs_decontaminate": q_docs_decontaminate,
    "docs_decontaminate_bloom": q_docs_decontaminate_bloom,
    "docs_incremental_dedup": q_docs_incremental_dedup,
    "events_range_window": q_events_range_window,
    "knn_points_geo": q_knn_points_geo,
    "orders_by_region": q_orders_by_region,
    "docs_dedup_filtered": q_docs_dedup_filtered,
    "events_windowed": q_events_windowed,
    "events_hopping": q_events_hopping,
    "events_sessions": q_events_sessions,
    "events_asof_orders": q_events_asof_orders,
    "tpch_q1": q_tpch_q1,
    "orders_by_nation": q_orders_by_nation,
    "parts_by_brand": q_parts_by_brand,
    "top_orders": q_top_orders,
    "top_docs_per_lang": q_top_docs_per_lang,
    "docs_stratified_sample": q_docs_stratified_sample,
    "pages_host_stats": q_pages_host_stats,
    "customer_segments": q_customer_segments,
    "events_by_type": q_events_by_type,
    "events_sessionize": q_events_sessionize,
    "events_session_attribution": q_events_session_attribution,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_token_stats": q_docs_token_stats,
    "docs_quality": q_docs_quality,
    "corpus_curation": q_corpus_curation,
    "docs_hll_sketch": q_docs_hll_sketch,
    "pages_host_cms": q_pages_host_cms,
    "url_canonical_dedup": q_url_canonical_dedup,
    "embeddings_knn": q_embeddings_knn,
    "docs_geocells": q_docs_geocells,
    "docs_quadkey_rollup": q_docs_quadkey_rollup,
    "docs_pip_zones": q_docs_pip_zones,
    "lang_id": q_lang_id,
    "flagship_rect_zones": q_flagship_rect_zones,
    "knn_ivf_exact": q_knn_ivf_exact,
    "embedding_neardup": q_embedding_neardup,
    "docs_jaccard_pairs": q_docs_jaccard_pairs,
    "media_frame_sample": q_media_frame_sample,
    "minhash_dup_pairs": q_minhash_dup_pairs,
    "docs_fuzzy_dedup": q_docs_fuzzy_dedup,
    "docs_dsir_weights": q_docs_dsir_weights,
    "docs_winnow": q_docs_winnow,
    "docs_ppl_buckets": q_docs_ppl_buckets,
    "docs_cdc_chunks": q_docs_cdc_chunks,
    "events_running": q_events_running,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_pivot": q_events_pivot,
    "lineitem_corr": q_lineitem_corr,
    "docs_edit_pairs": q_docs_edit_pairs,
    "docs_fuzzy_score": q_docs_fuzzy_score,
    "orders_skyline": q_orders_skyline,
    "orders_daily_ma": q_orders_daily_ma,
    "docs_convex_hull": q_docs_convex_hull,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "docs_epoch_shuffle": q_docs_epoch_shuffle,
    "docs_select_top": q_docs_select_top,
    "docs_corpus_mix": q_docs_corpus_mix,
    "docs_token_budget": q_docs_token_budget,
    "docs_training_shards": q_docs_training_shards,
    "docs_heavy_tokens": q_docs_heavy_tokens,
    "docs_bbox_join": q_docs_bbox_join,
    "docs_customer_bbox_join": q_docs_customer_bbox_join,
    "docs_bbox_overlap_area": q_docs_bbox_overlap_area,
}


# --------------------------------------------------------- event anomalies


ANOMALY_Z = 3.0


def q_events_anomaly(sf_dir: str):
    """Per-event-type z-score outliers (|z| > {ANOMALY_Z}) — the
    streaming anomaly-detection primitive over an unbounded event log.

    100-TB shape: pass 1 reduces each block to ONE exact-integer moment
    row per event type (n, sum cents, sum cents² — int64 within a block,
    Python-bigint driver fold across blocks: the lineitem_corr pattern,
    overflow-free at any scale since per-block sums are bounded by
    block rows × 2.5e9 << 2^63). The per-type (mean, sd) table —
    O(#event types) — broadcasts by closure and pass 2 is a stateless
    vectorized filter. Zero shuffles."""
    import math

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        c = _cents(batch["value"])
        g = (
            pa.table(
                {
                    "event_type": batch["event_type"],
                    "n": pa.array(np.ones(len(c), np.int64)),
                    "s": pa.array(c, pa.int64()),
                    "sq": pa.array(c * c, pa.int64()),
                }
            )
            .group_by("event_type")
            .aggregate([("n", "sum"), ("s", "sum"), ("sq", "sum")])
        )
        return g.rename_columns(["event_type", "n", "s", "sq"])

    pdf = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # O(#event_types x #blocks), documented tiny
    )
    types, means, sds = [], [], []
    for ty, grp in pdf.groupby("event_type"):
        n = int(grp["n"].sum())
        s = int(grp["s"].sum())
        sq = int(grp["sq"].sum())
        if n < 2:
            continue  # sd undefined for a single event — no anomalies possible
        mean = s / 100.0 / n
        # clamp: float rounding of sq/1e4 - n*mean² can dip below 0 for a
        # constant-valued type; sd==0 types are dropped below (z undefined)
        var = max((sq / 10000.0 - n * mean * mean) / (n - 1), 0.0)
        sd = math.sqrt(var)
        if sd == 0.0:
            continue
        types.append(ty)
        means.append(mean)
        sds.append(sd)
    t_arr = np.asarray(types, dtype=object)
    order = np.argsort(t_arr)
    t_arr, m_arr, s_arr = t_arr[order], np.asarray(means)[order], np.asarray(sds)[order]

    def flag(batch: pa.Table) -> pa.Table:
        ty = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        if len(t_arr) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "z": pa.array([], pa.float64()),
                }
            )
        pos = np.minimum(np.searchsorted(t_arr, ty), len(t_arr) - 1)
        known = t_arr[pos] == ty  # types dropped above (n<2 or sd==0) flag nothing
        v = _cents(batch["value"]) / 100.0
        with np.errstate(invalid="ignore"):
            z = (v - m_arr[pos]) / s_arr[pos]
        keep = known & (np.abs(z) > ANOMALY_Z)
        return pa.table(
            {
                "event_id": batch["event_id"].filter(pa.array(keep)),
                "event_type": batch["event_type"].filter(pa.array(keep)),
                "z": pa.array(z[keep], pa.float64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True).sort(
        "event_id"
    )


SQL_EVENTS_ANOMALY = f"""
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT event_type, count(*) AS n,
         sum(cents) AS s, sum(cents * cents) AS sq
  FROM c GROUP BY event_type
),
st AS (
  SELECT event_type, mean, sqrt(var) AS sd FROM (
    SELECT event_type,
           s / 100.0 / n AS mean,
           greatest((sq / 10000.0 - n * (s / 100.0 / n) * (s / 100.0 / n))
                    / (n - 1), 0.0) AS var
    FROM m WHERE n > 1
  )
)
SELECT c.event_id, c.event_type,
       (c.cents / 100.0 - st.mean) / st.sd AS z
FROM c JOIN st USING (event_type)
WHERE st.sd > 0
  AND abs((c.cents / 100.0 - st.mean) / st.sd) > {ANOMALY_Z}
ORDER BY c.event_id
"""


QUERIES["events_anomaly"] = q_events_anomaly
ORACLE_SQL["events_anomaly"] = SQL_EVENTS_ANOMALY


# ------------------------------------------------- weighted sampling (A-ES)


WSAMPLE_K = 10


def q_docs_weighted_sample(sf_dir: str):
    """Per-language deterministic weighted sample (k={WSAMPLE_K}, weight
    = whitespace token count) via Efraimidis-Spirakis keys on splitmix64
    uniforms — see ``stages/ordering.py::weighted_sample`` (bounded
    partial-top-k exchange, payload never moves)."""
    from python_rasterstats_ray.stages.ordering import weighted_sample

    return weighted_sample(
        _read(sf_dir, "documents", columns=["doc_id", "lang", "text"]),
        k=WSAMPLE_K,
        seed=EPOCH_SEED,
    )


SQL_DOCS_WEIGHTED_SAMPLE = f"""
WITH {_splitmix_key_cte(EPOCH_SEED)},
w AS (
  SELECT doc_id, lang,
         greatest(len(regexp_extract_all(text, '\\S+')), 1) AS w
  FROM documents
),
a AS (
  SELECT w.doc_id, w.lang,
         ln((CAST(k.skey AS DOUBLE) + 1) / 18446744073709551616.0) / w.w AS wkey
  FROM w JOIN k USING (doc_id)
),
r AS (
  SELECT doc_id, lang, wkey,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY wkey DESC, doc_id)
              AS BIGINT) AS rk
  FROM a
)
SELECT doc_id, lang, wkey, rk FROM r WHERE rk <= {WSAMPLE_K}
ORDER BY lang, rk
"""


QUERIES["docs_weighted_sample"] = q_docs_weighted_sample
ORACLE_SQL["docs_weighted_sample"] = SQL_DOCS_WEIGHTED_SAMPLE
