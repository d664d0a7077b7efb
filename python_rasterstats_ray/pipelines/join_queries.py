"""Large-large shuffle-join queries + text-index / graph pipelines.

These exercise ``stages.joins.hash_equi_join`` (Ray Data's native
hash-shuffle join) where a broadcast side would NOT fit at 100 TB scale:
TPC-H Q3/Q10 shapes (lineitem ⋈ orders ⋈ customer), an inverted index /
TF-IDF over the documents corpus, and an iterative integer PageRank over
a synthetic link graph (``stages/graph.py``).

Exactness discipline (same as pipelines/queries.py): money flows as int64
hundredths / 1e-4 units, TF-IDF scores as int64 floor-divisions, PageRank
as int64 micro-ranks — every distributed sum is order-independent and
bit-exact against the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ..stages._cluster import pool, pool_cap


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col) -> np.ndarray:
    return np.round(np.asarray(col, dtype=np.float64) * 100.0).astype(np.int64)


def _rev4(price_col, disc_col) -> np.ndarray:
    """l_extendedprice * (1 - l_discount) exactly, in int64 1e-4 units."""
    return _cents(price_col) * (100 - _cents(disc_col))


# ------------------------------------------------------------- TPC-H Q3


Q3_CUTOFF = pd.Timestamp("1998-06-01")


def q_tpch_q3(sf_dir: str):
    """Shipping-priority revenue: customer ⋈ orders ⋈ lineitem.

    Scale plan: lineitem is pre-aggregated to one revenue row per
    orderkey BELOW the join (the group key contains the join key), so
    the hash-shuffle join ships ~4x fewer probe rows; the BUILDING
    customer keyset is the one genuinely small side and is broadcast.
    """
    import ray

    from ray.data.aggregate import Sum

    from python_rasterstats_ray.stages.joins import hash_equi_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keep = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    bkeys_ref = ray.put(np.sort(keep.to_numpy(zero_copy_only=False).astype(np.int64)))

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["l_shipdate"], pa.scalar(Q3_CUTOFF)))
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "rev4": pa.array(_rev4(t["l_extendedprice"], t["l_discount"]), pa.int64()),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("rev4", "sum")])
        )
        return g.rename_columns(["l_orderkey", "rev4"])

    li_agg = (
        li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("rev4"))
    )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )

    class OrderFilter:
        def __init__(self, ref=bkeys_ref):
            self.bkeys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.less(batch["o_orderdate"], pa.scalar(Q3_CUTOFF)))
            if len(self.bkeys) == 0:  # no BUILDING customers: filter all
                return t.slice(0, 0).drop_columns(["o_custkey"])
            ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.bkeys, ck)
            pos[pos >= len(self.bkeys)] = 0
            return t.filter(pa.array(self.bkeys[pos] == ck)).drop_columns(["o_custkey"])

    orders_f = orders.map_batches(
        OrderFilter, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool()
    )

    # partitions sized to the thin post-agg join volume (~2 rows per
    # order), not the CPU count: see join_partitions_for_rows
    from python_rasterstats_ray.stages.joins import join_partitions_for_rows

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    joined = hash_equi_join(
        li_agg,
        orders_f,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        num_partitions=join_partitions_for_rows(2 * n_orders),
    )

    def local_top(batch: pa.Table) -> pa.Table:
        rev4 = batch["sum(rev4)"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        dt = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((key, dt, -rev4))[:10]
        t = batch.take(pa.array(order))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": pa.array(
                    t["sum(rev4)"].to_numpy(zero_copy_only=False) / 1e4, pa.float64()
                ),
                "o_orderdate": t["o_orderdate"],
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    top = joined.map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True)
    return top.sort(
        ["revenue", "o_orderdate", "l_orderkey"], descending=[True, False, False]
    ).limit(10)


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ------------------------------------------------------------ TPC-H Q10


Q10_LO = pd.Timestamp("1995-10-01")
Q10_HI = pd.Timestamp("1996-01-01")


def q_tpch_q10(sf_dir: str):
    """Returned-item revenue by customer: TWO native hash-shuffle joins
    (lineitem⋈orders on orderkey, then revenue⋈customer on custkey —
    at 10^12-row scale the customer table is a large side too, so it is
    joined, not broadcast); only the 25-row nation table is broadcast."""
    import ray

    from ray.data.aggregate import Sum

    from python_rasterstats_ray.stages.joins import hash_equi_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nkeys = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nnames = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut[nkeys] = nnames
    nation_ref = ray.put(lut)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "rev4": pa.array(_rev4(t["l_extendedprice"], t["l_discount"]), pa.int64()),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("rev4", "sum")])
        )
        return g.rename_columns(["l_orderkey", "rev4"])

    li_agg = (
        li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("rev4"))
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def orders_filter(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(Q10_LO)),
            pc.less(batch["o_orderdate"], pa.scalar(Q10_HI)),
        )
        return batch.filter(m).drop_columns(["o_orderdate"])

    orders_f = orders.map_batches(orders_filter, batch_format="pyarrow", zero_copy_batch=True)

    from python_rasterstats_ray.stages.joins import join_partitions_for_rows

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    j1 = hash_equi_join(
        li_agg,
        orders_f,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        num_partitions=join_partitions_for_rows(2 * n_orders),
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"o_custkey": batch["o_custkey"], "rev4": batch["sum(rev4)"]})
            .group_by("o_custkey")
            .aggregate([("rev4", "sum")])
        )
        return g.rename_columns(["o_custkey", "rev4"])

    rev_by_cust = (
        j1.map_batches(cust_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Sum("rev4"))
    )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    j2 = hash_equi_join(
        rev_by_cust,
        cust,
        on=("o_custkey",),
        right_on=("c_custkey",),
        num_partitions=join_partitions_for_rows(2 * n_cust),
    )

    class Finish:
        def __init__(self, ref=nation_ref):
            self.lut = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rev4 = batch["sum(rev4)"].to_numpy(zero_copy_only=False).astype(np.int64)
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((ck, -rev4))[:20]
            t = batch.take(pa.array(order))
            nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "c_custkey": t["o_custkey"],
                    "c_name": t["c_name"],
                    "revenue": pa.array(
                        t["sum(rev4)"].to_numpy(zero_copy_only=False) / 1e4, pa.float64()
                    ),
                    "c_acctbal": t["c_acctbal"],
                    "n_name": pa.array(list(self.lut[nk]), pa.string()),
                }
            )

    top = j2.map_batches(
        Finish, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool()
    )
    return top.sort(["revenue", "c_custkey"], descending=[True, False]).limit(20)


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1995-10-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ------------------------------------------------- inverted index / TF-IDF


TOKEN_SPLIT_RE = "[^a-z0-9]+"
MIN_DF = 5
TFIDF_SCALE = 1_000_000
TFIDF_TOPK = 3


def _explode_terms(batch: pa.Table, id_col: str = "doc_id"):
    """(doc_id, text) batch -> (doc int64[], term str[]) exploded token
    stream, vectorized (utf8_lower + split_pattern_regex + flatten)."""
    lowered = pc.utf8_lower(batch["text"]).combine_chunks()
    lists = pc.split_pattern_regex(lowered, TOKEN_SPLIT_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    docs_all = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    parent = lists.value_parent_indices().to_numpy(zero_copy_only=False)
    terms = lists.flatten()
    keep = pc.not_equal(terms, "")
    terms = terms.filter(keep)
    doc = docs_all[parent[keep.to_numpy(zero_copy_only=False)]]
    return doc, terms


def _index_partial(batch: pa.Table) -> pa.Table:
    """Per-batch inverted-index partial: one (term, tf, df) row per term.
    Docs never split across batches, so df partials sum exactly."""
    doc, terms = _explode_terms(batch)
    td = (
        pa.table({"term": terms, "doc": pa.array(doc, pa.int64())})
        .group_by(["term", "doc"])
        .aggregate([("doc", "count")])
    )
    g = td.group_by("term").aggregate([("doc_count", "sum"), ("doc_count", "count")])
    return g.rename_columns(["term", "tf", "df"])


def q_docs_inverted_index(sf_dir: str):
    """Corpus inverted-index summary: per-term total frequency + document
    frequency. The term-key shuffle is hot-key-safe: partial aggregation
    means at most one row per (term, upstream block) enters the exchange,
    so even 'the' ships #blocks rows, not #occurrences."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    partials = ds.map_batches(_index_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("term").aggregate(Sum("tf"), Sum("df"))

    def finish(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"term": batch["term"], "tf": batch["sum(tf)"], "df": batch["sum(df)"]}
        )
        return t.filter(pc.greater_equal(t["df"], MIN_DF))

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).sort("term")


SQL_DOCS_INVERTED_INDEX = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS term
  FROM documents
), filt AS (SELECT doc_id, term FROM tok WHERE term <> '')
SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM filt GROUP BY term HAVING count(DISTINCT doc_id) >= {MIN_DF}
ORDER BY term
"""


def q_docs_tfidf_top(sf_dir: str):
    """Top-{TFIDF_TOPK} TF-IDF-ranked terms per document. Two passes:
    (1) the inverted index produces the document-frequency table — the
    vocabulary, bounded (~heaps-law) even at 10^12 docs, broadcast once
    via ray.put as (sorted terms, df) arrays; (2) a stateless per-batch
    kernel re-tokenizes, scores tf*SCALE//df in int64 (floor division —
    bit-exact vs DuckDB `//`), and emits each doc's top terms. No shuffle
    in pass 2 at all."""
    import ray

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    partials = ds.map_batches(_index_partial, batch_format="pyarrow", zero_copy_batch=True)
    vocab_tbl = (
        partials.groupby("term").aggregate(Sum("df")).to_pandas()
    )  # vocabulary only: tiny vs corpus
    vterms = np.asarray(vocab_tbl["term"], dtype=object)
    vdf = np.asarray(vocab_tbl["sum(df)"], dtype=np.int64)
    order = np.argsort(vterms)
    vocab_ref = ray.put((vterms[order], vdf[order]))

    class TfIdfTop:
        def __init__(self, ref=vocab_ref):
            self.terms, self.df = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc, terms = _explode_terms(batch)
            td = (
                pa.table({"doc": pa.array(doc, pa.int64()), "term": terms})
                .group_by(["doc", "term"])
                .aggregate([("term", "count")])
            )
            d = td["doc"].to_numpy(zero_copy_only=False)
            t = np.asarray(td["term"].to_pylist(), dtype=object)
            tf = td["term_count"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.terms, t)
            df = self.df[pos]
            score = (tf * TFIDF_SCALE) // df
            order = np.lexsort((t, -score, d))
            d, t, score = d[order], t[order], score[order]
            starts = np.r_[0, np.flatnonzero(np.diff(d)) + 1]
            rnk = np.arange(len(d)) - np.repeat(starts, np.diff(np.r_[starts, len(d)])) + 1
            keep = rnk <= TFIDF_TOPK
            return pa.table(
                {
                    "doc_id": pa.array(d[keep], pa.int64()),
                    "term": pa.array(list(t[keep]), pa.string()),
                    "score": pa.array(score[keep], pa.int64()),
                    "rnk": pa.array(rnk[keep], pa.int64()),
                }
            )

    return ds.map_batches(
        TfIdfTop, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool()
    )


SQL_DOCS_TFIDF_TOP = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS term
  FROM documents
), filt AS (SELECT doc_id, term FROM tok WHERE term <> ''),
td AS (SELECT doc_id, term, count(*) AS tf FROM filt GROUP BY doc_id, term),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM filt GROUP BY term),
scored AS (
  SELECT td.doc_id, td.term,
         (td.tf * {TFIDF_SCALE}) // dfs.df AS score,
         row_number() OVER (
           PARTITION BY td.doc_id
           ORDER BY (td.tf * {TFIDF_SCALE}) // dfs.df DESC, td.term
         ) AS rnk
  FROM td JOIN dfs USING (term)
)
SELECT doc_id, term, score, rnk FROM scored WHERE rnk <= {TFIDF_TOPK}
"""


# ----------------------------------------------------------- PageRank


PR_ITERS = 5


def q_doc_pagerank(sf_dir: str):
    """5 integer-PageRank supersteps over the deterministic doc link
    graph (stages/graph.py). Auto plan: broadcast-SpMV (rank vector is
    the small side; zero shuffles) while the node vector fits a worker
    heap, hash-shuffle join plan beyond — both bit-exact."""
    import pyarrow.parquet as _pq

    from python_rasterstats_ray.stages.graph import pagerank, synth_edges

    n_nodes = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read(sf_dir, "documents", columns=["doc_id"])
    edges = synth_edges(nodes, n_nodes)
    return pagerank(edges, nodes, n_iter=PR_ITERS, n_nodes=n_nodes).sort("node")


def _pagerank_sql() -> str:
    from python_rasterstats_ray.stages.graph import (
        EDGE_A,
        EDGE_B,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_INIT,
        PR_TELEPORT,
    )

    edge_selects = []
    for k, (a, b) in enumerate(zip(EDGE_A, EDGE_B)):
        edge_selects.append(
            f"SELECT doc_id AS src, (doc_id * {a} + {b}) % c AS dst "
            f"FROM docs, n WHERE doc_id % 4 >= {k}"
        )
    edges = "\nUNION ALL\n".join(edge_selects)
    step = (
        "SELECT e.dst AS node, "
        f"CAST({PR_TELEPORT} + ({PR_DAMP_NUM} * sum(p.pr // (1 + e.src % 4))) // {PR_DAMP_DEN} "
        "AS BIGINT) AS pr "
        "FROM edges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
    )
    iters = ",\n".join(
        f"pr{i} AS ({step.format(prev=f'pr{i - 1}')})" for i in range(1, PR_ITERS + 1)
    )
    return f"""
WITH docs AS (SELECT doc_id FROM documents),
n AS (SELECT count(*) AS c FROM docs),
edges AS (
{edges}
),
pr0 AS (SELECT doc_id AS node, CAST({PR_INIT} AS BIGINT) AS pr FROM docs),
{iters}
SELECT node, pr FROM pr{PR_ITERS} ORDER BY node
"""


# ------------------------------------------------- connected components


def q_doc_link_components(sf_dir: str):
    """Connected components over a deterministic crawl-adjacency graph
    (chains of 4 consecutive docs bridged at multiples of 16): the
    post-LSH dedup step that turns near-dup PAIRS into CLUSTERS via
    iterative min-label propagation (stages/graph.py). Auto plan:
    broadcast min-scatter (zero shuffles) while the label vector fits a
    worker heap; hash-shuffle join + min aggregate per superstep beyond."""
    import pyarrow.parquet as _pq

    from python_rasterstats_ray.stages.graph import components_auto

    n_nodes = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read(sf_dir, "documents", columns=["doc_id"])
    max_id = n_nodes - 1  # doc_id is contiguous 0..n-1 in the testdata

    def mk_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = ids[(ids % 4 != 3) & (ids + 1 <= max_id)]
        b = ids[(ids % 16 == 0) & (ids + 8 <= max_id)]
        return pa.table(
            {
                "src": pa.array(np.r_[a, b], pa.int64()),
                "dst": pa.array(np.r_[a + 1, b + 8], pa.int64()),
            }
        )

    edges = nodes.map_batches(mk_edges, batch_format="pyarrow", zero_copy_batch=True)
    cc = components_auto(edges, nodes, n_nodes=n_nodes)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "component": batch["lbl"]})

    return cc.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True).sort("node")


SQL_DOC_LINK_COMPONENTS = """
WITH RECURSIVE
docs AS (SELECT doc_id FROM documents),
mx AS (SELECT max(doc_id) AS m FROM docs),
ed AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM docs, mx
  WHERE doc_id % 4 <> 3 AND doc_id + 1 <= m
  UNION ALL
  SELECT doc_id, doc_id + 8 FROM docs, mx WHERE doc_id % 16 = 0 AND doc_id + 8 <= m
),
und AS (SELECT src, dst FROM ed UNION SELECT dst AS src, src AS dst FROM ed),
reach AS (
  SELECT src AS a, dst AS b FROM und
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN und e ON r.b = e.src
)
SELECT d.doc_id AS node,
       CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS BIGINT) AS component
FROM docs d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
ORDER BY node
"""


# ------------------------------------------------------ anti-join


def q_customers_no_orders(sf_dir: str):
    """Customers with no big-ticket order (o_totalprice > 300000): native
    LEFT ANTI hash-shuffle join — both sides large at scale, so no NOT-IN
    broadcast set; the filter is pushed below the join."""
    from python_rasterstats_ray.stages.joins import hash_equi_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def big(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["o_totalprice"], 300000.0)).drop_columns(
            ["o_totalprice"]
        )

    big_orders = orders.map_batches(big, batch_format="pyarrow", zero_copy_batch=True)
    out = hash_equi_join(
        cust, big_orders, on=("c_custkey",), right_on=("o_custkey",), join_type="left_anti"
    )
    return out.sort("c_custkey")


SQL_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
ORDER BY c_custkey
"""


# ------------------------------------------- exact histogram quantiles


QUANTILE_PCTS = (25, 50, 75, 90, 99)


def q_docs_length_quantiles(sf_dir: str):
    """Exact corpus-length percentiles via distributed value histogram:
    per-batch bincount partials -> groupby(value) Sum -> tiny cumulative
    scan. Exact at any scale for bounded-domain integer columns (the
    histogram size is the DOMAIN, not the corpus); quantile defined as
    the smallest v with cdf(v) >= ceil(p*n/100)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": batch["n_chars"].cast(pa.int64())})
            .group_by("v")
            .aggregate([("v", "count")])
        )
        return g.rename_columns(["v", "c"])

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("c"))
        .to_pandas()  # domain-sized, not corpus-sized
        .sort_values("v")
    )
    vals = hist["v"].to_numpy(dtype=np.int64)
    cum = hist["sum(c)"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1])
    out = {"p": [], "value": []}
    for p in QUANTILE_PCTS:
        rank = (p * n + 99) // 100
        out["p"].append(p)
        out["value"].append(int(vals[np.searchsorted(cum, rank)]))
    return pa.table({"p": pa.array(out["p"], pa.int64()), "value": pa.array(out["value"], pa.int64())})


SQL_DOCS_LENGTH_QUANTILES = f"""
WITH counts AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cm,
         (SELECT count(*) FROM documents) AS n
  FROM counts
),
ps(p) AS (VALUES {", ".join(f"({p})" for p in QUANTILE_PCTS)})
SELECT CAST(p AS BIGINT) AS p, CAST(min(v) AS BIGINT) AS value
FROM cum, ps WHERE cm >= (p * n + 99) // 100
GROUP BY p ORDER BY p
"""


# ------------------------------------------------- n-gram LM counts


BIGRAM_TOPK = 100


def q_docs_bigrams(sf_dir: str):
    """Corpus bigram counts (LM-data statistics), top-{BIGRAM_TOPK}:
    per-batch explode-to-adjacent-pairs + local count partials, then one
    small groupby(bigram) Sum — same hot-key-safe shape as the inverted
    index (≤1 row per (bigram, block) enters the shuffle) — and a
    local-top-k + tiny global sort for the final cut."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        doc, terms = _explode_terms(batch)
        t = np.asarray(terms.to_pylist(), dtype=object)
        if len(t) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        adj = doc[:-1] == doc[1:]
        big = np.char.add(
            np.char.add(t[:-1][adj].astype(str), " "), t[1:][adj].astype(str)
        )
        g = (
            pa.table({"bigram": pa.array(big, pa.string())})
            .group_by("bigram")
            .aggregate([("bigram", "count")])
        )
        return g.rename_columns(["bigram", "c"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("c"))
    )

    def local_top(batch: pa.Table) -> pa.Table:
        cnt = batch["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        bg = np.asarray(batch["bigram"].to_pylist(), dtype=object)
        order = np.lexsort((bg, -cnt))[:BIGRAM_TOPK]
        return pa.table(
            {
                "bigram": pa.array(list(bg[order]), pa.string()),
                "cnt": pa.array(cnt[order], pa.int64()),
            }
        )

    top = agg.map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True)
    return top.sort(["cnt", "bigram"], descending=[True, False]).limit(BIGRAM_TOPK)


SQL_DOCS_BIGRAMS = f"""
WITH l AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     x -> x <> '') AS toks
  FROM documents
),
bg AS (
  SELECT unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS bigram
  FROM l
)
SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram
ORDER BY cnt DESC, bigram LIMIT {BIGRAM_TOPK}
"""


# ------------------------------------- grouped histogram quantiles


LANG_QUANTILE_PCTS = (50, 90)


def q_docs_length_quantiles_by_lang(sf_dir: str):
    """Per-language exact length percentiles: one groupby((lang, value))
    histogram shuffle (domain-sized per group), then a driver-side scan
    over langs x domain — grouped HOLISTIC stats without a holistic
    shuffle, the same trick the zonal tiled path uses for percentiles."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": batch["lang"], "v": batch["n_chars"].cast(pa.int64())})
            .group_by(["lang", "v"])
            .aggregate([("v", "count")])
        )
        return g.rename_columns(["lang", "v", "c"])

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "v"])
        .aggregate(Sum("c"))
        .to_pandas()  # (#langs x domain)-sized, not corpus-sized
        .sort_values(["lang", "v"])
    )
    rows = {"lang": [], "p": [], "value": []}
    for lang, grp in hist.groupby("lang", sort=True):
        vals = grp["v"].to_numpy(dtype=np.int64)
        cum = grp["sum(c)"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        for p in LANG_QUANTILE_PCTS:
            rank = (p * n + 99) // 100
            rows["lang"].append(lang)
            rows["p"].append(p)
            rows["value"].append(int(vals[np.searchsorted(cum, rank)]))
    return pa.table(
        {
            "lang": pa.array(rows["lang"], pa.string()),
            "p": pa.array(rows["p"], pa.int64()),
            "value": pa.array(rows["value"], pa.int64()),
        }
    )


SQL_DOCS_LENGTH_QUANTILES_BY_LANG = f"""
WITH counts AS (SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
cum AS (
  SELECT lang, v, sum(c) OVER (PARTITION BY lang ORDER BY v) AS cm,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM counts
),
ps(p) AS (VALUES {", ".join(f"({p})" for p in LANG_QUANTILE_PCTS)})
SELECT lang, CAST(p AS BIGINT) AS p, CAST(min(v) AS BIGINT) AS value
FROM cum, ps WHERE cm >= (p * n + 99) // 100
GROUP BY lang, p ORDER BY lang, p
"""


# ------------------------------------------- storage-bucketed join


BUCKETED_N = 16


def q_bucketed_revenue(sf_dir: str):
    """Revenue by order priority via a STORAGE-BUCKETED join: both tables
    are written hash-bucketed by orderkey once (the shuffle happens at
    write time), then the join runs one task per bucket with a pruned
    read of exactly that bucket from each side and a local Arrow hash
    join — zero exchange at join time (stages/bucketed.py)."""
    import tempfile

    from ray.data.aggregate import Sum

    from python_rasterstats_ray.stages.bucketed import bucketed_join, write_bucketed

    root = tempfile.mkdtemp(prefix="prsr_bucketed_", dir="/tmp")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    pa_dir = write_bucketed(orders, "o_orderkey", BUCKETED_N, f"{root}/orders")
    pb_dir = write_bucketed(li, "l_orderkey", BUCKETED_N, f"{root}/lineitem")

    j = bucketed_join(
        pa_dir, pb_dir, "o_orderkey", "l_orderkey", BUCKETED_N,
        columns_a=["o_orderkey", "o_orderpriority"],
        columns_b=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o_orderpriority": batch["o_orderpriority"],
                    "rev4": pa.array(
                        _rev4(batch["l_extendedprice"], batch["l_discount"]), pa.int64()
                    ),
                }
            )
            .group_by("o_orderpriority")
            .aggregate([("rev4", "sum")])
        )
        return g.rename_columns(["o_orderpriority", "rev4"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "revenue": pa.array(
                    batch["sum(rev4)"].to_numpy(zero_copy_only=False) / 1e4, pa.float64()
                ),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("rev4"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort("o_orderpriority")
    )


SQL_BUCKETED_REVENUE = """
SELECT o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------- storage-bucketed TPC-H Q3


Q3_STORE_N = 16


def build_q3_store(sf_dir: str, root: str, n_buckets: int = Q3_STORE_N) -> str:
    """Write orders + lineitem hash-bucketed by orderkey under ``root``
    (idempotent): the pay-once exchange of the bucketed-store plan. At
    100 TB this is the layout shared storage keeps anyway — tables that
    join repeatedly on orderkey live co-partitioned by it."""
    import os

    from python_rasterstats_ray.stages.bucketed import write_bucketed

    if os.path.isdir(f"{root}/lineitem") and os.path.isdir(f"{root}/orders"):
        return root
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    write_bucketed(orders, "o_orderkey", n_buckets, f"{root}/orders")
    write_bucketed(li, "l_orderkey", n_buckets, f"{root}/lineitem")
    return root


def q_tpch_q3_store(sf_dir: str, store_root: str | None = None,
                    n_buckets: int = Q3_STORE_N):
    """TPC-H Q3 over the storage-bucketed orders/lineitem layout
    (stages/bucketed.py): ZERO exchange at query time. One task per
    bucket does the date filters, the per-orderkey revenue pre-agg, the
    BUILDING-keyset semi-join (broadcast sorted searchsorted filter — the
    one genuinely small side), a local Arrow hash join and a local
    top-10; only n_buckets x 10 thin rows reach the final global top-10.
    Same result as q_tpch_q3 (shared SQL oracle); this is the plan shape
    the shuffle version converges to once the tables live co-partitioned
    on storage — no aggregator actors, no all-to-all, bandwidth bill
    bounded by each task's own bucket."""
    import os
    import tempfile

    import ray
    import ray.data

    if store_root is None:
        tag = os.path.basename(os.path.normpath(sf_dir))
        store_root = os.path.join(
            tempfile.gettempdir(), f"prsr_q3_store_{tag}_{n_buckets}"
        )
    build_q3_store(sf_dir, store_root, n_buckets)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keep = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    bkeys_ref = ray.put(np.sort(keep.to_numpy(zero_copy_only=False).astype(np.int64)))

    empty = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_orderpriority": pa.array([], pa.string()),
        }
    )

    if len(keep) == 0:
        # no BUILDING customers at all: the whole fleet of bucket reads
        # would filter to nothing — short-circuit before launching any task
        return ray.data.from_arrow(empty)

    def bucket_task(batch: pa.Table) -> pa.Table:
        import ray as _r

        bk = _r.get(bkeys_ref)
        outs = []
        if len(bk) == 0:  # defensive; the driver short-circuits this case
            return empty
        for bucket in batch["bucket"].to_pylist():
            od = os.path.join(store_root, "orders", f"bucket={bucket}")
            ld = os.path.join(store_root, "lineitem", f"bucket={bucket}")
            if not (os.path.isdir(od) and os.path.isdir(ld)):
                continue
            o = pq.read_table(
                od, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
            )
            o = o.filter(pc.less(o["o_orderdate"], pa.scalar(Q3_CUTOFF)))
            ck = o["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(bk, ck)
            pos[pos >= len(bk)] = 0
            o = o.filter(pa.array(bk[pos] == ck)).drop_columns(["o_custkey"])
            if len(o) == 0:
                continue
            li = pq.read_table(
                ld, columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
            )
            li = li.filter(pc.greater(li["l_shipdate"], pa.scalar(Q3_CUTOFF)))
            if len(li) == 0:
                continue
            g = (
                pa.table(
                    {
                        "l_orderkey": li["l_orderkey"],
                        "rev4": pa.array(
                            _rev4(li["l_extendedprice"], li["l_discount"]), pa.int64()
                        ),
                    }
                )
                .group_by("l_orderkey")
                .aggregate([("rev4", "sum")])
            )
            j = g.join(o, keys=["l_orderkey"], right_keys=["o_orderkey"],
                       join_type="inner")
            if len(j) == 0:
                continue
            rev4 = j["rev4_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
            key = j["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            dt = j["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            order = np.lexsort((key, dt, -rev4))[:10]
            t = j.take(pa.array(order))
            outs.append(
                pa.table(
                    {
                        "l_orderkey": t["l_orderkey"],
                        "revenue": pa.array(
                            t["rev4_sum"].to_numpy(zero_copy_only=False) / 1e4,
                            pa.float64(),
                        ),
                        "o_orderdate": t["o_orderdate"],
                        "o_orderpriority": t["o_orderpriority"],
                    }
                )
            )
        if not outs:
            return empty
        return pa.concat_tables(outs, promote_options="default")

    from ..stages._cluster import id_blocks_ds

    buckets = id_blocks_ds(range(n_buckets), n_buckets, "bucket")
    top = buckets.map_batches(
        bucket_task, batch_size=1, batch_format="pyarrow", concurrency=pool_cap()
    )
    return top.sort(
        ["revenue", "o_orderdate", "l_orderkey"], descending=[True, False, False]
    ).limit(10)


# ------------------------------------- partitioned-store kNN


def q_knn_points_partitioned(sf_dir: str, k: int = 5, n_queries: int = 100):
    """Same result as knn_points_geo, but through the disk-partitioned
    point store (state/partitioned_points.py): reference points written
    once partitioned by spatial block, the kNN kernel loads only each
    query's block neighbourhood — the bigger-than-memory reference-side
    path. Shares the exact SQL oracle with the in-memory variant."""
    import tempfile

    import ray.data

    from python_rasterstats_ray.pipelines.queries import _doc_points, _small_table
    from python_rasterstats_ray.stages.knn_points import knn_points_from_store
    from python_rasterstats_ray.state.partitioned_points import (
        points_write_partitioned,
    )

    full = _small_table(sf_dir, "documents", columns=["doc_id"])
    ids = np.asarray(full["doc_id"].to_pylist(), dtype=np.int64)
    lon, lat = _doc_points(ids)
    pts = pa.table(
        {
            "pt_id": pa.array(ids, pa.int64()),
            "x": pa.array(lon, pa.float64()),
            "y": pa.array(lat, pa.float64()),
        }
    )
    store = tempfile.mkdtemp(prefix="prsr_ptstore_", dir="/tmp")
    block = 30.0  # degrees; ~12x4 occupied blocks over the lon/lat extent
    points_write_partitioned(ray.data.from_arrow(pts), block, store)

    qmask = ids < n_queries
    queries = pa.table(
        {
            "pt_id": pa.array(ids[qmask], pa.int64()),
            "x": pa.array(lon[qmask], pa.float64()),
            "y": pa.array(lat[qmask], pa.float64()),
        }
    )
    out = knn_points_from_store(
        ray.data.from_arrow(queries), store, block=block, k=k
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "neighbor_id", "knn_rank"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


JOIN_QUERIES = {
    "tpch_q3": q_tpch_q3,
    "tpch_q10": q_tpch_q10,
    "docs_inverted_index": q_docs_inverted_index,
    "docs_tfidf_top": q_docs_tfidf_top,
    "doc_pagerank": q_doc_pagerank,
    "doc_link_components": q_doc_link_components,
    "customers_no_orders": q_customers_no_orders,
    "docs_length_quantiles": q_docs_length_quantiles,
    "bucketed_revenue": q_bucketed_revenue,
    "docs_bigrams": q_docs_bigrams,
    "docs_length_quantiles_by_lang": q_docs_length_quantiles_by_lang,
    "knn_points_partitioned": q_knn_points_partitioned,
    "tpch_q3_store": q_tpch_q3_store,
}

JOIN_ORACLE_SQL = {
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q10": SQL_TPCH_Q10,
    "docs_inverted_index": SQL_DOCS_INVERTED_INDEX,
    "docs_tfidf_top": SQL_DOCS_TFIDF_TOP,
    "doc_pagerank": _pagerank_sql(),
    "knn_points_partitioned": None,  # filled below: shares the in-memory kNN oracle
    "doc_link_components": SQL_DOC_LINK_COMPONENTS,
    "customers_no_orders": SQL_CUSTOMERS_NO_ORDERS,
    "docs_length_quantiles": SQL_DOCS_LENGTH_QUANTILES,
    "bucketed_revenue": SQL_BUCKETED_REVENUE,
    "docs_bigrams": SQL_DOCS_BIGRAMS,
    "docs_length_quantiles_by_lang": SQL_DOCS_LENGTH_QUANTILES_BY_LANG,
    "tpch_q3_store": SQL_TPCH_Q3,  # same query, storage-bucketed plan
}


def _fill_shared_oracles():
    from python_rasterstats_ray.pipelines.queries import SQL_KNN_POINTS_GEO

    JOIN_ORACLE_SQL["knn_points_partitioned"] = SQL_KNN_POINTS_GEO


_fill_shared_oracles()


Q5_LO = pd.Timestamp("1996-01-01")
Q5_HI = pd.Timestamp("1997-01-01")
Q5_REGION = "ASIA"


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 (local supplier volume): revenue per nation for orders
    whose customer and line-item supplier share a nation inside one
    region — the classic 6-table join. Plan by side size:

    - region -> nation (25 rows) and supplier (suppkey -> nationkey)
      broadcast once via ray.put (small by schema contract);
    - orders x customer is a native HASH-SHUFFLE join (both corpus-
      sized at 10^12 rows) after the date filter prunes orders;
    - lineitem maps s_nationkey in-batch from the broadcast supplier
      LUT, filters to region nations, pre-aggregates rev4 per
      (orderkey, nation) — only thin partials reach the second
      hash join; the equality c_nation == s_nation applies post-join;
    - revenue sums are exact integer 1e4-scaled (the _rev4 convention),
      one final float divide.
    """
    import ray

    from ray.data.aggregate import Sum

    from python_rasterstats_ray.stages.joins import hash_equi_join

    region = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {
        n: k for k, n in zip(
            region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()
        )
    }[Q5_REGION]
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = np.asarray(nation["n_nationkey"].to_pylist(), np.int64)
    nr = np.asarray(nation["n_regionkey"].to_pylist(), np.int64)
    nnames = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    in_region = np.zeros(int(nk.max()) + 1, bool)
    in_region[nk[nr == rkey]] = True
    name_lut = np.empty(int(nk.max()) + 1, dtype=object)
    name_lut[nk] = nnames
    supplier = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    sk = supplier["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supplier["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    slut = np.full(int(sk.max()) + 1, -1, np.int64)
    slut[sk] = sn
    refs = ray.put((in_region, name_lut, slut))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilter(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(Q5_LO)),
            pc.less(batch["o_orderdate"], pa.scalar(Q5_HI)),
        )
        return batch.filter(m).drop_columns(["o_orderdate"])

    orders_f = orders.map_batches(ofilter, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    # STATELESS task-based kernels (the proven two-join q10 shape): a
    # plan with two shuffle joins on a small cluster deadlocks when
    # pinned actor pools idle-hold the CPUs the reads/joins need
    # (observed at num_cpus=4: 3 idle actors + 2 joins + 2 reads demand
    # ~6 CPUs, everything backpressured). ray.get of an already-local
    # broadcast object per batch is a plasma lookup — stateless is free.
    def cust_in_region(batch: pa.Table) -> pa.Table:
        in_region, _, _ = ray.get(refs)
        ck = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = in_region[np.clip(ck, 0, len(in_region) - 1)] & (ck < len(in_region))
        return batch.filter(pa.array(keep))

    cust_f = cust.map_batches(
        cust_in_region, batch_format="pyarrow", zero_copy_batch=True
    )
    j1 = hash_equi_join(orders_f, cust_f, on=("o_custkey",), right_on=("c_custkey",))

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_nation_partial(batch: pa.Table) -> pa.Table:
            in_region, _, slut = ray.get(refs)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            snat = slut[np.clip(sk, 0, len(slut) - 1)]
            ok = (sk < len(slut)) & (snat >= 0)
            ok &= in_region[np.clip(snat, 0, len(in_region) - 1)] & (
                snat < len(in_region)
            )
            t = batch.filter(pa.array(ok))
            g = (
                pa.table(
                    {
                        "l_orderkey": t["l_orderkey"],
                        "s_nationkey": pa.array(snat[ok], pa.int64()),
                        "rev4": pa.array(
                            _rev4(t["l_extendedprice"], t["l_discount"]), pa.int64()
                        ),
                    }
                )
                .group_by(["l_orderkey", "s_nationkey"])
                .aggregate([("rev4", "sum")])
            )
            return g.rename_columns(["l_orderkey", "s_nationkey", "rev4"])

    li_p = (
        li.map_batches(li_nation_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_orderkey", "s_nationkey"])
        .aggregate(Sum("rev4"))
    )
    j2 = hash_equi_join(li_p, j1, on=("l_orderkey",), right_on=("o_orderkey",))

    def nation_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["s_nationkey"], batch["c_nationkey"]))
        g = (
            pa.table({"nk": t["s_nationkey"], "rev4": t["sum(rev4)"]})
            .group_by("nk")
            .aggregate([("rev4", "sum")])
        )
        return g.rename_columns(["nk", "rev4"])

    def finish(batch: pa.Table) -> pa.Table:
        _, name_lut, _ = ray.get(refs)
        nkv = batch["nk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array(list(name_lut[nkv]), pa.string()),
                "revenue": pa.array(
                    batch["sum(rev4)"].to_numpy(zero_copy_only=False) / 1e4,
                    pa.float64(),
                ),
            }
        )

    by_nation = (
        j2.map_batches(nation_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nk")
        .aggregate(Sum("rev4"))
    )
    return by_nation.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    ).sort("revenue", descending=True)


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""

JOIN_QUERIES["tpch_q5"] = q_tpch_q5
JOIN_ORACLE_SQL["tpch_q5"] = SQL_TPCH_Q5


PMI_MIN_COUNT = 5
PMI_TOPK = 20


def q_docs_pmi_top(sf_dir: str):
    """Pointwise mutual information for corpus bigrams (the association
    measure behind collocation discovery / phrase mining): pmi(a, b) =
    ln(c_ab * N^2 / (NB * c_a * c_b)) floored to int64 micronats — the
    unigram-LM micronat convention, so the one float chain (two exact
    int->float conversions, one divide, ln, *1e6, floor) is reproduced
    verbatim in SQL. Plain space tokens match the LM queries.

    Distributed shape: per-batch (w1, w2) pair-count partials and the
    token-count partials each collapse in ONE small groupby (<= 1 row
    per distinct pair/word per block, the hot-key-safe inverted-index
    shape); the driver joins only pairs with count >= 5 against the
    vocab (the unigram-LM vocab-fits-driver bound) and emits the top 20
    by (pmi DESC, bigram ASC)."""
    from ray.data.aggregate import Sum

    from python_rasterstats_ray.stages.text import token_count_partials

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(words).to_pylist(), dtype=object)
        doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if len(flat) < 2:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        adj = doc[:-1] == doc[1:]
        g = (
            pa.table(
                {
                    "a": pa.array(list(flat[:-1][adj]), pa.string()),
                    "b": pa.array(list(flat[1:][adj]), pa.string()),
                }
            )
            .group_by(["a", "b"])
            .aggregate([("a", "count")])
        )
        return g.rename_columns(["a", "b", "c"])

    pair_agg = (
        ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Sum("c"))
    )
    uni_agg = (
        ds.map_batches(token_count_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("c")
    )

    pairs = pa.concat_tables(pair_agg.iter_batches(batch_format="pyarrow")).to_pandas()
    uni = pa.concat_tables(uni_agg.iter_batches(batch_format="pyarrow")).to_pandas()
    ucount = dict(zip(uni["token"], (int(x) for x in uni["sum(c)"])))
    n_tokens = sum(ucount.values())
    nb_total = int(pairs["sum(c)"].sum())
    out = []
    for a, b, c in zip(pairs["a"], pairs["b"], pairs["sum(c)"]):
        c = int(c)
        if c < PMI_MIN_COUNT:
            continue
        num = c * n_tokens * n_tokens           # exact Python ints
        den = nb_total * ucount[a] * ucount[b]
        pmi = int(np.floor(np.log(float(num) / float(den)) * 1_000_000.0))
        out.append((f"{a} {b}", c, pmi))
    out.sort(key=lambda r: (-r[2], r[0]))
    out = out[:PMI_TOPK]
    return pd.DataFrame(
        {
            "bigram": [r[0] for r in out],
            "n_pair": pd.array([r[1] for r in out], dtype="int64"),
            "pmi_micronats": pd.array([r[2] for r in out], dtype="int64"),
        }
    ).astype({"n_pair": "int64", "pmi_micronats": "int64"})


SQL_DOCS_PMI_TOP = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
uc AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(tl) AS w FROM w) GROUP BY w
),
tot AS (SELECT sum(c) AS n FROM uc),
bg AS (
  SELECT u['a'] AS a, u['b'] AS b
  FROM (SELECT unnest([{{'a': tl[i], 'b': tl[i + 1]}}
                       for i in range(1, len(tl))]) AS u FROM w)
),
bc AS (SELECT a, b, count(*) AS c FROM bg GROUP BY a, b),
btot AS (SELECT sum(c) AS nb FROM bc)
SELECT bc.a || ' ' || bc.b AS bigram,
       CAST(bc.c AS BIGINT) AS n_pair,
       CAST(floor(ln(CAST(bc.c * tot.n * tot.n AS DOUBLE)
                     / CAST(btot.nb * ua.c * ub.c AS DOUBLE)) * 1000000)
            AS BIGINT) AS pmi_micronats
FROM bc
JOIN uc ua ON ua.w = bc.a
JOIN uc ub ON ub.w = bc.b
CROSS JOIN tot CROSS JOIN btot
WHERE bc.c >= {PMI_MIN_COUNT}
ORDER BY pmi_micronats DESC, bigram
LIMIT {PMI_TOPK}
"""

JOIN_QUERIES["docs_pmi_top"] = q_docs_pmi_top
JOIN_ORACLE_SQL["docs_pmi_top"] = SQL_DOCS_PMI_TOP


def q_doc_triangles(sf_dir: str):
    """Triangle counting on the undirected doc link graph (the global
    clustering-coefficient numerator): canonical a < b edges dedupe in
    one groupby, WEDGES come from one hash-shuffle self-join on the
    shared low endpoint (b < c kills mirror duplicates), and each wedge
    closes iff (b, c) is itself an edge — membership via a broadcast
    sorted packed-key array (one int64 per edge; documented bound: the
    edge KEY set fits workers — the escape hatch is a second hash join
    of wedges against edges). Output: one exact row (n_edges,
    n_triangles)."""
    import pyarrow.parquet as _pq
    import ray

    from python_rasterstats_ray.stages.graph import synth_edges
    from python_rasterstats_ray.stages.joins import hash_equi_join

    n_nodes = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read(sf_dir, "documents", columns=["doc_id"])
    edges = synth_edges(nodes, n_nodes)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy().astype(np.int64)
        d = batch["dst"].to_numpy().astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        # coarse bucket on the edge key so the distinct below reduces
        # all its edge groups in one Arrow group_by per bucket (per-edge
        # map_groups would pay a Python call per distinct edge)
        g = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            bk = (
                (u[:, 0].astype(np.uint64) * g + u[:, 1].astype(np.uint64)) * g
            ) >> np.uint64(56)
        return pa.table(
            {
                "a": pa.array(u[:, 0], pa.int64()),
                "b": pa.array(u[:, 1], pa.int64()),
                "bucket": pa.array(bk.astype(np.int64), pa.int64()),
            }
        )

    def distinct_edges(group: pa.Table) -> pa.Table:
        return group.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    eu = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(distinct_edges, batch_format="pyarrow")
        .materialize()
    )
    n_edges = eu.count()

    # broadcast edge membership keys (a * n_nodes + b, sorted)
    keys = np.sort(
        np.concatenate(
            [
                b["a"].to_numpy().astype(np.int64) * n_nodes
                + b["b"].to_numpy().astype(np.int64)
                for b in eu.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    kref = ray.put(keys)

    right = eu.map_batches(
        lambda t: t.rename_columns(["a2", "c"]), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wedges = hash_equi_join(eu, right, on=("a",), right_on=("a2",))

    def close_partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        b = batch["b"].to_numpy().astype(np.int64)
        c = batch["c"].to_numpy().astype(np.int64)
        m = b < c
        key = b[m] * n_nodes + c[m]
        p = np.clip(np.searchsorted(ks, key), 0, len(ks) - 1)
        hits = int((ks[p] == key).sum()) if len(key) else 0
        return pa.table({"t": pa.array([hits], pa.int64())})

    parts = wedges.map_batches(close_partial, batch_format="pyarrow", zero_copy_batch=True)
    total = sum(
        int(x) for b in parts.iter_batches(batch_format="pyarrow") for x in b["t"].to_pylist()
    )
    return pd.DataFrame({"n_edges": [int(n_edges)], "n_triangles": [int(total)]}).astype(
        {"n_edges": "int64", "n_triangles": "int64"}
    )


def _triangles_sql() -> str:
    from python_rasterstats_ray.stages.graph import EDGE_A, EDGE_B

    sel = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id AS src, ({a} * doc_id + {b}) % (SELECT count(*) FROM documents) AS dst\n"
        f"  FROM documents WHERE doc_id % 4 >= {k}"
        for k, (a, b) in enumerate(zip(EDGE_A, EDGE_B))
    )
    return f"""
WITH e0 AS (
  {sel}
),
eu AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src != dst
)
SELECT (SELECT count(*) FROM eu) AS n_edges,
       (SELECT count(*)
        FROM eu e1
        JOIN eu e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN eu e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles
"""


JOIN_QUERIES["doc_triangles"] = q_doc_triangles
JOIN_ORACLE_SQL["doc_triangles"] = _triangles_sql()


# ----------------------------------------------------------- BM25 retrieval


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("join", "hash", "stream", "vector")
BM25_TOPK = 20


def q_docs_bm25_top(sf_dir: str):
    """BM25 top-{BM25_TOPK} ranked retrieval for the fixed query
    {BM25_QUERY} (Robertson/Sparck-Jones idf, k1={BM25_K1}, b={BM25_B}).

    100-TB shape — contrast q_docs_tfidf_top, whose pass 1 ships the
    whole vocabulary through a term-key exchange: BM25 retrieval only
    needs |Q| document frequencies plus the corpus length stats, so
    pass 1 reduces each block to ONE O(|Q|)-width partial row (docs are
    rows, never split across batches, so per-block distinct-doc counts
    sum exactly) and the driver folds #blocks rows — no exchange at
    all. Pass 2 closes over the |Q| idf weights (broadcast-by-closure,
    4 floats), scores each block vectorized (bincount tf over the
    unique-doc inverse), and emits a per-block top-K partial; the
    final merge sorts #blocks*K candidate rows on the driver — the
    same documented candidate-sized reduction the kNN family uses.
    """
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    qset = pa.array(list(BM25_QUERY), pa.string())

    def stats_partial(batch: pa.Table) -> pa.Table:
        doc, terms = _explode_terms(batch)
        out = {
            "n_docs": [int(len(np.unique(doc)))],
            "n_tokens": [int(len(doc))],
        }
        isq = pc.is_in(terms, value_set=qset).to_numpy(zero_copy_only=False)
        tarr = np.asarray(terms.to_pylist(), dtype=object)[isq]
        darr = doc[isq]
        for i, qt in enumerate(BM25_QUERY):
            out[f"df_{i}"] = [int(len(np.unique(darr[tarr == qt])))]
        return pa.table(out)

    folded = (
        ds.map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # one row per block: O(#blocks), documented tiny
        .sum()
    )
    n = float(folded["n_docs"])
    avgdl = float(folded["n_tokens"]) / n
    idf = np.array(
        [
            np.log(1.0 + (n - float(folded[f"df_{i}"]) + 0.5) / (float(folded[f"df_{i}"]) + 0.5))
            for i in range(len(BM25_QUERY))
        ]
    )

    def score_topk(batch: pa.Table) -> pa.Table:
        doc, terms = _explode_terms(batch)
        udoc, inv, counts = np.unique(doc, return_inverse=True, return_counts=True)
        dl = counts.astype(np.float64)
        denom_base = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        score = np.zeros(len(udoc))
        for i, qt in enumerate(BM25_QUERY):
            m = pc.equal(terms, qt).to_numpy(zero_copy_only=False)
            tf = np.bincount(inv[m], minlength=len(udoc)).astype(np.float64)
            score += idf[i] * (tf * (BM25_K1 + 1.0)) / (tf + denom_base)
        pos = (score > 0.0).nonzero()[0]  # oracle's inner join: >=1 query term
        pos = pos[np.lexsort((udoc[pos], -score[pos]))][:BM25_TOPK]
        return pa.table(
            {
                "doc_id": pa.array(udoc[pos], pa.int64()),
                "score": pa.array(score[pos], pa.float64()),
            }
        )

    cand = ds.map_batches(
        score_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # <= #blocks * K candidate rows
    cand = cand.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    top = cand.head(BM25_TOPK).reset_index(drop=True)
    top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS term
  FROM documents
), filt AS (SELECT doc_id, term FROM tok WHERE term <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM filt GROUP BY doc_id),
corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
qdf AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM filt
  WHERE term IN ({terms}) GROUP BY term
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM filt
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (corpus.n - qdf.df + 0.5) / (qdf.df + 0.5))
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / corpus.avgdl))) AS score
  FROM tf JOIN qdf USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
FROM scored
ORDER BY rnk
LIMIT {BM25_TOPK}
"""


JOIN_QUERIES["docs_bm25_top"] = q_docs_bm25_top
JOIN_ORACLE_SQL["docs_bm25_top"] = _bm25_sql()
