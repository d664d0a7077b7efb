"""Iterative graph algorithms on Ray Data (integer PageRank).

PageRank is the canonical iterative large-large-join workload: each
superstep joins the (huge) edge table against the current rank vector,
then re-aggregates by destination. On Ray Data each iteration is

    edges ⋈ pr  (hash-shuffle join on src — both sides large)
      -> map_batches partial: per-batch group_by(dst) sum of contributions
      -> groupby(dst).aggregate(Sum)  (small: ≤1 row per (dst, block))
      -> vectorized rank update

All arithmetic is int64 "micro-rank" units with floor division, so every
sum is order-independent and the result is bit-exact against a DuckDB
oracle that unrolls the same iterations in SQL — no float drift across
shuffle orders, which matters because a distributed reduce has no stable
summation order.

Scale notes: the edge table is never materialized on the driver; the rank
vector rides the same hash partitioning as the join key every iteration.
K iterations = K joins; at 10^12 edges pin ``num_partitions`` so each
aggregator's build side (its pr shard) stays in-heap. Deterministic
synthetic edges (affine maps mod N) stand in for a crawled link graph;
out-degree is ``1 + src % 4`` and map k=0 is a bijection (gcd(a0, N)=1)
so every node has in-edges and no rank row ever drops out of the loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .joins import hash_equi_join

# one hash-shuffle aggregator per this many edge rows (pool startup is
# the fixed cost per superstep: at 32 CPUs a 32-aggregator pool costs
# ~6 s to spin up, so small graphs must not pay for a big pool)
_ROWS_PER_JOIN_PARTITION = 250_000


def _auto_join_partitions(n_rows: int) -> int:
    from .joins import default_join_partitions

    cap = default_join_partitions()
    return min(cap, max(8, -(-n_rows // _ROWS_PER_JOIN_PARTITION)))

# affine maps dst_k = (A[k] * src + B[k]) % n ; edge k exists iff src % 4 >= k
EDGE_A = (7, 13, 31, 57)
EDGE_B = (1, 5, 11, 2)
PR_INIT = 1_000_000  # micro-rank units
PR_TELEPORT = 150_000  # (1 - 0.85) * 1e6
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def synth_edges(nodes_ds, n_nodes: int):
    """Deterministic link graph over a (node_id) Dataset: out-degree
    1 + id % 4, destinations by affine maps mod n_nodes."""

    def expand(batch: pa.Table) -> pa.Table:
        src = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        outs = []
        for k, (a, b) in enumerate(zip(EDGE_A, EDGE_B)):
            s = src[src % 4 >= k]
            outs.append(
                pa.table(
                    {
                        "src": pa.array(s, pa.int64()),
                        "dst": pa.array((a * s + b) % n_nodes, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return nodes_ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def undirect(edges_ds):
    """Duplicate each (src, dst) edge in both directions."""

    def both(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"src": batch["src"], "dst": batch["dst"]}),
                pa.table({"src": batch["dst"], "dst": batch["src"]}),
            ]
        )

    return edges_ds.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(
    edges_ds,
    nodes_ds,
    max_iter: int = 25,
    num_partitions: int | None = None,
):
    """Min-label propagation connected components; returns (node, component).

    The post-LSH dedup step: near-dup PAIRS (possibly chains, since hot
    LSH buckets are capped to connectivity-preserving chains) become
    CLUSTERS, each labeled by its minimum member id. Per superstep:
    undirected edges ⋈ labels (hash-shuffle join) -> per-batch min
    partial by dst -> union with current labels -> groupby(node) Min.

    Labels only ever decrease, so sum(labels) is strictly monotone until
    the fixpoint — the loop stops when the sum stops changing (an O(1)
    driver check against the materialized per-iteration state, which the
    next join consumes anyway). Iterations needed = eccentricity of each
    component's min vertex; dedup clusters are shallow.
    """
    from ray.data.aggregate import Min, Sum

    und = undirect(edges_ds).materialize()
    if num_partitions is None:
        num_partitions = _auto_join_partitions(und.count())

    def init_labels(batch: pa.Table) -> pa.Table:
        node = batch.column(0).cast(pa.int64())
        return pa.table({"node": node, "lbl": node})

    labels = nodes_ds.map_batches(
        init_labels, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def msg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"node": batch["dst"], "lbl": batch["lbl"]})
        return t.group_by("node").aggregate([("lbl", "min")]).rename_columns(
            ["node", "lbl"]
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "lbl": batch["min(lbl)"]})

    prev_sum = None
    for _ in range(max_iter):
        joined = hash_equi_join(
            und, labels, on=("src",), right_on=("node",), num_partitions=num_partitions
        )
        msgs = joined.map_batches(
            msg_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("lbl"))
            .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
        s = labels.sum("lbl")
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def pagerank_int(edges_ds, nodes_ds, n_iter: int = 5, num_partitions: int | None = None):
    """n_iter integer-PageRank supersteps; returns Dataset(node, pr).

    General graphs: out-degree is computed FROM the edge table (one
    edge-sized join at setup, amortized over all supersteps), and every
    node seeds each superstep's aggregate with a zero contribution, so
    source nodes (zero in-edges) keep their teleport rank and sink nodes
    (zero out-edges) simply contribute nothing — no rows are dropped.
    pr_{t+1}(v) = TELEPORT + DAMP * sum_{(u,v) in E} pr_t(u) // outdeg(u).
    """
    from ray.data.aggregate import Sum

    def init_pr(batch: pa.Table) -> pa.Table:
        node = batch.column(0).cast(pa.int64())
        return pa.table(
            {"node": node, "pr": pa.array(np.full(len(batch), PR_INIT, np.int64))}
        )

    # The edge table feeds every superstep's join: pin it once in the
    # object store so the DAG doesn't re-read + re-expand it K times.
    # Each superstep MATERIALIZES its rank vector (a Pregel barrier,
    # same as connected_components): chaining K lazy hash-shuffle joins
    # into one streaming DAG spins up K aggregator pools concurrently,
    # which at high CPU counts starves the cluster into a livelock
    # (observed at 32 CPUs: 200+ workers blocked in ray.get). One join
    # pool at a time is also the multi-node-safe shape — the barrier is
    # tiny (the rank vector is 2 int64 columns per node).
    edges_ds = edges_ds.materialize()
    if num_partitions is None:
        # materialized -> count() is block-metadata only, no execution
        num_partitions = _auto_join_partitions(edges_ds.count())

    def deg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": batch["src"]})
        return (
            t.group_by("src").aggregate([([], "count_all")])
            .rename_columns(["src", "deg"])
        )

    # out-degree WITHOUT an exchange: per-block Arrow group_by partials,
    # combined into one node-sized table (the rank vector itself is
    # node-sized, so this adds no new scale bound), broadcast once, and
    # gathered onto the pinned edge table by a vectorized searchsorted —
    # no groupby shuffle and no edge-sized hash join at setup.
    import ray as _ray

    deg_parts = edges_ds.map_batches(
        deg_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    deg_tbl = pa.concat_tables(
        [t for t in _ray.get(deg_parts.to_arrow_refs()) if t is not None and len(t)],
        promote_options="default",
    )
    deg_tbl = (
        deg_tbl.group_by("src").aggregate([("deg", "sum")])
        .rename_columns(["src", "deg"])
    )
    dkeys = deg_tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dvals = deg_tbl["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(dkeys)
    deg_ref = _ray.put((dkeys[order], dvals[order]))

    def attach_deg(batch: pa.Table) -> pa.Table:
        k, d = _ray.get(deg_ref)
        src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(k, src)  # every edge src has a degree >= 1
        return batch.append_column("deg", pa.array(d[pos], pa.int64()))

    edges_deg = edges_ds.map_batches(
        attach_deg, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def zero_seed(batch: pa.Table) -> pa.Table:
        node = batch.column(0).cast(pa.int64())
        return pa.table(
            {"dst": node, "c": pa.array(np.zeros(len(batch), np.int64))}
        )

    zeros = nodes_ds.map_batches(
        zero_seed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    pr = nodes_ds.map_batches(init_pr, batch_format="pyarrow", zero_copy_batch=True)

    def contrib_partial(batch: pa.Table) -> pa.Table:
        prv = batch["pr"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "dst": batch["dst"],
                "c": pa.array(prv // deg, pa.int64()),
            }
        )
        return (
            t.group_by("dst").aggregate([("c", "sum")]).rename_columns(["dst", "c"])
        )

    def update(batch: pa.Table) -> pa.Table:
        insum = batch["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": batch["dst"],
                "pr": pa.array(
                    PR_TELEPORT + (PR_DAMP_NUM * insum) // PR_DAMP_DEN, pa.int64()
                ),
            }
        )

    for _ in range(n_iter):
        joined = hash_equi_join(
            edges_deg, pr, on=("src",), right_on=("node",), num_partitions=num_partitions
        )
        partial = joined.map_batches(
            contrib_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        pr = (
            partial.union(zeros)
            .groupby("dst")
            .aggregate(Sum("c"))
            .map_batches(update, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
    return pr
