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


def _broadcast_graph_setup(edges_ds, nodes_ds):
    """Shared small-graph setup for the broadcast (SpMV-style) plans:
    gather the sorted node-id vector (node-sized by the broadcast
    contract), pin the edge blocks, and precompute per-block gather
    positions into the node vector ONCE — the per-superstep "join" is
    thereby already done for every iteration. Out-of-vocabulary edges
    are dropped (documented precondition). Returns
    (keys, pos_refs, deg) where deg is the per-node out-degree of the
    kept edges."""
    import ray as _ray

    node_tbls = [
        t
        for t in _ray.get(
            nodes_ds.map_batches(
                lambda b: pa.table({"node": b.column(0).cast(pa.int64())}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).to_arrow_refs()
        )
        if t is not None and len(t)
    ]
    # unique: duplicate node ids would split one node's state across two
    # dense slots (the shuffle plans treat duplicates as duplicate rows —
    # ill-defined either way; the broadcast plans define one row per id)
    keys = np.unique(
        pa.concat_tables(node_tbls)["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n = len(keys)
    keys_ref = _ray.put(keys)
    edge_refs = list(edges_ds.materialize().to_arrow_refs())

    @_ray.remote(num_returns=2)
    def _block_setup(tbl: pa.Table, keys: np.ndarray):
        if len(tbl) == 0 or "src" not in tbl.column_names:
            # zero-row blocks out of map_groups/filter carry a bare schema
            empty = np.empty(0, np.int64)
            return (empty, empty), np.zeros(len(keys), np.int64)
        src = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = np.searchsorted(keys, src)
        dp = np.searchsorted(keys, dst)
        ok = (
            (sp < len(keys))
            & (dp < len(keys))
            & (keys[np.minimum(sp, len(keys) - 1)] == src)
            & (keys[np.minimum(dp, len(keys) - 1)] == dst)
        )
        sp, dp = sp[ok], dp[ok]
        deg_part = np.bincount(sp, minlength=len(keys)).astype(np.int64)
        return (sp, dp), deg_part

    # edge-sized gather positions STAY in the object store (num_returns=2
    # refs); only the node-sized degree partials come to the driver
    pos_refs, deg_refs = [], []
    for r in edge_refs:
        pref, dref = _block_setup.remote(r, keys_ref)
        pos_refs.append(pref)
        deg_refs.append(dref)
    deg = np.zeros(n, np.int64)
    for dref in deg_refs:
        deg += _ray.get(dref)
    return keys, pos_refs, deg


_GROUP = 16  # blocks per SpMV task / vectors per tree-combine task


def components_broadcast(edges_ds, nodes_ds, max_iter: int = 25):
    """Broadcast min-label connected components: bit-exact to
    ``connected_components`` without a shuffle.

    Same plan shape as ``pagerank_broadcast`` (the label vector is the
    small side): per-block gather positions are precomputed once; each
    superstep scatters ``np.minimum.at`` in BOTH edge directions into a
    dense int64 label vector (min is order-independent, so the result
    is bit-identical to the shuffle plan), tree-mins the per-task
    vectors, and stops at the fixpoint. Scale bound: the dense node
    vector must fit worker + driver heaps — beyond
    ``BROADCAST_MAX_NODES`` the dispatcher uses the shuffle plan.
    Returns Dataset(node, lbl).
    """
    import ray as _ray

    keys, pos_refs, _deg = _broadcast_graph_setup(edges_ds, nodes_ds)
    n = len(keys)
    sentinel = np.iinfo(np.int64).max

    @_ray.remote
    def _min_scatter(lbl: np.ndarray, *pos_pairs):
        dense = np.full(len(lbl), sentinel, np.int64)
        for sp, dp in pos_pairs:
            np.minimum.at(dense, dp, lbl[sp])
            np.minimum.at(dense, sp, lbl[dp])
        return dense

    @_ray.remote
    def _vmin(*vecs):
        out = vecs[0].copy()
        for v in vecs[1:]:
            np.minimum(out, v, out=out)
        return out

    lbl = keys.copy()
    for _ in range(max_iter):
        lbl_ref = _ray.put(lbl)
        futs = [
            _min_scatter.remote(lbl_ref, *pos_refs[i : i + _GROUP])
            for i in range(0, len(pos_refs), _GROUP)
        ]
        while len(futs) > 1:
            futs = [_vmin.remote(*futs[i : i + _GROUP]) for i in range(0, len(futs), _GROUP)]
        msgs = _ray.get(futs[0]) if futs else np.full(n, sentinel, np.int64)
        new = np.minimum(lbl, msgs)
        if np.array_equal(new, lbl):
            break
        lbl = new

    import ray.data as _rd

    return _rd.from_arrow(
        pa.table({"node": pa.array(keys, pa.int64()), "lbl": pa.array(lbl, pa.int64())})
    )


def components_auto(
    edges_ds,
    nodes_ds,
    max_iter: int = 25,
    num_partitions: int | None = None,
    n_nodes: int | None = None,
    broadcast_max_nodes: int | None = None,
):
    """Auto-dispatching connected components: broadcast min-label plan
    while the label vector fits a worker heap, shuffle-join plan beyond
    it. Pass ``n_nodes`` (e.g. from parquet metadata) to avoid a count."""
    if broadcast_max_nodes is None:
        broadcast_max_nodes = BROADCAST_MAX_NODES
    if n_nodes is None:
        n_nodes = nodes_ds.count()
    if n_nodes <= broadcast_max_nodes:
        return components_broadcast(edges_ds, nodes_ds, max_iter=max_iter)
    return connected_components(
        edges_ds, nodes_ds, max_iter=max_iter, num_partitions=num_partitions
    )


def pagerank_broadcast(edges_ds, nodes_ds, n_iter: int = 5):
    """Broadcast-rank PageRank: bit-exact to ``pagerank_int`` without a
    single shuffle.

    The rank vector is the SMALL side of every superstep's join (one
    int64 per node vs many edges per node), so instead of K hash-shuffle
    joins the plan broadcasts the dense rank vector each superstep and
    runs a distributed SpMV over edge blocks pinned once in the object
    store:

      setup  : per edge block, precompute src/dst gather positions into
               the sorted node-id array ONCE (searchsorted; the block's
               join is thereby done for all supersteps).
      superstep: task per block group — c = pr[src_pos] // deg[src_pos],
               np.add.at(dense, dst_pos, c) — then a tree-sum of the
               dense int64 contribution vectors. Integer adds are
               order-independent, so the result is bit-identical to the
               shuffle plan and the DuckDB oracle.

    Raw ``@ray.remote`` tasks are used for the per-superstep SpMV
    because the Dataset API cannot express "re-map the same pinned
    blocks K times against a per-iteration broadcast value" without
    rebuilding a Dataset (plan + executor spin-up) per superstep.

    Scale bound (why this is not the only plan): the dense node vector
    (8 B x n_nodes) must fit every worker's heap and the driver —
    the same small-side contract as the zonal broadcast path. Beyond
    ``pagerank()``'s ``broadcast_max_nodes`` the auto dispatcher falls
    back to the shuffle-join plan, which has no such bound.

    Precondition (shared with the synthetic graphs and documented for
    the library API): edge endpoints are drawn from ``nodes_ds``;
    out-of-vocabulary edges are dropped (the shuffle plan's inner join
    drops unknown src the same way).
    """
    import ray as _ray

    keys, pos_refs, deg = _broadcast_graph_setup(edges_ds, nodes_ds)
    n = len(keys)
    deg_ref = _ray.put(deg)

    @_ray.remote
    def _spmv(pr: np.ndarray, deg: np.ndarray, *pos_pairs):
        dense = np.zeros(len(pr), np.int64)
        for sp, dp in pos_pairs:
            np.add.at(dense, dp, pr[sp] // deg[sp])
        return dense

    @_ray.remote
    def _vsum(*vecs):
        out = vecs[0].copy()
        for v in vecs[1:]:
            out += v
        return out

    pr = np.full(n, PR_INIT, np.int64)
    for _ in range(n_iter):
        pr_ref = _ray.put(pr)
        futs = [
            _spmv.remote(pr_ref, deg_ref, *pos_refs[i : i + _GROUP])
            for i in range(0, len(pos_refs), _GROUP)
        ]
        while len(futs) > 1:
            futs = [
                _vsum.remote(*futs[i : i + _GROUP])
                for i in range(0, len(futs), _GROUP)
            ]
        insum = _ray.get(futs[0]) if futs else np.zeros(n, np.int64)
        pr = PR_TELEPORT + (PR_DAMP_NUM * insum) // PR_DAMP_DEN

    import ray.data as _rd

    return _rd.from_arrow(
        pa.table({"node": pa.array(keys, pa.int64()), "pr": pa.array(pr, pa.int64())})
    )


# broadcast plan bound: 8 B x nodes must fit worker + driver heaps with
# slack (16M nodes = 128 MB dense vector); beyond it the shuffle-join
# plan has no small-side requirement.
BROADCAST_MAX_NODES = 16_000_000


def pagerank(
    edges_ds,
    nodes_ds,
    n_iter: int = 5,
    num_partitions: int | None = None,
    n_nodes: int | None = None,
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
):
    """Auto-dispatching PageRank: broadcast-SpMV plan while the rank
    vector fits a worker heap (``broadcast_max_nodes``), hash-shuffle
    join plan beyond it. Both are bit-exact integer PageRank; pass
    ``n_nodes`` (e.g. from parquet metadata) to avoid an extra count."""
    if n_nodes is None:
        n_nodes = nodes_ds.count()
    if n_nodes <= broadcast_max_nodes:
        return pagerank_broadcast(edges_ds, nodes_ds, n_iter=n_iter)
    return pagerank_int(edges_ds, nodes_ds, n_iter=n_iter, num_partitions=num_partitions)


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
