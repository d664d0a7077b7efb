"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the query matrix is broadcast once via
  ``ray.put``; each batch does one numpy matmul against it and emits its
  local top-k; a final small merge keeps the global top-k per query.
  Data-side rows stream — nothing but (query, candidate id, score) partials
  cross the wire.
- IVF variant: k-means-lite centroids (sampled, fixed seed), rows
  partitioned by nearest centroid; queries probe only the closest
  ``nprobe`` partitions. Scale path: turns the scan into a targeted read.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa


def _pool_cap() -> int:
    """Actor-pool size cap that leaves CPU headroom for the read/sort
    operators feeding the pool. The IVF plan chains TWO actor pools
    before a sort; at small clusters two pools each allowed cpus/2
    actors starve the upstream read and the plan stalls (observed hard
    at num_cpus=4). Cap each pool at a quarter of the cluster, min 1 —
    sized from the cluster, no absolute ceiling (a fixed cap would idle
    most of a multi-node fleet)."""
    from ._cluster import pool_cap

    return pool_cap(divisor=4)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class TopKKernel:
    """map_batches kernel: batch embeddings x broadcast queries -> local
    per-query top-k (query_id, id, cosine) rows."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.qmat = _unit_rows(qmat.astype(np.float64)).T  # (dim, nq)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        embs = _unit_rows(np.stack(batch[self.emb_col].to_pylist()).astype(np.float64))
        sims = embs @ self.qmat  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            top = np.argpartition(-col, k - 1)[:k]
            out_q.extend([int(qid)] * k)
            out_id.extend(ids[top].tolist())
            out_sim.extend(col[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def knn_embeddings(
    emb_ds,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=None,
):
    """Global cosine top-k per query. ``queries`` = (query_ids, query_matrix).
    Returns Dataset (query_id, neighbor_id, cosine, rank) with rank 1..k by
    descending cosine (ties broken by neighbor_id ascending)."""
    import ray
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()

    queries_ref = ray.put(queries)
    partials = emb_ds.map_batches(
        TopKKernel,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, k=k, id_col=id_col, emb_col=emb_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        sims = group["cosine"].to_numpy(zero_copy_only=False)
        ids = group["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "neighbor_id": pa.array(ids[order], pa.int64()),
                "cosine": pa.array(sims[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------------- IVF


def train_centroids(emb_ds, n_centroids: int, emb_col: str = "embedding",
                    sample_rows: int = 2048, iters: int = 8, seed: int = 5):
    """k-means-lite on a driver-side sample (small, bounded); returns the
    (n_centroids, dim) float64 centroid matrix."""
    sample = emb_ds.limit(sample_rows).to_pandas()
    x = _unit_rows(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_assign(emb_ds, centroids: np.ndarray, id_col: str = "vec_id",
               emb_col: str = "embedding"):
    """Append nearest-centroid partition id to each row (broadcast
    centroids; one matmul per batch)."""
    import ray

    cref = ray.put(centroids)

    class AssignKernel:
        def __init__(self):
            self.cents = ray.get(cref).T

        def __call__(self, batch: pa.Table) -> pa.Table:
            embs = _unit_rows(np.stack(batch[emb_col].to_pylist()).astype(np.float64))
            part = np.argmax(embs @ self.cents, axis=1)
            return batch.append_column("ivf_list", pa.array(part.astype(np.int64)))

    return emb_ds.map_batches(
        AssignKernel,
        batch_format="pyarrow",
        concurrency=(1, _pool_cap()),
        zero_copy_batch=True,
    )


def ivf_write_partitioned(
    emb_ds,
    centroids: np.ndarray,
    out_dir: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Materialize the corpus PARTITIONED BY IVF list:
    ``out_dir/ivf_list=<k>/*.parquet``.

    This is the 100-TB-scale shape of IVF: assignment happens once at
    ingest and queries become a TARGETED READ of their ``nprobe``
    partitions — storage-level pruning instead of the scan-everything-
    and-mask of the in-memory variant (round-1 review finding). The
    partition directory is also the resumable unit (one list = one
    directory, re-writable independently)."""
    assigned = ivf_assign(emb_ds, centroids, id_col, emb_col)
    assigned.write_parquet(out_dir, partition_cols=["ivf_list"])


def knn_ivf_from_store(
    store_dir: str,
    queries,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Approximate top-k over an ``ivf_write_partitioned`` store: only the
    union of the queries' probed partitions is READ at all; per-query
    probe routing then narrows inside the batch as usual."""
    import glob

    import ray.data

    qids, qmat = queries
    qunit = _unit_rows(qmat.astype(np.float64))
    probes = np.argsort(-(qunit @ centroids.T), axis=1)[:, :nprobe]
    needed = sorted({int(p) for row in probes for p in row})
    parts = []
    for p in needed:
        files = sorted(glob.glob(f"{store_dir}/ivf_list={p}/*.parquet"))
        if not files:
            continue
        # hive layout: the partition value lives in the directory name,
        # not the files — re-attach it as a constant column
        d = ray.data.read_parquet(files, columns=[id_col, emb_col])

        def tag(batch: pa.Table, _p: int = p) -> pa.Table:
            return batch.append_column(
                "ivf_list", pa.array(np.full(len(batch), _p, dtype=np.int64))
            )

        parts.append(d.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True))
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    return _probe_topk(ds, qids, qunit, probes, k, id_col, emb_col)


def knn_ivf(emb_ds, queries, centroids: np.ndarray, k: int = 10, nprobe: int = 4,
            id_col: str = "vec_id", emb_col: str = "embedding"):
    """Approximate top-k: search only rows whose IVF list is among each
    query's ``nprobe`` closest centroids (in-memory assignment; see
    ivf_write_partitioned/knn_ivf_from_store for the storage-pruning
    variant)."""
    qids, qmat = queries
    qunit = _unit_rows(qmat.astype(np.float64))
    probes = np.argsort(-(qunit @ centroids.T), axis=1)[:, :nprobe]
    assigned = ivf_assign(emb_ds, centroids, id_col, emb_col)
    return _probe_topk(assigned, qids, qunit, probes, k, id_col, emb_col)


def _probe_topk(assigned_ds, qids, qunit, probes, k, id_col, emb_col):
    """(rows with ivf_list) x per-query probe lists -> global top-k."""
    probe_sets = {int(q): set(int(p) for p in probes[i]) for i, q in enumerate(qids)}

    import ray

    pref = ray.put((qids, qunit, probe_sets))

    class ProbeKernel:
        def __init__(self):
            self.qids, self.qunit, self.probe_sets = ray.get(pref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
            embs = _unit_rows(np.stack(batch[emb_col].to_pylist()).astype(np.float64))
            out_q, out_id, out_sim = [], [], []
            for i, qid in enumerate(self.qids):
                mask = np.isin(lists, list(self.probe_sets[int(qid)]))
                if not mask.any():
                    continue
                col = embs[mask] @ self.qunit[i]
                sel_ids = ids[mask]
                kk = min(self.k, len(sel_ids))
                top = np.argpartition(-col, kk - 1)[:kk]
                out_q.extend([int(qid)] * kk)
                out_id.extend(sel_ids[top].tolist())
                out_sim.extend(col[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_id, pa.int64()),
                    "cosine": pa.array(out_sim, pa.float64()),
                }
            )

    partials = assigned_ds.map_batches(
        ProbeKernel,
        batch_format="pyarrow",
        concurrency=(1, _pool_cap()),
        zero_copy_batch=True,
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        sims = group["cosine"].to_numpy(zero_copy_only=False)
        ids_ = group["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_, -sims))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "neighbor_id": pa.array(ids_[order], pa.int64()),
                "cosine": pa.array(sims[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------- distributed k-means

KMEANS_SCALE = 1_000_000  # micro-fixed-point (the pagerank/unigram-LM trick)


def _micro_block(batch: pa.Table, emb_col: str) -> np.ndarray:
    x = np.stack(batch[emb_col].to_pylist()).astype(np.float64)
    xm = np.round(x * KMEANS_SCALE).astype(np.int64)
    if xm.size:
        # int64 headroom for the distance scores: |c_sq - 2 x.c| is at
        # most 3*d*max^2, so cap max|micro value| at sqrt(INT64_MAX/(4d))
        # — beyond it assignments would wrap SILENTLY. Feature vectors
        # larger than this bound (~|v| > 268 at d=64) must be scaled by
        # the caller.
        lim = int(np.sqrt(np.iinfo(np.int64).max / (4 * xm.shape[1])))
        m = int(np.abs(xm).max())
        if m > lim:
            raise ValueError(
                f"kmeans fixed-point range exceeded: max |value*1e6| = {m} "
                f"> {lim} for dim {xm.shape[1]}; rescale the embeddings"
            )
    return xm


def kmeans_train_int(
    emb_ds,
    k: int,
    n_iter: int = 10,
    emb_col: str = "embedding",
):
    """Distributed Lloyd's k-means over ALL rows (unlike the
    driver-sample ``train_centroids`` coarse quantizer), in int64
    micro-fixed-point so every sum is order-independent and the result
    is BIT-IDENTICAL to a sequential reference — no float drift across
    shuffle/reduce orders.

    Plan shape (the broadcast-iterate pattern shared with
    pagerank_broadcast and bpe_train): embeddings pinned once as block
    refs; per iteration ONE task wave — each task assigns its blocks to
    the broadcast centroids (squared-euclidean argmin, smallest cluster
    id wins ties) and emits dense (k x d sums, k counts) int64 partials
    — then a tree-sum and the O(k*d) driver update
    (``floor_divide(sums, counts)``, empty clusters keep their
    centroid). Init = first k rows in dataset order (deterministic).

    Scale bounds, stated: the (k, d) centroid matrix must fit every
    worker and the driver (k*d*8 bytes — 1M x 64 = 512 MB is the
    practical ceiling); blocks stream from the object store; nothing
    row-sized ever lands on the driver.
    """
    import ray as _ray

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    first = pa.Table.from_pandas(emb_ds.limit(k).to_pandas()[[emb_col]])
    cents = _micro_block(first, emb_col)
    if len(cents) < k:
        raise ValueError(f"need at least k={k} rows, got {len(cents)}")
    refs = list(emb_ds.materialize().to_arrow_refs())

    @_ray.remote
    def _assign_partial(cents: np.ndarray, emb_col: str, *tables: pa.Table):
        kk, d = cents.shape
        sums = np.zeros((kk, d), np.int64)
        counts = np.zeros(kk, np.int64)
        c_sq = np.sum(cents * cents, axis=1)  # (k,)
        for t in tables:
            if len(t) == 0:
                continue
            x = _micro_block(t, emb_col)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; drop the x term
            # (constant per row): argmin of c_sq - 2 x@c.T, all int64
            scores = c_sq[None, :] - 2 * (x @ cents.T)
            assign = np.argmin(scores, axis=1)  # ties -> smallest id
            np.add.at(sums, assign, x)
            counts += np.bincount(assign, minlength=kk)
        return sums, counts

    @_ray.remote
    def _sum_partials(*parts):
        sums = parts[0][0].copy()
        counts = parts[0][1].copy()
        for s, c in parts[1:]:
            sums += s
            counts += c
        return sums, counts

    group = 16
    for _ in range(n_iter):
        cref = _ray.put(cents)
        futs = [
            _assign_partial.remote(cref, emb_col, *refs[i : i + group])
            for i in range(0, len(refs), group)
        ]
        while len(futs) > 1:
            futs = [
                _sum_partials.remote(*futs[i : i + group])
                for i in range(0, len(futs), group)
            ]
        sums, counts = _ray.get(futs[0])
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = np.floor_divide(sums[nz], counts[nz][:, None])
    return cents, counts


def kmeans_clusters(emb_ds, k: int, n_iter: int = 10, emb_col: str = "embedding"):
    """Train + summarize: one row per cluster
    (cluster_id, n_members, centroid:list<int64> micro-units)."""
    cents, counts = kmeans_train_int(emb_ds, k, n_iter=n_iter, emb_col=emb_col)
    return pa.table(
        {
            "cluster_id": pa.array(np.arange(len(cents)), pa.int64()),
            "n_members": pa.array(counts, pa.int64()),
            "centroid": pa.array([c.tolist() for c in cents], pa.list_(pa.int64())),
        }
    )
