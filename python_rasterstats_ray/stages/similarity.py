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


def emb_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> column -> (n, d) ndarray via the flat values buffer
    (zero-copy from Arrow, then one cast) instead of np.stack over
    to_pylist(), which boxes every float through Python. Assumes the
    fixed-width no-null layout the embeddings tables use — same contract
    np.stack enforced (it would raise on ragged rows too)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if hasattr(col, "flatten"):
        flat = col.flatten()
    else:  # fixed_size_list
        flat = col.values
    return np.asarray(flat).astype(dtype, copy=False).reshape(n, -1)


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
        embs = _unit_rows(emb_matrix(batch[self.emb_col]))
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
            embs = _unit_rows(emb_matrix(batch[emb_col]))
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
            embs = _unit_rows(emb_matrix(batch[emb_col]))
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
    x = emb_matrix(batch[emb_col])
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


# --------------------------------------------- product quantization (PQ)
#
# The memory-scale path of the ANN family: brute force (knn_embeddings)
# scans full vectors, IVF (knn_ivf*) prunes WHICH vectors are scanned,
# PQ compresses WHAT is scanned — d float dims -> n_sub uint8 codes per
# vector (e.g. 64 floats = 512 B -> 8 B), so a 100-TB embedding corpus
# scans as ~1.5 TB of codes. Jegou et al., "Product Quantization for
# Nearest Neighbor Search" (TPAMI 2011). Everything is int64
# micro-fixed-point (the kmeans trick) so training, encoding and ADC
# scores are order-independent and BIT-IDENTICAL to the sequential
# reference in tests/test_training_ops.py regardless of block layout.


def pq_train_int(
    emb_ds,
    n_subspaces: int = 4,
    n_codes: int = 16,
    n_iter: int = 6,
    emb_col: str = "embedding",
):
    """Distributed PQ codebook training: an independent k-means per
    subspace, FUSED into one task wave per iteration (not n_subspaces
    passes over the corpus) — each task assigns every subspace of its
    pinned blocks against the broadcast (n_sub, n_codes, dsub) codebook
    tensor and emits dense int64 (sums, counts) partials; tree-sum; the
    O(n_sub*n_codes*dsub) driver update floor-divides.

    Init = subvectors of the first n_codes rows in dataset order
    (deterministic). Returns the int64 micro-unit codebook tensor.
    Scale bound, stated: the codebook tensor must fit every worker and
    the driver (n_sub*n_codes*dsub*8 bytes — tiny for any sane config);
    embedding dim must divide evenly by n_subspaces.
    """
    import ray as _ray

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if n_codes > 256:
        raise ValueError("n_codes must fit a uint8 code (<= 256)")
    first = pa.Table.from_pandas(emb_ds.limit(n_codes).to_pandas()[[emb_col]])
    x0 = _micro_block(first, emb_col)
    if len(x0) < n_codes:
        raise ValueError(f"need at least n_codes={n_codes} rows, got {len(x0)}")
    d = x0.shape[1]
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible by n_subspaces={n_subspaces}")
    dsub = d // n_subspaces
    # (n_sub, n_codes, dsub): subspace s trains on columns [s*dsub, (s+1)*dsub)
    books = np.stack(
        [x0[:, s * dsub : (s + 1) * dsub] for s in range(n_subspaces)]
    ).astype(np.int64)
    refs = list(emb_ds.materialize().to_arrow_refs())

    @_ray.remote
    def _assign_partial(books: np.ndarray, emb_col: str, *tables: pa.Table):
        ns, nc, dsub = books.shape
        sums = np.zeros((ns, nc, dsub), np.int64)
        counts = np.zeros((ns, nc), np.int64)
        b_sq = np.sum(books * books, axis=2)  # (ns, nc)
        for t in tables:
            if len(t) == 0:
                continue
            x = _micro_block(t, emb_col)
            for s in range(ns):
                xs = x[:, s * dsub : (s + 1) * dsub]
                scores = b_sq[s][None, :] - 2 * (xs @ books[s].T)
                assign = np.argmin(scores, axis=1)  # ties -> smallest code
                np.add.at(sums[s], assign, xs)
                counts[s] += np.bincount(assign, minlength=nc)
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
        bref = _ray.put(books)
        futs = [
            _assign_partial.remote(bref, emb_col, *refs[i : i + group])
            for i in range(0, len(refs), group)
        ]
        while len(futs) > 1:
            futs = [
                _sum_partials.remote(*futs[i : i + group])
                for i in range(0, len(futs), group)
            ]
        sums, counts = _ray.get(futs[0])
        books = books.copy()
        nz = counts > 0
        books[nz] = np.floor_divide(sums[nz], counts[nz][:, None])
    return books


class PQEncodeKernel:
    """map_batches kernel: embeddings batch -> (id, pq_code) rows, the
    broadcast codebook fetched once per actor. Assignment is the same
    int64 argmin as training (ties -> smallest code), so encode of the
    training set reproduces the final training assignment exactly."""

    def __init__(self, books_ref, id_col: str, emb_col: str):
        import ray

        self.books = ray.get(books_ref)  # (ns, nc, dsub) int64
        self.b_sq = np.sum(self.books * self.books, axis=2)
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, nc, dsub = self.books.shape
        x = _micro_block(batch, self.emb_col)
        n = len(batch)
        codes = np.zeros((n, ns), np.uint8)
        for s in range(ns):
            xs = x[:, s * dsub : (s + 1) * dsub]
            scores = self.b_sq[s][None, :] - 2 * (xs @ self.books[s].T)
            codes[:, s] = np.argmin(scores, axis=1).astype(np.uint8)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "pq_code": pa.array(codes.tolist(), pa.list_(pa.uint8())),
            }
        )


def pq_encode(emb_ds, books: np.ndarray, id_col: str = "vec_id",
              emb_col: str = "embedding", concurrency=None):
    """Encode every embedding to n_subspaces uint8 codes (the compressed
    corpus a 100-TB deployment persists instead of raw vectors)."""
    import ray

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    return emb_ds.map_batches(
        PQEncodeKernel,
        fn_constructor_kwargs=dict(
            books_ref=ray.put(books), id_col=id_col, emb_col=emb_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


class PQScanKernel:
    """Asymmetric-distance (ADC) scan: per actor, precompute the
    (nq, ns, nc) int64 lookup table ||q_sub - book[s,c]||^2 ONCE in
    __init__; each code batch is then a pure table-gather + row-sum —
    no float math, no full-vector reads. Emits local per-query top-k."""

    def __init__(self, books_ref, queries_ref, k: int, id_col: str):
        import ray

        self.books = ray.get(books_ref)
        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        ns, nc, dsub = self.books.shape
        qm = np.round(np.asarray(qmat, np.float64) * KMEANS_SCALE).astype(np.int64)
        if qm.shape[1] != ns * dsub:
            raise ValueError(f"query dim {qm.shape[1]} != codebook dim {ns * dsub}")
        nq = len(qm)
        lut = np.empty((nq, ns, nc), np.int64)
        for s in range(ns):
            diff = qm[:, None, s * dsub : (s + 1) * dsub] - self.books[s][None, :, :]
            lut[:, s, :] = np.sum(diff * diff, axis=2)
        self.lut = lut
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        ns = self.books.shape[0]
        n = len(batch)
        # fixed-length code lists: the flat values buffer reshapes
        # zero-copy (no per-row Python), hot path of the scan
        col = batch["pq_code"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
        if hasattr(col, "flatten"):
            codes = np.asarray(col.flatten()).astype(np.int64).reshape(n, ns)
        else:  # Ray tensor-extension array (e.g. via from_pandas)
            codes = np.stack(col.to_numpy(zero_copy_only=False)).astype(
                np.int64
            ).reshape(n, ns)
        k = min(self.k, n)
        sub = np.arange(ns)[None, :]
        out_q, out_id, out_d = [], [], []
        for j, qid in enumerate(self.qids):
            dist = self.lut[j][sub, codes].sum(axis=1)  # (n,) int64
            # smallest distance wins; ties -> smallest id (lexsort)
            top = np.lexsort((ids, dist))[:k]
            out_q.extend([int(qid)] * k)
            out_id.extend(ids[top].tolist())
            out_d.extend(dist[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_id, pa.int64()),
                "adc_dist": pa.array(out_d, pa.int64()),
            }
        )


def knn_pq(
    code_ds,
    queries: tuple[np.ndarray, np.ndarray],
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    concurrency=None,
):
    """Approximate top-k by PQ asymmetric distance over the code table.
    ``queries`` = (query_ids, float query matrix). Returns
    (query_id, neighbor_id, adc_dist, rank), rank 1..k by ascending
    distance, ties by neighbor_id — deterministic because every score is
    an int64. Per-block partial top-k keeps the merge groupby at
    O(#blocks * k) rows regardless of corpus size."""
    import ray

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    partials = code_ds.map_batches(
        PQScanKernel,
        fn_constructor_kwargs=dict(
            books_ref=ray.put(books), queries_ref=ray.put(queries),
            k=k, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        dist = group["adc_dist"].to_numpy(zero_copy_only=False)
        ids = group["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dist))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "neighbor_id": pa.array(ids[order], pa.int64()),
                "adc_dist": pa.array(dist[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------- IVF-PQ (IVFADC)
#
# The combined at-scale ANN shape (FAISS IVFADC; Jegou et al. 2011):
# IVF prunes WHICH partitions are read at all (storage-level, like
# knn_ivf_from_store), PQ compresses WHAT is stored and scanned (uint8
# codes, like knn_pq). Ingest = ONE pass (fused coarse-assign + encode)
# written partitioned by list; a query reads only its nprobe partitions'
# code files and runs the integer ADC scan restricted per query to its
# own probe set. All arithmetic is the same int64 fixed-point as the
# component operators, so the composition is bit-identical to the
# sequential reference in tests.


def ivfpq_write_partitioned(
    emb_ds,
    centroids: np.ndarray,
    books: np.ndarray,
    out_dir: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Fused ingest: per batch, cosine coarse-assign (broadcast
    centroids) AND PQ-encode (broadcast codebooks), then write
    (id, pq_code) rows partitioned ``out_dir/ivf_list=<k>/``. Raw
    vectors never hit the store — a 64-dim float corpus persists as
    n_sub bytes/vector plus the directory key."""
    import ray

    cref, bref = ray.put(centroids), ray.put(books)

    class FusedKernel:
        def __init__(self):
            self.cents = ray.get(cref).T
            self.books = ray.get(bref)
            self.b_sq = np.sum(self.books * self.books, axis=2)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ns, nc, dsub = self.books.shape
            embs = emb_matrix(batch[emb_col])
            part = np.argmax(_unit_rows(embs) @ self.cents, axis=1)
            x = _micro_block(batch, emb_col)
            codes = np.zeros((len(batch), ns), np.uint8)
            for s in range(ns):
                xs = x[:, s * dsub : (s + 1) * dsub]
                scores = self.b_sq[s][None, :] - 2 * (xs @ self.books[s].T)
                codes[:, s] = np.argmin(scores, axis=1).astype(np.uint8)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "pq_code": pa.array(codes.tolist(), pa.list_(pa.uint8())),
                    "ivf_list": pa.array(part.astype(np.int64), pa.int64()),
                }
            )

    from ._cluster import pool

    encoded = emb_ds.map_batches(
        FusedKernel, batch_format="pyarrow", concurrency=pool(), zero_copy_batch=True
    )
    encoded.write_parquet(out_dir, partition_cols=["ivf_list"])


class IVFPQScanKernel(PQScanKernel):
    """ADC scan restricted PER QUERY to its probed IVF lists: rows carry
    ``ivf_list``; query j only scores rows whose list is in probes[j]."""

    def __init__(self, books_ref, queries_ref, probes_ref, k: int, id_col: str):
        import ray

        super().__init__(books_ref, queries_ref, k, id_col)
        self.probes = [set(map(int, row)) for row in ray.get(probes_ref)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
        ns = self.books.shape[0]
        n = len(batch)
        col = batch["pq_code"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
        if hasattr(col, "flatten"):
            codes = np.asarray(col.flatten()).astype(np.int64).reshape(n, ns)
        else:
            codes = np.stack(col.to_numpy(zero_copy_only=False)).astype(
                np.int64
            ).reshape(n, ns)
        sub = np.arange(ns)[None, :]
        out_q, out_id, out_d = [], [], []
        for j, qid in enumerate(self.qids):
            probe_lists = np.fromiter(self.probes[j], dtype=np.int64)
            mask = np.isin(lists, probe_lists)
            if not mask.any():
                continue
            mids, mcodes = ids[mask], codes[mask]
            dist = self.lut[j][sub, mcodes].sum(axis=1)
            top = np.lexsort((mids, dist))[: min(self.k, len(mids))]
            out_q.extend([int(qid)] * len(top))
            out_id.extend(mids[top].tolist())
            out_d.extend(dist[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_id, pa.int64()),
                "adc_dist": pa.array(out_d, pa.int64()),
            }
        )


def knn_ivfpq_from_store(
    store_dir: str,
    queries: tuple[np.ndarray, np.ndarray],
    centroids: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    concurrency=None,
):
    """Approximate top-k over an ``ivfpq_write_partitioned`` store: read
    ONLY the union of the queries' probed partitions (code files — a few
    bytes per vector), integer ADC scan restricted per query, per-block
    partial top-k, one tiny merge groupby."""
    import glob

    import ray
    import ray.data

    qids, qmat = queries
    qunit = _unit_rows(np.asarray(qmat, np.float64))
    probes = np.argsort(-(qunit @ centroids.T), axis=1)[:, :nprobe]
    needed = sorted({int(p) for row in probes for p in row})
    parts = []
    for p in needed:
        files = sorted(glob.glob(f"{store_dir}/ivf_list={p}/*.parquet"))
        if not files:
            continue
        d = ray.data.read_parquet(files, columns=[id_col, "pq_code"])

        def tag(batch: pa.Table, _p: int = p) -> pa.Table:
            return batch.append_column(
                "ivf_list", pa.array(np.full(len(batch), _p, dtype=np.int64))
            )

        parts.append(d.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True))
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    partials = ds.map_batches(
        IVFPQScanKernel,
        fn_constructor_kwargs=dict(
            books_ref=ray.put(books),
            queries_ref=ray.put((qids, qmat)),
            probes_ref=ray.put(probes),
            k=k,
            id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        dist = group["adc_dist"].to_numpy(zero_copy_only=False)
        nids = group["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nids, dist))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "neighbor_id": pa.array(nids[order], pa.int64()),
                "adc_dist": pa.array(dist[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
