"""Hash-shuffle join, inverted index / TF-IDF and PageRank tests."""

import numpy as np
import pyarrow as pa
import pytest


def test_hash_equi_join_inner(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.joins import hash_equi_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 3, 5], pa.int64()), "a": pa.array(list("abcde"))})
    )
    right = ray.data.from_arrow(
        pa.table({"kk": pa.array([3, 3, 2, 9], pa.int64()), "b": pa.array(list("wxyz"))})
    )
    out = hash_equi_join(left, right, on=("k",), right_on=("kk",), num_partitions=2)
    rows = sorted(
        (r["k"], r["a"], r["b"]) for r in out.take_all()
    )
    # k=2 matches once; each of the two k=3 left rows matches both right k=3 rows
    assert rows == [
        (2, "b", "y"),
        (3, "c", "w"),
        (3, "c", "x"),
        (3, "d", "w"),
        (3, "d", "x"),
    ]


@pytest.mark.parametrize("threshold", [0, 1 << 30])
def test_join_auto_paths_agree(ray_session, threshold):
    import ray.data

    from python_rasterstats_ray.stages.joins import join_auto

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 3, 5], pa.int64()), "a": pa.array(list("abcde"))})
    )
    right = ray.data.from_arrow(
        pa.table({"kk": pa.array([3, 3, 2, 9], pa.int64()), "b": pa.array(list("wxyz"))})
    )
    # threshold=0 forces the shuffle plan, 1GB the broadcast plan
    out = join_auto(
        left, right, on=("k",), right_on=("kk",),
        broadcast_threshold_bytes=threshold, num_partitions=2, concurrency=(1, 2),
    )
    rows = sorted((r["k"], r["a"], r["b"]) for r in out.take_all())
    assert rows == [(2, "b", "y"), (3, "c", "w"), (3, "c", "x"), (3, "d", "w"), (3, "d", "x")]

    anti = join_auto(
        left, right, on=("k",), right_on=("kk",), join_type="left_anti",
        broadcast_threshold_bytes=threshold, num_partitions=2, concurrency=(1, 2),
    )
    assert sorted((r["k"], r["a"]) for r in anti.take_all()) == [(1, "a"), (5, "e")]


def test_join_auto_broadcast_empty_right_schema(ray_session):
    """Broadcast left-outer join against a ZERO-row right side must still
    emit the right side's null-filled columns — same schema as the
    non-empty broadcast and hash-shuffle plans."""
    import ray.data

    from python_rasterstats_ray.stages.joins import join_auto

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "a": pa.array(["p", "q"])})
    )
    rt = pa.table({"kk": pa.array([], pa.int64()), "b": pa.array([], pa.string())})
    # auto-captured schema: an empty (zero-row) Arrow-backed right side
    out = join_auto(
        left, ray.data.from_arrow(rt), on=("k",), right_on=("kk",),
        join_type="left_outer", broadcast_threshold_bytes=1 << 30,
        concurrency=(1, 2),
    ).to_pandas()
    assert sorted(out.columns) == ["a", "b", "k"]
    assert len(out) == 2 and out["b"].isna().all()

    # Ray loses the schema of a fully row-lambda-filtered Dataset —
    # the explicit right_schema override covers that degenerate case
    gone = ray.data.from_arrow(rt).filter(lambda r: False)
    out2 = join_auto(
        left, gone, on=("k",), right_on=("kk",), join_type="left_outer",
        broadcast_threshold_bytes=1 << 30, concurrency=(1, 2),
        right_schema=rt.schema,
    ).to_pandas()
    assert sorted(out2.columns) == ["a", "b", "k"]
    assert len(out2) == 2 and out2["b"].isna().all()


def test_partitioned_knn_matches_inmemory(ray_session, tmp_path):
    """Disk-partitioned point store must reproduce the in-memory
    GridIndex kNN exactly — including far-outside queries and boundary
    ties handled by the strict ring/bound rules."""
    import ray.data

    from python_rasterstats_ray.stages.knn_points import (
        knn_points,
        knn_points_from_store,
    )
    from python_rasterstats_ray.state.partitioned_points import (
        points_write_partitioned,
    )

    rng = np.random.RandomState(7)
    n = 400
    xs = rng.uniform(-100, 100, n)
    ys = rng.uniform(-50, 50, n)
    ids = np.arange(n, dtype=np.int64)
    pts = pa.table(
        {"pt_id": pa.array(ids), "x": pa.array(xs), "y": pa.array(ys)}
    )
    store = str(tmp_path / "store")
    points_write_partitioned(ray.data.from_arrow(pts), 20.0, store)

    # queries: a sample of the points + grid-edge points + far outside
    qx = np.r_[xs[:40], [0.0, 20.0, -40.0], [500.0, -500.0]]
    qy = np.r_[ys[:40], [0.0, 0.0, 20.0], [500.0, -500.0]]
    qid = np.arange(len(qx), dtype=np.int64)
    queries = pa.table({"pt_id": pa.array(qid), "x": pa.array(qx), "y": pa.array(qy)})

    a = (
        knn_points(ray.data.from_arrow(queries), xs, ys, ids, k=7, concurrency=(1, 2))
        .to_pandas()
        .sort_values(["query_id", "knn_rank"])
        .reset_index(drop=True)
    )
    b = (
        knn_points_from_store(
            ray.data.from_arrow(queries), store, block=20.0, k=7, concurrency=(1, 2)
        )
        .to_pandas()
        .sort_values(["query_id", "knn_rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_bucketed_join_matches_local_join(ray_session, tmp_path):
    import ray.data

    from python_rasterstats_ray.stages.bucketed import (
        bucket_of,
        bucketed_join,
        write_bucketed,
    )

    rng = np.random.RandomState(11)
    a = pa.table(
        {
            "k": pa.array(rng.randint(0, 50, 200), pa.int64()),
            "x": pa.array(rng.randint(0, 9, 200), pa.int64()),
        }
    )
    b = pa.table(
        {
            "kk": pa.array(rng.randint(0, 50, 300), pa.int64()),
            "y": pa.array(rng.randint(0, 9, 300), pa.int64()),
        }
    )
    pa_dir = write_bucketed(ray.data.from_arrow(a), "k", 4, str(tmp_path / "a"))
    pb_dir = write_bucketed(ray.data.from_arrow(b), "kk", 4, str(tmp_path / "b"))

    # same hash on both sides => matching keys land in the same bucket
    assert (bucket_of(np.arange(50), 4) == bucket_of(np.arange(50), 4)).all()

    out = bucketed_join(pa_dir, pb_dir, "k", "kk", 4, concurrency=(1, 2)).to_pandas()
    expect = a.join(b, keys=["k"], right_keys=["kk"], join_type="inner").to_pandas()
    key = ["k", "x", "y"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = expect[key].sort_values(key).reset_index(drop=True)
    assert got.equals(exp)


@pytest.mark.parametrize(
    "join_type", ["left outer", "left anti", "full outer", "left semi"]
)
def test_bucketed_join_one_sided_buckets(ray_session, tmp_path, join_type):
    """Buckets present on only ONE side must still honor outer/anti
    semantics: a tiny right side leaves most bucket dirs missing, and a
    left-preserving join must keep the left rows there (previously those
    buckets were skipped entirely)."""
    import ray.data

    from python_rasterstats_ray.stages.bucketed import bucketed_join, write_bucketed

    rng = np.random.RandomState(7)
    a = pa.table(
        {
            "k": pa.array(rng.randint(0, 50, 200), pa.int64()),
            "x": pa.array(rng.randint(0, 9, 200), pa.int64()),
        }
    )
    # right side has a single key => only one bucket dir exists on disk
    b = pa.table(
        {
            "kk": pa.array([7, 7, 9], pa.int64()),
            "y": pa.array([1, 2, 3], pa.int64()),
        }
    )
    pa_dir = write_bucketed(ray.data.from_arrow(a), "k", 8, str(tmp_path / "a"))
    pb_dir = write_bucketed(ray.data.from_arrow(b), "kk", 8, str(tmp_path / "b"))

    out = bucketed_join(
        pa_dir, pb_dir, "k", "kk", 8, join_type=join_type, concurrency=(1, 2)
    ).to_pandas()
    expect = a.join(b, keys=["k"], right_keys=["kk"], join_type=join_type).to_pandas()
    cols = sorted(expect.columns)
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = expect[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp), f"{join_type}: {len(got)} vs {len(exp)} rows"


def _naive_pagerank(n, n_iter):
    from python_rasterstats_ray.stages.graph import (
        EDGE_A,
        EDGE_B,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_INIT,
        PR_TELEPORT,
    )

    edges = []
    for d in range(n):
        for k in range(1 + d % 4):
            edges.append((d, (EDGE_A[k] * d + EDGE_B[k]) % n))
    pr = {d: PR_INIT for d in range(n)}
    for _ in range(n_iter):
        acc = {d: 0 for d in range(n)}
        for s, t in edges:
            acc[t] += pr[s] // (1 + s % 4)
        pr = {d: PR_TELEPORT + (PR_DAMP_NUM * acc[d]) // PR_DAMP_DEN for d in range(n)}
    return pr


def test_pagerank_matches_naive(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.graph import pagerank_int, synth_edges

    n = 101
    nodes = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    edges = synth_edges(nodes, n)
    out = {r["node"]: r["pr"] for r in pagerank_int(edges, nodes, n_iter=3,
                                                    num_partitions=2).take_all()}
    assert out == _naive_pagerank(n, 3)


def test_pagerank_sink_source_isolated(ray_session):
    """General graphs: a source (no in-edges) keeps its teleport rank, a
    sink (no out-edges) contributes nothing, an isolated node still gets
    a rank row — none of them may drop out of the iterative joins."""
    import ray.data

    from python_rasterstats_ray.stages.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_INIT,
        PR_TELEPORT,
        pagerank_int,
    )

    # 0 -> 1, 0 -> 2, 1 -> 2 ; node 0 source, node 2 sink, node 3 isolated
    edge_list = [(0, 1), (0, 2), (1, 2)]
    n = 4
    nodes = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edge_list], pa.int64()),
                "dst": pa.array([e[1] for e in edge_list], pa.int64()),
            }
        )
    )
    n_iter = 3
    out = {
        r["node"]: r["pr"]
        for r in pagerank_int(edges, nodes, n_iter=n_iter, num_partitions=2).take_all()
    }

    deg = {0: 2, 1: 1, 2: 0, 3: 0}
    pr = {d: PR_INIT for d in range(n)}
    for _ in range(n_iter):
        acc = {d: 0 for d in range(n)}
        for s, t in edge_list:
            acc[t] += pr[s] // deg[s]
        pr = {d: PR_TELEPORT + (PR_DAMP_NUM * acc[d]) // PR_DAMP_DEN for d in range(n)}
    assert out == pr


def test_pagerank_broadcast_matches_naive_and_shuffle(ray_session):
    """The broadcast-SpMV plan must be bit-identical to both the naive
    reference and the shuffle-join plan (integer adds are
    order-independent, so 'close' is not good enough)."""
    import ray.data

    from python_rasterstats_ray.stages.graph import (
        pagerank,
        pagerank_broadcast,
        pagerank_int,
        synth_edges,
    )

    n = 101
    nodes = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    edges = synth_edges(nodes, n)
    bcast = {r["node"]: r["pr"] for r in pagerank_broadcast(edges, nodes, n_iter=3).take_all()}
    assert bcast == _naive_pagerank(n, 3)
    edges2 = synth_edges(nodes, n)
    shuf = {r["node"]: r["pr"] for r in pagerank_int(edges2, nodes, n_iter=3,
                                                     num_partitions=2).take_all()}
    assert bcast == shuf
    # auto dispatch picks broadcast below the bound, shuffle above it
    edges3 = synth_edges(nodes, n)
    auto = {r["node"]: r["pr"] for r in pagerank(edges3, nodes, n_iter=3,
                                                 n_nodes=n).take_all()}
    assert auto == bcast
    edges4 = synth_edges(nodes, n)
    forced = {r["node"]: r["pr"] for r in pagerank(edges4, nodes, n_iter=3, n_nodes=n,
                                                   broadcast_max_nodes=10).take_all()}
    assert forced == bcast


def test_pagerank_broadcast_sink_source_isolated(ray_session):
    """Broadcast plan on a graph with a source, a sink and an isolated
    node — same general-graph guarantees as the shuffle plan."""
    import ray.data

    from python_rasterstats_ray.stages.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_INIT,
        PR_TELEPORT,
        pagerank_broadcast,
    )

    edge_list = [(0, 1), (0, 2), (1, 2)]
    n = 4
    nodes = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edge_list], pa.int64()),
                "dst": pa.array([e[1] for e in edge_list], pa.int64()),
            }
        )
    )
    n_iter = 3
    out = {
        r["node"]: r["pr"]
        for r in pagerank_broadcast(edges, nodes, n_iter=n_iter).take_all()
    }
    deg = {0: 2, 1: 1, 2: 0, 3: 0}
    pr = {d: PR_INIT for d in range(n)}
    for _ in range(n_iter):
        acc = {d: 0 for d in range(n)}
        for s, t in edge_list:
            acc[t] += pr[s] // deg[s]
        pr = {d: PR_TELEPORT + (PR_DAMP_NUM * acc[d]) // PR_DAMP_DEN for d in range(n)}
    assert out == pr


def test_pagerank_broadcast_many_blocks(ray_session):
    """Force enough edge blocks that the SpMV fans out to multiple tasks
    and the dense-vector tree-sum actually runs (>_GROUP leaf blocks)."""
    import ray.data

    from python_rasterstats_ray.stages.graph import pagerank_broadcast, synth_edges

    n = 300
    nodes = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    edges = synth_edges(nodes, n).repartition(40)
    out = {r["node"]: r["pr"] for r in pagerank_broadcast(edges, nodes, n_iter=3).take_all()}
    assert out == _naive_pagerank(n, 3)


def test_pagerank_every_node_has_inedges():
    # map k=0 is a bijection mod n (gcd(EDGE_A[0], n)=1 for our corpus
    # sizes) so no rank row ever drops out of the iterative joins
    from math import gcd

    from python_rasterstats_ray.stages.graph import EDGE_A

    for n in (101, 500, 5000, 50000):
        assert gcd(EDGE_A[0], n) == 1


def test_connected_components_chain_and_bridge(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.graph import connected_components

    # two chains 0-1-2-3 and 10-11-12, bridged 3-10; singleton 20
    edges = pa.table(
        {
            "src": pa.array([0, 1, 2, 10, 11, 3], pa.int64()),
            "dst": pa.array([1, 2, 3, 11, 12, 10], pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array([0, 1, 2, 3, 10, 11, 12, 20], pa.int64())})
    out = connected_components(
        ray.data.from_arrow(edges), ray.data.from_arrow(nodes), num_partitions=2
    )
    got = {r["node"]: r["lbl"] for r in out.take_all()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 0, 11: 0, 12: 0, 20: 20}


def test_components_broadcast_matches_shuffle(ray_session):
    """Broadcast min-label plan bit-identical to the shuffle plan on a
    chain+bridge graph with a singleton, plus auto dispatch both ways."""
    import ray.data

    from python_rasterstats_ray.stages.graph import (
        components_auto,
        components_broadcast,
        connected_components,
    )

    edges = pa.table(
        {
            "src": pa.array([0, 1, 2, 10, 11, 3], pa.int64()),
            "dst": pa.array([1, 2, 3, 11, 12, 10], pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array([0, 1, 2, 3, 10, 11, 12, 20], pa.int64())})
    want = {0: 0, 1: 0, 2: 0, 3: 0, 10: 0, 11: 0, 12: 0, 20: 20}
    bc = components_broadcast(ray.data.from_arrow(edges), ray.data.from_arrow(nodes))
    assert {r["node"]: r["lbl"] for r in bc.take_all()} == want
    sh = connected_components(
        ray.data.from_arrow(edges), ray.data.from_arrow(nodes), num_partitions=2
    )
    assert {r["node"]: r["lbl"] for r in sh.take_all()} == want
    auto = components_auto(ray.data.from_arrow(edges), ray.data.from_arrow(nodes))
    assert {r["node"]: r["lbl"] for r in auto.take_all()} == want
    forced = components_auto(
        ray.data.from_arrow(edges),
        ray.data.from_arrow(nodes),
        num_partitions=2,
        broadcast_max_nodes=2,
    )
    assert {r["node"]: r["lbl"] for r in forced.take_all()} == want


def test_length_quantiles_vs_numpy(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from python_rasterstats_ray.pipelines.join_queries import (
        QUANTILE_PCTS,
        q_docs_length_quantiles,
    )

    rng = np.random.RandomState(3)
    lens = rng.randint(10, 200, size=1000)
    pq.write_table(
        pa.table({"n_chars": pa.array(lens, pa.int64())}), tmp_path / "documents.parquet"
    )
    out = {r["p"]: r["value"] for r in q_docs_length_quantiles(str(tmp_path)).to_pylist()}
    s = np.sort(lens)
    for p in QUANTILE_PCTS:
        rank = (p * len(s) + 99) // 100  # smallest v with cdf >= ceil(p*n/100)
        assert out[p] == s[rank - 1]


def test_inverted_index_partial_vs_naive():
    from python_rasterstats_ray.pipelines.join_queries import _index_partial

    batch = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": pa.array(
                ["Foo bar foo; baz42!", "bar-bar bar", "  foo?? "]
            ),
        }
    )
    out = _index_partial(batch)
    got = {
        r["term"]: (r["tf"], r["df"])
        for r in out.to_pylist()
    }
    assert got == {"foo": (3, 2), "bar": (4, 2), "baz42": (1, 1)}


def test_tfidf_rank_is_deterministic(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    from python_rasterstats_ray.pipelines.join_queries import q_docs_tfidf_top

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha alpha beta gamma",
                    "beta beta beta alpha",
                    "gamma delta",
                    "alpha beta gamma delta epsilon",
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    a = q_docs_tfidf_top(str(tmp_path)).to_pandas().sort_values(["doc_id", "rnk"])
    b = q_docs_tfidf_top(str(tmp_path)).to_pandas().sort_values(["doc_id", "rnk"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    top0 = a[(a.doc_id == 0) & (a.rnk == 1)].iloc[0]
    # doc0: tf(alpha)=2 and df(alpha)=3 -> 666666; beta 1/4, gamma 1/3
    assert top0["term"] == "alpha" and top0["score"] == 2 * 1_000_000 // 3


def test_q10_two_join_plan_completes_on_small_cluster(ray_session):
    """Regression guard for the small-cluster join livelock: a plan with
    TWO hash-shuffle joins (TPC-H Q10) must finish at the 4-CPU test
    session — with partitions > cpus the aggregator actors plus the
    downstream pool oversubscribed the slots and the plan never ran."""
    from python_rasterstats_ray.pipelines.join_queries import q_tpch_q10
    from python_rasterstats_ray.stages.joins import default_join_partitions

    assert default_join_partitions() <= 4  # session is 4 CPUs
    df = q_tpch_q10("/root/testdata/sf0.01").to_pandas()
    assert len(df) == 20
    assert (df["revenue"].to_numpy()[:-1] >= df["revenue"].to_numpy()[1:]).all()


def test_bbox_self_join_edges(ray_session):
    """PBSM bbox self-join: strict-interior semantics (touching edges are
    NOT overlaps), pairs overlapping across many cells reported exactly
    once (canonical-cell rule), layout-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.joins import bbox_self_join

    rects = [
        # (id, xmin, ymin, xmax, ymax)
        (0, 0, 0, 100, 100),
        (1, 100, 0, 200, 100),      # touches 0 at x=100: NOT an overlap
        (2, 50, 50, 150, 150),      # overlaps 0 and 1
        (3, 0, 0, 1000, 1000),      # spans many cells; overlaps 0,1,2,4
        (4, 900, 900, 1100, 1100),  # crosses the grid far from others
        (5, 2000, 2000, 2001, 2001),  # 1x1, alone
        (6, 255, 255, 257, 257),    # straddles a cell corner; inside 3
    ]
    cols = list(zip(*rects))
    tbl = pa.table(
        {
            k: pa.array(np.asarray(v, np.int64), pa.int64())
            for k, v in zip(["id", "xmin", "ymin", "xmax", "ymax"], cols)
        }
    )

    # exact reference
    ref = set()
    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            _, ax0, ay0, ax1, ay1 = rects[i]
            _, bx0, by0, bx1, by1 = rects[j]
            if ax0 < bx1 and bx0 < ax1 and ay0 < by1 and by0 < ay1:
                ref.add((rects[i][0], rects[j][0]))

    assert (0, 1) not in ref and (0, 2) in ref and (3, 6) in ref
    for nblocks in (1, 3):
        out = bbox_self_join(
            ray.data.from_arrow(tbl).repartition(nblocks), cell_size=256
        ).to_pandas()
        got = list(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
        assert sorted(got) == sorted(ref)
        assert len(got) == len(set(got))  # each pair exactly once


def test_bbox_two_table_join(ray_session):
    """A x B bbox join == brute-force reference, layout-invariant; left
    and right roles are not symmetric in the output columns."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.joins import bbox_join

    rng = np.random.default_rng(6)

    def mk(n, seed_shift):
        x0 = rng.integers(0, 1000, n)
        y0 = rng.integers(0, 1000, n)
        w = rng.integers(1, 300, n)
        h = rng.integers(1, 300, n)
        return pa.table(
            {
                "id": pa.array(np.arange(n) + seed_shift, pa.int64()),
                "xmin": pa.array(x0, pa.int64()),
                "ymin": pa.array(y0, pa.int64()),
                "xmax": pa.array(x0 + w, pa.int64()),
                "ymax": pa.array(y0 + h, pa.int64()),
            }
        )

    L, R = mk(40, 0), mk(60, 1000)
    ref = set()
    for i in range(len(L)):
        for j in range(len(R)):
            if (
                L["xmin"][i].as_py() < R["xmax"][j].as_py()
                and R["xmin"][j].as_py() < L["xmax"][i].as_py()
                and L["ymin"][i].as_py() < R["ymax"][j].as_py()
                and R["ymin"][j].as_py() < L["ymax"][i].as_py()
            ):
                ref.add((L["id"][i].as_py(), R["id"][j].as_py()))
    assert len(ref) > 50  # dense enough to be a real test

    for nl, nr in ((1, 1), (4, 3)):
        out = bbox_join(
            ray.data.from_arrow(L).repartition(nl),
            ray.data.from_arrow(R).repartition(nr),
            cell_size=256,
        ).to_pandas()
        got = list(zip(out["left_id"].astype(int), out["right_id"].astype(int)))
        assert sorted(got) == sorted(ref)
        assert len(got) == len(set(got))


def test_bbox_join_area_clipped_sums(ray_session):
    """Per-cell CLIPPED intersection areas sum to the exact total overlap
    area (disjoint across cells — no dedup pass), including intersections
    spanning many cells."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.joins import bbox_join_area

    def tbl(rows):
        cols = list(zip(*rows))
        return pa.table(
            {
                k: pa.array(np.asarray(v, np.int64), pa.int64())
                for k, v in zip(["id", "xmin", "ymin", "xmax", "ymax"], cols)
            }
        )

    left = tbl([
        (0, 0, 0, 1000, 1000),    # big: intersections span many 256-cells
        (1, 10, 10, 20, 20),      # small, inside right 100
        (2, 5000, 5000, 5100, 5100),  # no overlap
    ])
    right = tbl([
        (100, 0, 0, 600, 600),
        (101, 500, 500, 1500, 1500),
        (102, 15, 15, 30, 30),
    ])

    # exact reference
    ref = {}
    for i in range(len(left)):
        tot = 0
        for j in range(len(right)):
            w = min(left["xmax"][i].as_py(), right["xmax"][j].as_py()) - max(
                left["xmin"][i].as_py(), right["xmin"][j].as_py()
            )
            h = min(left["ymax"][i].as_py(), right["ymax"][j].as_py()) - max(
                left["ymin"][i].as_py(), right["ymin"][j].as_py()
            )
            if w > 0 and h > 0:
                tot += w * h
        if tot:
            ref[left["id"][i].as_py()] = tot

    out = bbox_join_area(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right),
        cell_size=256,
    ).to_pandas()
    got = dict(zip(out["left_id"].astype(int), out["area"].astype(int)))
    assert got == ref
    assert 2 not in got  # no-overlap rect absent (join semantics)
