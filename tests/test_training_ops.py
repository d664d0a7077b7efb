"""Training-data operator tests: dedup, text analysis, similarity search,
point kNN, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_with_dups():
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "completely different content about ray data pipelines and arrow",
        "a third document with its own unique words and tokens here",
    ]
    texts, ids = [], []
    for i in range(60):
        t = base[i % 3] + f" filler {i % 5}"
        texts.append(t)
        ids.append(i)
    # exact duplicates: 60..69 duplicate ids 0..9's text
    for i in range(10):
        texts.append(texts[i])
        ids.append(60 + i)
    # near duplicate of doc 1 (one word changed)
    texts.append(texts[0].replace("again", "againn"))
    ids.append(70)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_exact_dedup(ray_session, docs_with_dups):
    import ray.data

    from python_rasterstats_ray.stages.dedup import exact_dedup_groups

    out = exact_dedup_groups(ray.data.from_arrow(docs_with_dups)).to_pandas()
    # 15 distinct texts (3 bases x 5 fillers) + 1 near-dup variant
    assert len(out) == 16
    assert out["dup_count"].sum() == 71
    # representative = min doc_id: dup of doc 0 keeps 0, not 60
    dups = out[out["dup_count"] > 1]
    assert (dups["rep_doc_id"] < 60).all()


def test_minhash_finds_near_dup(ray_session, docs_with_dups):
    import ray.data

    from python_rasterstats_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard

    pairs = minhash_lsh_pairs(
        ray.data.from_arrow(docs_with_dups)
    ).to_pandas()
    pair_set = set(zip(pairs["id_a"], pairs["id_b"]))
    # exact dup pair must collide in every band
    assert (0, 60) in pair_set
    # near-dup (one token changed) should collide in some band
    assert (0, 70) in pair_set or (70, 0) in pair_set
    # verification: jaccard of the near-dup is high, cross-base is low
    texts = docs_with_dups["text"].to_pylist()
    assert ngram_jaccard(texts[0], texts[70]) > 0.7
    assert ngram_jaccard(texts[0], texts[1]) < 0.3


def test_simhash_hamming(ray_session, docs_with_dups):
    import ray.data

    from python_rasterstats_ray.stages.dedup import SimHashKernel

    out = (
        ray.data.from_arrow(docs_with_dups)
        .map_batches(SimHashKernel, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .set_index("doc_id")
    )
    h = lambda a, b: bin(
        (int(out.loc[a, "simhash"]) & 0xFFFFFFFFFFFFFFFF)
        ^ (int(out.loc[b, "simhash"]) & 0xFFFFFFFFFFFFFFFF)
    ).count("1")
    assert h(0, 60) == 0  # identical docs -> identical simhash
    assert h(0, 70) <= 12  # near dup -> hamming-close
    assert h(0, 1) > h(0, 70)  # unrelated docs further apart


def test_embedding_neardup_planted(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 16))
    vecs[40] = vecs[7] + 0.001 * rng.standard_normal(16)  # planted near-dup
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    out = embedding_neardup_pairs(
        ray.data.from_arrow(tbl), threshold=0.99
    ).to_pandas()
    assert {(7, 40)} == set(zip(out["id_a"], out["id_b"]))


def test_knn_embeddings_matches_bruteforce(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.similarity import knn_embeddings

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 12))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    qids = np.array([3, 17], dtype=np.int64)
    out = (
        knn_embeddings(ray.data.from_arrow(tbl), (qids, vecs[qids]), k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qid in qids:
        sims = unit @ unit[qid]
        expect = np.lexsort((np.arange(200), -sims))[:5]
        got = out[out["query_id"] == qid]["neighbor_id"].to_numpy()
        assert list(got) == list(expect)
        assert got[0] == qid  # self is rank 1


def test_knn_ivf_recall(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.similarity import knn_embeddings, knn_ivf, train_centroids

    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((400, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids = np.array([0, 1, 2], dtype=np.int64)
    cents = train_centroids(ds, n_centroids=8)
    exact = knn_embeddings(ds, (qids, vecs[qids]), k=10).to_pandas()
    approx = knn_ivf(ds, (qids, vecs[qids]), cents, k=10, nprobe=4).to_pandas()
    # recall@10 of the IVF path vs brute force
    recalls = []
    for qid in qids:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / 10)
    assert np.mean(recalls) >= 0.6


def test_knn_points_grid_matches_bruteforce(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.knn_points import knn_points

    rng = np.random.default_rng(11)
    ref = rng.uniform(0, 100, size=(300, 2))
    ids = np.arange(300, dtype=np.int64)
    q = rng.uniform(0, 100, size=(40, 2))
    queries = pa.table(
        {
            "pt_id": pa.array(np.arange(40), pa.int64()),
            "x": pa.array(q[:, 0]),
            "y": pa.array(q[:, 1]),
        }
    )
    out = (
        knn_points(ray.data.from_arrow(queries), ref[:, 0], ref[:, 1], ids, k=3)
        .to_pandas()
        .sort_values(["query_id", "knn_rank"])
    )
    for qi in range(40):
        dx = ref[:, 0] - q[qi, 0]
        dy = ref[:, 1] - q[qi, 1]
        expect = np.lexsort((ids, dx * dx + dy * dy))[:3]
        got = out[out["query_id"] == qi]["neighbor_id"].to_numpy()
        assert list(got) == list(expect), qi


def test_text_stages(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.text import LangIdKernel, quality_batch, fingerprint_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "The quick brown fox, of course, jumps over the lazy dog!",
                    "Der Wanderer ging durch einen schoenen Wald und ich sah ihn",
                    "UPPER case SHOUTING text HERE",
                ]
            ),
        }
    )
    q = quality_batch(tbl).to_pandas()
    assert q.loc[0, "n_tokens"] == 11
    assert 0 < q.loc[0, "alpha_ratio"] < 1
    assert q.loc[2, "upper_ratio"] > q.loc[0, "upper_ratio"]

    ds = ray.data.from_arrow(tbl)
    lang = ds.map_batches(LangIdKernel, batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    assert lang.loc[lang["doc_id"] == 0, "lang_guess"].iloc[0] == "en"
    assert lang.loc[lang["doc_id"] == 1, "lang_guess"].iloc[0] == "de"

    fp1 = fingerprint_batch(tbl).to_pandas()
    fp2 = fingerprint_batch(tbl).to_pandas()
    assert (fp1["fingerprint"] == fp2["fingerprint"]).all()  # deterministic
    assert fp1["fingerprint"].nunique() == 3


def test_multimodal_plumbing(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.multimodal import (
        FrameSampleKernel,
        media_feature_pipeline,
        synth_media_table,
    )

    media = synth_media_table(24)
    out = media_feature_pipeline(ray.data.from_arrow(media)).to_pandas()
    assert len(out) == 24
    assert (out["out_width"] == 16).all() and (out["out_height"] == 12).all()
    # pixels payload has the exact decoded size and is deterministic
    assert all(len(p) == 16 * 12 * 3 for p in out["pixels"])
    out2 = media_feature_pipeline(ray.data.from_arrow(media)).to_pandas()
    assert (out["mean_luminance"].to_numpy() == out2["mean_luminance"].to_numpy()).all()

    frames = (
        ray.data.from_arrow(synth_media_table(5, kind="video"))
        .map_batches(FrameSampleKernel, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
    )
    assert len(frames) == 5 * 4  # 16 frames, stride 4
    assert set(frames["frame"]) == {0, 4, 8, 12}


def test_minhash_hot_bucket_cap(ray_session, docs_with_dups):
    """Oversized LSH buckets emit a sorted-consecutive chain instead of all
    pairs: connected components survive, the O(n^2) explosion does not."""
    import ray.data

    from python_rasterstats_ray.stages.dedup import minhash_lsh_pairs

    # 20 identical docs -> every band bucket holds all 20 ids
    tbl = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(["same exact boilerplate text repeated"] * 20),
        }
    )
    pairs = minhash_lsh_pairs(ray.data.from_arrow(tbl), max_bucket_size=8).to_pandas()
    # chain: exactly n-1 distinct consecutive edges, not n*(n-1)/2
    assert len(pairs) == 19
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got == {(i, i + 1) for i in range(19)}


def test_exact_dedup_filter(ray_session, docs_with_dups):
    import ray.data

    from python_rasterstats_ray.stages.dedup import exact_dedup_filter

    ds = ray.data.from_arrow(docs_with_dups)
    kept = exact_dedup_filter(ds, keep_cols=[]).to_pandas()
    # one survivor per distinct text, always the min doc_id
    assert len(kept) == 16
    assert set(kept["doc_id"]) == set(range(15)) | {70}


def test_grid_index_far_query_and_ties():
    """Queries far outside the point cloud still return k neighbors, and a
    boundary-distance tie resolves to the smaller id (ADVICE round 1)."""
    import numpy as np

    from python_rasterstats_ray.state.grid_index import GridIndex

    rng = np.random.default_rng(8)
    xs = rng.uniform(0, 10, 200)
    ys = rng.uniform(0, 10, 200)
    ids = np.arange(200, dtype=np.int64)
    gi = GridIndex(xs, ys, ids, cell=1.0)

    def brute(x, y, k):
        d2 = (xs - x) ** 2 + (ys - y) ** 2
        order = np.lexsort((ids, d2))[:k]
        return ids[order].tolist(), d2[order].tolist()

    # far outside the data span in every direction (old max_ring would
    # exhaust before reaching any bucket)
    for qx, qy in [(500.0, 500.0), (-300.0, 5.0), (5.0, -1000.0), (250.0, -250.0)]:
        got_i, got_d = gi.knn(qx, qy, 5)
        want_i, want_d = brute(qx, qy, 5)
        assert got_i.tolist() == want_i and got_d.tolist() == want_d, (qx, qy)

    # exact-tie at a ring boundary: query on a cell edge, two points at
    # identical distance on opposite sides, smaller id in the OUTER ring
    xs2 = np.array([1.0, 5.0])   # both exactly 2.0 from query x=3
    ys2 = np.array([0.5, 0.5])
    ids2 = np.array([1, 7], dtype=np.int64)
    gi2 = GridIndex(xs2, ys2, ids2, cell=1.0)
    got_i, got_d = gi2.knn(3.0, 0.5, 1)
    assert got_i.tolist() == [1] and got_d[0] == 4.0


def test_ivf_partitioned_store(ray_session, tmp_path):
    """ivf_write_partitioned + knn_ivf_from_store: the store is laid out
    one directory per IVF list; probing with nprobe=all partitions must
    reproduce the brute-force top-k exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.similarity import (
        ivf_write_partitioned,
        knn_embeddings,
        knn_ivf_from_store,
        train_centroids,
    )

    rng = np.random.default_rng(3)
    n, dim = 400, 16
    embs = rng.standard_normal((n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(embs.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cents = train_centroids(ds, n_centroids=4)
    store = str(tmp_path / "ivf_store")
    ivf_write_partitioned(ds, cents, store)

    import os

    lists = sorted(d for d in os.listdir(store) if d.startswith("ivf_list="))
    assert len(lists) >= 2  # corpus actually split across partitions

    qids = np.arange(3, dtype=np.int64)
    qmat = embs[:3]
    exact = knn_embeddings(ds, (qids, qmat), k=5).to_pandas()
    stored = knn_ivf_from_store(store, (qids, qmat), cents, k=5, nprobe=4).to_pandas()
    key = ["query_id", "rank"]
    exact = exact.sort_values(key).reset_index(drop=True)
    stored = stored.sort_values(key).reset_index(drop=True)
    assert (exact["neighbor_id"] == stored["neighbor_id"]).all()

    # nprobe=1 reads only a subset of partitions and still returns k rows
    approx = knn_ivf_from_store(store, (qids, qmat), cents, k=5, nprobe=1).to_pandas()
    assert set(approx["query_id"]) == set(qids.tolist())


def test_top_docs_per_lang(ray_session):
    """Grouped top-k (partial top-k per batch + candidate-only merge)
    matches a direct pandas window ranking."""
    from python_rasterstats_ray.pipelines.queries import q_top_docs_per_lang

    out = q_top_docs_per_lang("/root/testdata/sf0.001").to_pandas()
    import pandas as pd
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    ).to_pandas()
    docs = docs.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
    docs["rank"] = docs.groupby("lang").cumcount() + 1
    want = docs[docs["rank"] <= 3].reset_index(drop=True)
    got = out.sort_values(["lang", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "n_chars", "rank"]].reset_index(drop=True),
        want[["doc_id", "lang", "n_chars", "rank"]].reset_index(drop=True),
    )


def test_stratified_sample_deterministic(ray_session):
    """Content-hash sampling: repeat runs identical; per-lang rates hold
    approximately; pure function of text (row order irrelevant)."""
    from python_rasterstats_ray.pipelines.queries import (
        _SAMPLE_RATES,
        q_docs_stratified_sample,
    )

    a = q_docs_stratified_sample("/root/testdata/sf0.001").to_pandas()
    b = q_docs_stratified_sample("/root/testdata/sf0.001").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert len(a) > 0
    assert set(a["lang"]) <= set(_SAMPLE_RATES)


def test_pages_host_stats(ray_session):
    """Per-host aggregation: 97 synthetic hosts, page counts add to n."""
    from python_rasterstats_ray.pipelines.queries import q_pages_host_stats

    out = q_pages_host_stats("unused").to_pandas()
    assert len(out) == 97
    assert out["n_pages"].sum() == 10_000
    assert (out["total_tokens"] > 0).all()


def test_interval_join_attribution(ray_session):
    """Range join: events land in their own session's window; a probe
    with no interval for its key gets -1."""
    import pandas as pd
    import ray.data

    from python_rasterstats_ray.stages.temporal import interval_join

    events = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 7],
            "event_id": [10, 11, 12, 20, 70],
            "ts": pd.to_datetime([100, 200, 5000, 100, 100], unit="s"),
        }
    )
    intervals = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "session_idx": [0, 1, 0],
            "t_start": [100_000_000, 5_000_000_000, 100_000_000],
            "t_end": [200_000_000, 5_000_000_000, 100_000_000],
        }
    )
    out = (
        interval_join(
            ray.data.from_pandas(events), ray.data.from_pandas(intervals)
        )
        .to_pandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    assert out["interval_id"].tolist() == [0, 0, 1, 0, -1]


def test_hll_bit_length_exact():
    """The vectorized bit_length must be exact where float log2 misrounds
    (just below powers of two)."""
    import numpy as np

    from python_rasterstats_ray.stages.sketch import _bit_length_u64

    xs = np.array(
        [0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 52) + 1, (1 << 54) - 1,
         (1 << 63), np.iinfo(np.uint64).max],
        dtype=np.uint64,
    )
    got = _bit_length_u64(xs)
    want = [int(x).bit_length() for x in xs.tolist()]
    assert got.tolist() == want


def test_hll_estimate_accuracy(ray_session):
    """Sketch of 5000 distinct synthetic values estimates within ~3 sigma
    (sigma = 1.04/sqrt(1024) ~ 3.3%), and the distributed merge equals a
    single-pass sketch."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.sketch import (
        _sketch_of_hashes,
        hll_estimate,
        hll_sketch,
    )
    from python_rasterstats_ray.sources.synthetic import _sha_hash64

    vals = np.array([f"value-{i}" for i in range(5000)])
    tbl = pa.table({"text": pa.array(vals.tolist(), pa.string())})
    sk = (
        hll_sketch(ray.data.from_arrow(tbl).repartition(8), col="text", b=10)
        .to_pandas()
    )
    est = hll_estimate(sk, b=10)
    assert abs(est - 5000) / 5000 < 0.10, est

    # merge parity: distributed register maxes == single-pass maxes
    reg, rho = _sketch_of_hashes(_sha_hash64(vals), 10)
    want = {}
    for r, p in zip(reg.tolist(), rho.tolist()):
        want[r] = max(want.get(r, 0), p)
    got = dict(zip(sk["register"], sk["max_rho"]))
    assert got == want


def test_cms_estimate_bounds(ray_session):
    """CMS point estimates never undercount, and with d=4 x w=1024 over
    97 hosts they are exact (no collisions expected at this load)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.sketch import cms_estimate, cms_sketch

    rng = np.random.default_rng(3)
    hosts = [f"host-{i}" for i in range(97)]
    true = {h: int(rng.integers(1, 200)) for h in hosts}
    stream = [h for h, c in true.items() for _ in range(c)]
    tbl = pa.table({"host": pa.array(stream, pa.string())})
    sk = cms_sketch(
        ray.data.from_arrow(tbl).repartition(8), col="host"
    ).to_pandas()
    est = cms_estimate(sk, hosts)
    for h in hosts:
        assert est[h] >= true[h]
        assert est[h] <= true[h] + 50  # collision slack
    assert sum(1 for h in hosts if est[h] == true[h]) >= 90


def test_repetition_batch_bruteforce():
    """Vectorized repetition stats vs a per-doc brute force, including
    doubled spaces (empty tokens), all-same-word docs and 1-word docs."""
    from collections import Counter

    from python_rasterstats_ray.stages.text import repetition_batch

    texts = [
        "a b a b a b",
        "x",
        "dup dup dup dup",
        "a  b c",          # doubled space -> empty token, DuckDB parity
        "one two three four five six",
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = repetition_batch(batch).to_pydict()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert out["n_words"][i] == len(toks), t
        assert out["n_distinct_words"][i] == len(set(toks)), t
        assert out["n_bigrams"][i] == len(bigrams), t
        want_top = max(Counter(bigrams).values()) if bigrams else 0
        assert out["top_bigram_count"][i] == want_top, t


def test_decontaminate_kernel_bruteforce(ray_session):
    """Gram-hash decontamination vs brute-force string 5-gram overlap."""
    import ray

    from python_rasterstats_ray.stages.text import (
        DecontaminateKernel,
        benchmark_gram_set,
    )

    bench = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs"]
    docs = [
        "clean text with no overlap at all here today",
        "she saw the quick brown fox jumps over a fence",   # 1 shared 5-gram? check
        "pack my box with five dozen liquor jugs again",    # several shared
        "short doc",                                        # < 5 words
    ]

    def grams(t):
        w = t.split(" ")
        return [" ".join(w[i:i + 5]) for i in range(len(w) - 4)]

    bench_set = set(g for t in bench for g in grams(t))
    want = [sum(g in bench_set for g in grams(t)) for t in docs]

    ref = ray.put(benchmark_gram_set(bench, ngram=5))
    batch = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    out = DecontaminateKernel(ref, ngram=5)(batch).to_pydict()
    assert out["n_contaminated_grams"] == want
    assert want[2] > 0  # the planted contamination was actually caught


def test_pii_batch_planted():
    from python_rasterstats_ray.stages.text import pii_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "mail me at jo.doe+x@sub.example.org or admin@h.co thanks",
                    "server 192.168.0.1 and backup 10.0.0.255 call +1 555 010 1234",
                    "nothing sensitive here at all",
                ]
            ),
        }
    )
    out = pii_batch(tbl)
    assert out["n_emails"].to_pylist() == [2, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0]
    assert out["n_phones"].to_pylist() == [0, 1, 0]
    # redaction really shrinks/rewrites: doc0 loses both long emails
    orig = [len(t) for t in tbl["text"].to_pylist()]
    clean = out["clean_len"].to_pylist()
    assert clean[0] < orig[0] and clean[2] == orig[2]


def test_unigram_lm_kernel_bruteforce(ray_session):
    import math

    import ray

    from python_rasterstats_ray.stages.text import (
        UnigramLMKernel,
        token_count_partials,
        vocab_micronats,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b b c", "a a a", "c b zz"]),
        }
    )
    part = token_count_partials(tbl)
    counts = dict(zip(part["token"].to_pylist(), part["c"].to_pylist()))
    assert counts == {"a": 4, "b": 3, "c": 2, "zz": 1}
    tokens, mn = vocab_micronats(list(counts), list(counts.values()))
    ref = ray.put((tokens, mn))
    out = UnigramLMKernel(ref)(tbl)
    total = 10
    exp0 = (
        math.floor(math.log(4 / total) * 1e6)
        + 2 * math.floor(math.log(3 / total) * 1e6)
        + math.floor(math.log(2 / total) * 1e6)
    )
    assert out["lm_score_micronats"].to_pylist()[0] == exp0
    assert out["n_lm_tokens"].to_pylist() == [4, 3, 3]
    assert out["n_oov"].to_pylist() == [0, 0, 0]
    # OOV floor path
    ref2 = ray.put((["a"], np.array([-1], np.int64)))
    out2 = UnigramLMKernel(ref2)(tbl)
    assert out2["n_oov"].to_pylist() == [3, 0, 3]


def test_pack_sequences_prefix_sum(ray_session, tmp_path, monkeypatch):
    """Distributed bucketed prefix-sum must equal the sequential cumsum,
    including docs that straddle bucket and sequence boundaries."""
    import pyarrow.parquet as pq

    from python_rasterstats_ray.pipelines import queries as Q

    rng = np.random.default_rng(5)
    n = 200
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(0, 90, n)]
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    out = (
        Q.q_docs_pack_sequences(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ntok = np.array([len(t.split()) if t else 0 for t in texts], np.int64)
    off = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    assert (out["n_tokens"].to_numpy() == ntok).all()
    assert (out["tok_offset"].to_numpy() == off).all()
    assert (out["seq_first"].to_numpy() == off // Q.PACK_SEQ_LEN).all()
    last = (off + np.maximum(ntok, 1) - 1) // Q.PACK_SEQ_LEN
    assert (out["seq_last"].to_numpy() == last).all()


def test_dup_ngram_spans_planted(ray_session, tmp_path):
    """Docs sharing a 5-gram with ANOTHER doc count it per occurrence;
    within-doc repeats alone do not count."""
    import pyarrow.parquet as pq

    from python_rasterstats_ray.pipelines import queries as Q

    shared = "alpha beta gamma delta epsilon"
    texts = [
        shared + " tail one",             # doc 0: 1 shared gram window chain
        "prefix " + shared,               # doc 1: shares with doc 0
        "zeta eta theta iota kappa zeta eta theta iota kappa",  # doc 2: self-repeat only
        "totally unique words here now",  # doc 3: nothing shared
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = (
        Q.q_docs_dup_ngram_spans(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc0 "alpha..epsilon tail one": grams at offsets 0..2; only offset-0
    # gram ("alpha beta gamma delta epsilon") recurs in doc1
    assert out.loc[0, "n_grams"] == 3 and out.loc[0, "n_dup_grams"] == 1
    assert out.loc[1, "n_grams"] == 2 and out.loc[1, "n_dup_grams"] == 1
    # doc2 repeats its own 5-grams (10 words -> 6 windows, window 0 == window 5)
    assert out.loc[2, "n_grams"] == 6 and out.loc[2, "n_dup_grams"] == 0
    assert out.loc[3, "n_dup_grams"] == 0


def test_docs_chunk_windows(ray_session, tmp_path):
    """Chunk boundaries: short doc -> 1 chunk; exact-multiple and
    straddling lengths produce the documented window starts/lengths."""
    import hashlib

    import pyarrow.parquet as pq

    from python_rasterstats_ray.pipelines import queries as Q

    texts = {
        0: " ".join(f"t{i}" for i in range(10)),    # 10 toks -> 1 chunk
        1: " ".join(f"t{i}" for i in range(64)),    # == CHUNK -> 1 chunk
        2: " ".join(f"t{i}" for i in range(65)),    # 1 past -> 2 chunks
        3: " ".join(f"t{i}" for i in range(150)),   # 1 + ceil(86/56) = 3
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = (
        Q.q_docs_chunk(str(d))
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    per_doc = out.groupby("doc_id").size().to_dict()
    assert per_doc == {0: 1, 1: 1, 2: 2, 3: 3}
    d3 = out[out["doc_id"] == 3]
    assert d3["start_tok"].tolist() == [0, 56, 112]
    assert d3["n_chunk_tokens"].tolist() == [64, 64, 38]
    toks = texts[3].split(" ")
    want = hashlib.md5(" ".join(toks[112:150]).encode()).hexdigest()
    assert d3["chunk_md5"].iloc[-1] == want


def test_png_codec_roundtrip_all_filters():
    from python_rasterstats_ray.sources.png import png_decode, png_encode

    rng = np.random.default_rng(9)
    for ch in (1, 2, 3, 4):
        shape = (13, 17) if ch == 1 else (13, 17, ch)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            back = png_decode(png_encode(img, filter_type=ft))
            assert back.shape == img.shape and (back == img).all(), (ch, ft)


def test_png_codec_rejects_corruption():
    import pytest as _pt

    from python_rasterstats_ray.sources.png import png_decode, png_encode

    data = bytearray(png_encode(np.zeros((4, 4, 3), np.uint8)))
    with _pt.raises(ValueError):
        png_decode(b"NOTAPNG" + bytes(data))
    data[40] ^= 0xFF  # flip a byte inside a chunk -> CRC mismatch
    with _pt.raises(ValueError):
        png_decode(bytes(data))


def test_media_pipeline_real_png_decode(ray_session):
    """DecodeImageKernel must reproduce the EXACT pixels for PNG payloads
    (not the stub): mean luminance equals the source image's mean."""
    import ray.data

    from python_rasterstats_ray.sources.png import png_decode
    from python_rasterstats_ray.stages.multimodal import (
        media_feature_pipeline,
        synth_png_media_table,
    )

    tbl = synth_png_media_table(12, size=(20, 10), seed=5)
    out = (
        media_feature_pipeline(ray.data.from_arrow(tbl), target_size=None)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(12):
        img = png_decode(tbl["payload"][i].as_py())
        assert out.loc[i, "mean_luminance"] == float(img.mean())
        pix = np.frombuffer(out.loc[i, "pixels"], np.uint8).reshape(10, 20, 3)
        assert (pix == img).all()


def test_wav_codec_roundtrip():
    from python_rasterstats_ray.sources.wav import wav_decode, wav_encode

    rng = np.random.default_rng(4)
    mono = rng.integers(-32768, 32767, 500, dtype=np.int16)
    s, r = wav_decode(wav_encode(mono, 8000))
    assert r == 8000 and s.shape == (500, 1) and (s[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32767, (300, 2), dtype=np.int16)
    s, r = wav_decode(wav_encode(stereo, 44100))
    assert r == 44100 and (s == stereo).all()
    import pytest as _pt

    with _pt.raises(ValueError):
        wav_decode(b"nope" * 10)


def test_audio_pipeline_real_wav(ray_session):
    import ray.data

    from python_rasterstats_ray.sources.wav import wav_decode
    from python_rasterstats_ray.stages.multimodal import (
        audio_feature_pipeline,
        synth_wav_media_table,
    )

    tbl = synth_wav_media_table(8, seconds=0.1, rate=8000, seed=2)
    out = (
        audio_feature_pipeline(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert (out["n_samples"] == 800).all() and (out["sample_rate"] == 8000).all()
    samples, _ = wav_decode(tbl["payload"][0].as_py())
    mono = samples.mean(axis=1)
    assert out.loc[0, "rms"] == float(np.sqrt(np.mean(mono**2)))
    assert out.loc[0, "peak"] == float(np.abs(samples).max())
    # a 110 Hz tone at 8 kHz crosses zero ~220x/s -> zcr ~ 0.0275
    assert 0.005 < out.loc[0, "zero_crossing_rate"] < 0.2


def test_png_codec_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_rasterstats_ray.sources.png import png_decode, png_encode

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31),
    )
    def roundtrip(w, h, ch, ft, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        back = png_decode(png_encode(img, filter_type=ft))
        assert back.shape == img.shape and (back == img).all()

    roundtrip()


def test_jpeg_codec_property_roundtrip():
    """Lossy roundtrip bound: at quality >= 92 the per-pixel error of the
    from-scratch baseline JPEG codec stays within a small bound for any
    image (quantization error of the scaled Annex-K tables), across both
    subsamplings, grayscale, odd sizes and restart intervals."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_rasterstats_ray.sources.jpeg import is_jpeg, jpeg_decode, jpeg_encode

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        gray=st.booleans(),
        sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
        ri=st.sampled_from([0, 2]),
        seed=st.integers(0, 2**31),
    )
    def roundtrip(w, h, gray, sub, ri, seed):
        rng = np.random.default_rng(seed)
        # smooth image: JPEG's own error bound is only tight for
        # band-limited content; pure noise is checked separately below
        yy, xx = np.mgrid[0:h, 0:w]
        base = (
            128.0
            + 100.0 * np.sin(yy / 9.0 + rng.uniform(0, 6))
            * np.cos(xx / 7.0 + rng.uniform(0, 6))
        )
        base2 = 128.0 + 90.0 * np.cos(yy / 11.0 + 1.0) * np.sin(xx / 13.0 + 2.0)
        if gray:
            img = np.clip(base, 0, 255).astype(np.uint8)
        else:
            img = np.clip(
                np.stack([base, 255 - base, base2], axis=2), 0, 255
            ).astype(np.uint8)
        data = jpeg_encode(img, quality=92, subsampling=sub, restart_interval=ri)
        assert is_jpeg(data)
        back = jpeg_decode(data)
        assert back.shape == img.shape
        err = np.abs(back.astype(np.int64) - img.astype(np.int64))
        if sub in ("4:2:0", "4:2:2") and not gray:
            # chroma subsampling discards real information: bound the
            # MEAN tightly, the max only loosely (steep chroma edges)
            assert err.mean() <= 8 and err.max() <= 64, (err.mean(), err.max())
        else:
            assert err.max() <= 16, (err.max(), sub, gray)

    roundtrip()


def test_jpeg_codec_edges():
    import pytest as _pt

    from python_rasterstats_ray.sources.jpeg import is_jpeg, jpeg_decode, jpeg_encode

    # constant image roundtrips exactly (all AC coefficients are zero)
    img = np.full((16, 24, 3), 77, np.uint8)
    assert (jpeg_decode(jpeg_encode(img, quality=90)) == img).all()

    # noise at quality=100 stays within the unit-quant error
    rng = np.random.default_rng(5)
    n = rng.integers(0, 256, (24, 24, 3), np.uint8)
    err = np.abs(
        jpeg_decode(jpeg_encode(n, quality=100)).astype(int) - n.astype(int)
    )
    assert err.max() <= 8

    assert not is_jpeg(b"\x89PNG\r\n")
    with _pt.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its one
    # scan claims the full 0..63 band for a DC scan): clean ValueError
    data = bytearray(jpeg_encode(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with _pt.raises(ValueError):
        jpeg_decode(bytes(data))
    # arithmetic coding stays an honest NotImplementedError
    data[sof + 1] = 0xC9
    with _pt.raises(NotImplementedError):
        jpeg_decode(bytes(data))


def test_decode_image_jpeg_payload():
    """decode_image must route JPEG payloads through the real codec and
    keep the HxWx3 contract (incl. grayscale JPEG expansion)."""
    from python_rasterstats_ray.sources.jpeg import jpeg_encode
    from python_rasterstats_ray.stages.multimodal import decode_image

    img = np.full((12, 10, 3), 100, np.uint8)
    out = decode_image(jpeg_encode(img, quality=95), 10, 12)
    assert out.shape == (12, 10, 3) and (out == img).all()
    g = np.full((8, 9), 42, np.uint8)
    outg = decode_image(jpeg_encode(g, quality=95), 9, 8)
    assert outg.shape == (8, 9, 3) and (outg == 42).all()


def test_wav_codec_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_rasterstats_ray.sources.wav import is_wav, wav_decode, wav_encode

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(0, 2000),
        ch=st.sampled_from([1, 2, 4]),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        mono_1d=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def roundtrip(n, ch, rate, mono_1d, seed):
        rng = np.random.default_rng(seed)
        if ch == 1 and mono_1d:
            samples = rng.integers(-32768, 32768, n, dtype=np.int16)
            expect = samples[:, None]
        else:
            samples = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
            expect = samples
        data = wav_encode(samples, rate)
        assert is_wav(data)
        back, back_rate = wav_decode(data)
        assert back_rate == rate
        assert back.shape == expect.shape and (back == expect).all()

    roundtrip()


def test_decode_image_channel_contract():
    """decode_image must return HxWx3 for every PNG color type."""
    from python_rasterstats_ray.sources.png import png_encode
    from python_rasterstats_ray.stages.multimodal import decode_image

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        shape = (5, 6) if ch == 1 else (5, 6, ch)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_image(png_encode(img), 6, 5)
        assert out.shape == (5, 6, 3), ch


def test_wav_features_edge_cases():
    """Full-scale negative peak must not wrap; zero-length clips must
    produce zeros, not crash; truncated WAVs raise ValueError."""
    import pytest as _pt

    from python_rasterstats_ray.sources.wav import wav_decode, wav_encode
    from python_rasterstats_ray.stages.multimodal import AudioFeatureKernel

    clip = wav_encode(np.array([-32768, 5, -5], np.int16), 8000)
    empty = wav_encode(np.zeros(0, np.int16), 8000)
    tbl = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([clip, empty], pa.binary()),
        }
    )
    out = AudioFeatureKernel()(tbl)
    assert out["peak"].to_pylist() == [32768.0, 0.0]
    assert out["rms"].to_pylist()[1] == 0.0
    assert out["zero_crossing_rate"].to_pylist()[1] == 0.0
    with _pt.raises(ValueError):
        wav_decode(clip[:-6])  # truncated data chunk
    from python_rasterstats_ray.sources.png import png_decode, png_encode

    with _pt.raises(ValueError):
        # cut into IDAT (past IEND's 12 bytes) -> declared length overruns
        png_decode(png_encode(np.zeros((4, 4, 3), np.uint8))[:-20])


def test_avi_codec_roundtrip_property():
    """The MJPEG-AVI container is lossless around its frame payloads:
    encode->decode must return the exact frame byte strings and header
    metadata for arbitrary frame counts/sizes (frames here are arbitrary
    bytes — the container must not care)."""
    import pytest as _pt

    from python_rasterstats_ray.sources.avi import (
        AviError,
        avi_decode,
        avi_encode,
        is_avi,
    )

    rng = np.random.default_rng(7)
    for n, w, h, fps in [(1, 8, 8, 1), (3, 48, 32, 10), (17, 64, 48, 30), (5, 2, 2, 25)]:
        frames = [
            rng.integers(0, 256, int(rng.integers(1, 2000)), dtype=np.uint8).tobytes()
            for _ in range(n)
        ]
        data = avi_encode(frames, width=w, height=h, fps=fps)
        assert is_avi(data)
        back, meta = avi_decode(data)
        assert back == frames
        assert (meta["width"], meta["height"], meta["fps"], meta["n_frames"]) == (w, h, fps, n)
    assert not is_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with _pt.raises(AviError):
        avi_decode(b"not an avi")
    with _pt.raises(AviError):
        avi_encode([], width=4, height=4)
    # truncated mid-movi: declared chunk length overruns the container
    data = avi_encode([b"x" * 100], width=4, height=4)
    with _pt.raises(AviError):
        avi_decode(data[:-40])


def test_video_frames_decode_real(ray_session):
    """End-to-end REAL video path: MJPEG-AVI payloads through
    FrameSampleKernel (chunks must be the exact per-frame JPEGs) and
    video_feature_pipeline (per-frame features from actual decode)."""
    import ray.data

    from python_rasterstats_ray.sources.avi import avi_decode
    from python_rasterstats_ray.stages.multimodal import (
        FrameSampleKernel,
        decode_image,
        synth_mjpeg_media_table,
        video_feature_pipeline,
    )

    n, n_frames, stride = 6, 8, 4
    tbl = synth_mjpeg_media_table(n, n_frames=n_frames)
    # kernel-level: sampled chunks are the container's exact JPEG bytes
    sampled = FrameSampleKernel(stride=stride)(tbl)
    per_doc = -(-n_frames // stride)
    assert len(sampled) == n * per_doc
    frames0, meta0 = avi_decode(tbl["payload"][0].as_py())
    got0 = {
        r["frame"]: r["chunk"]
        for r in sampled.to_pylist()
        if r["media_id"] == 0
    }
    assert got0 == {fi: frames0[fi] for fi in range(0, n_frames, stride)}
    # distributed: features come from real frame decode
    out = video_feature_pipeline(
        ray.data.from_arrow(tbl), stride=stride, concurrency=(1, 2), batch_size=4
    ).take_all()
    assert len(out) == n * per_doc
    row0 = next(r for r in out if r["media_id"] == 0 and r["frame"] == 0)
    img0 = decode_image(frames0[0], meta0["width"], meta0["height"])
    assert row0["mean_luminance"] == float(img0.mean())
    assert (row0["out_width"], row0["out_height"]) == (meta0["width"], meta0["height"])


def test_jpeg_progressive_matches_baseline_exactly():
    """Progressive JPEG re-arranges the SAME quantized coefficients as
    baseline, so decoding both encodings of one image must be
    BIT-IDENTICAL — this pins every progressive path (spectral
    selection, successive approximation on DC and AC, EOB runs, ZRL in
    refinement, interleaved DC + non-interleaved AC scans, optimal
    Huffman tables) against the already-property-tested baseline."""
    from python_rasterstats_ray.sources.jpeg import (
        is_jpeg,
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(321)
    cases = []
    yy, xx = np.mgrid[0:37, 0:53]
    cases.append(
        (np.stack([(xx * 5) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256], axis=2)
         .astype(np.uint8), 90)
    )
    cases.append((rng.integers(0, 256, (24, 31, 3), dtype=np.uint8), 75))
    cases.append((np.full((16, 16, 3), 200, np.uint8), 90))       # long EOB runs
    sparse = np.zeros((40, 40, 3), np.uint8)                       # ZRL-heavy
    sparse[rng.integers(0, 40, 30), rng.integers(0, 40, 30)] = 255
    cases.append((sparse, 85))
    yy2, xx2 = np.mgrid[0:33, 0:41]
    cases.append(((((xx2 + yy2) % 2) * 255).astype(np.uint8), 60))  # checker gray
    cases.append((rng.integers(0, 256, (3, 5, 3), dtype=np.uint8), 100))
    for img, q in cases:
        prog = jpeg_encode_progressive(img, quality=q)
        assert is_jpeg(prog)
        got = jpeg_decode(prog)
        want = jpeg_decode(jpeg_encode(img, quality=q, subsampling="4:4:4"))
        assert np.array_equal(got, want), (img.shape, q)


def test_jpeg_progressive_restart_markers():
    """Progressive scans with DRI/RSTn (DPCM + EOB-run state resets at
    every marker, in every scan kind) stay bit-identical to baseline."""
    from python_rasterstats_ray.sources.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(55)
    yy, xx = np.mgrid[0:41, 0:29]
    cases = [
        (np.stack([(xx * 7) % 256, (yy * 5) % 256, ((xx + 2 * yy)) % 256], axis=2)
         .astype(np.uint8), 90, 2),
        (rng.integers(0, 256, (26, 35, 3), dtype=np.uint8), 70, 3),
        (np.full((18, 18), 99, np.uint8), 90, 1),  # gray, all-EOB scans
    ]
    for img, q, ri in cases:
        got = jpeg_decode(jpeg_encode_progressive(img, quality=q, restart_interval=ri))
        want = jpeg_decode(jpeg_encode(img, quality=q, subsampling="4:4:4"))
        assert np.array_equal(got, want), (img.shape, q, ri)


def test_jpeg_progressive_edges():
    import pytest as _pt

    from python_rasterstats_ray.sources.jpeg import (
        jpeg_decode,
        jpeg_encode_progressive,
    )
    from python_rasterstats_ray.stages.multimodal import decode_image

    img = np.arange(96, dtype=np.uint8).reshape(8, 4, 3)
    data = jpeg_encode_progressive(img, quality=95)
    # decode_image routes progressive payloads through the real codec
    out = decode_image(data, 4, 8)
    assert out.shape == (8, 4, 3)
    with _pt.raises(ValueError):
        jpeg_encode_progressive(np.zeros((0, 4, 3), np.uint8))
    with _pt.raises(ValueError):
        jpeg_encode_progressive(img.astype(np.int32))
    # truncated mid-scan: progressive decode degrades gracefully (the
    # completed scans still render — same contract as libjpeg previews)
    # or fails cleanly; it must never hang or crash outside ValueError
    try:
        partial = jpeg_decode(data[: len(data) // 2] + b"\x00")
        assert partial.shape == (8, 4, 3)
    except ValueError:
        pass
    # truncated before any scan completes: nothing to render -> error
    with _pt.raises(ValueError):
        jpeg_decode(data[:30])


def test_media_pipeline_mixed_formats(ray_session):
    """One media table mixing PNG, baseline-JPEG and progressive-JPEG
    payloads through the same decode pipeline: every row decodes through
    its real codec (no fake fallback), verified against direct decode."""
    import ray.data

    from python_rasterstats_ray.sources.jpeg import jpeg_encode, jpeg_encode_progressive
    from python_rasterstats_ray.sources.png import png_encode
    from python_rasterstats_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        media_feature_pipeline,
    )

    rng = np.random.default_rng(9)
    w, h = 24, 16
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(6)]
    payloads = []
    for i, img in enumerate(imgs):
        if i % 3 == 0:
            payloads.append(png_encode(img))
        elif i % 3 == 1:
            payloads.append(jpeg_encode(img, quality=90))
        else:
            payloads.append(jpeg_encode_progressive(img, quality=90))
    tbl = pa.table(
        {
            "media_id": pa.array(range(6), pa.int64()),
            "kind": pa.array(["png", "jpeg", "jpeg_progressive"] * 2, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([w] * 6, pa.int32()),
            "height": pa.array([h] * 6, pa.int32()),
            "sample_rate": pa.array([0] * 6, pa.int32()),
            "n_frames": pa.array([1] * 6, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = media_feature_pipeline(
        ray.data.from_arrow(tbl), target_size=None, concurrency=(1, 2), batch_size=2
    ).take_all()
    assert len(out) == 6
    by_id = {r["media_id"]: r for r in out}
    for i, p in enumerate(payloads):
        want = decode_image(p, w, h)
        assert by_id[i]["mean_luminance"] == float(want.mean())
        assert (by_id[i]["out_width"], by_id[i]["out_height"]) == (w, h)


def _ref_bpe(texts, n_merges):
    """Independent sequential BPE reference (dict/loop based, Sennrich
    get_stats/merge semantics): same id model as the engine — ords,
    end-of-word 0x10FFFF, merged ids from 0x110000, smallest packed key
    wins frequency ties."""
    from collections import Counter

    MERGE_BASE = 0x110000
    EOW = MERGE_BASE - 1
    key_base = MERGE_BASE + n_merges + 1
    wc = Counter()
    for t in texts:
        for word in t.split():
            wc[word] += 1
    seqs = {tuple([ord(c) for c in word] + [EOW]): n for word, n in wc.items()}
    rules = []
    for rank in range(n_merges):
        pairs = Counter()
        for seq, n in seqs.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        best = max(pairs.values())
        if best < 2:
            break
        a, b = min(
            (p for p, c in pairs.items() if c == best),
            key=lambda p: p[0] * key_base + p[1],
        )
        new_id = MERGE_BASE + rank
        rules.append((rank, a, b, new_id, best))
        out = {}
        for seq, n in seqs.items():
            merged, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    merged.append(new_id)
                    i += 2
                else:
                    merged.append(seq[i])
                    i += 1
            key = tuple(merged)
            out[key] = out.get(key, 0) + n
        seqs = out
    return rules


def test_bpe_train_matches_reference(ray_session):
    """Distributed BPE trainer must reproduce the sequential reference's
    exact merge sequence (ranks, pairs, frequencies) — determinism via
    the smallest-packed-key tie-break."""
    import ray.data

    from python_rasterstats_ray.stages.bpe import bpe_train, merge_table_strings

    texts = [
        "the theater thesis then these theme the the",
        "low lower lowest low low slow slowly",
        "new newer newest news new new",
        "the lower the newer the slower",
        "aaaa aaa aa aaaa aaa",  # overlapping-run stress (a,a) merges
    ] * 3
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    n_merges = 12
    got = bpe_train(
        ray.data.from_arrow(tbl).repartition(4), n_merges=n_merges
    )
    want = _ref_bpe(texts, n_merges)
    assert len(got) == len(want)
    for rank, a, b, new_id, freq in want:
        assert got["rank"][rank].as_py() == rank
        assert got["left"][rank].as_py() == a
        assert got["right"][rank].as_py() == b
        assert got["merged"][rank].as_py() == new_id
        assert got["freq"][rank].as_py() == freq
    # readable view expands merged symbols recursively
    strs = merge_table_strings(got)
    assert strs["token"][0].as_py()  # non-empty readable token
    toks = set(strs["token"].to_pylist())
    assert any("</w>" in t for t in toks)
    assert "aa" in {t.replace("</w>", "") for t in toks}


def test_bpe_stops_when_dry(ray_session):
    """No pair occurs twice -> no merges, empty rule table."""
    import ray.data

    from python_rasterstats_ray.stages.bpe import bpe_train

    tbl = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["abcdefg"], pa.string())}
    )
    got = bpe_train(ray.data.from_arrow(tbl), n_merges=5)
    assert len(got) == 0


def test_kmeans_int_matches_sequential(ray_session):
    """Distributed int64 fixed-point Lloyd's must be BIT-IDENTICAL to a
    sequential numpy reference (same init, same tie-break, same floor
    division) regardless of block layout — integer sums are
    order-independent."""
    import ray.data

    from python_rasterstats_ray.stages.similarity import (
        KMEANS_SCALE,
        kmeans_clusters,
        kmeans_train_int,
    )

    rng = np.random.default_rng(13)
    n, d, k, iters = 300, 8, 5, 6
    x = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(7)
    cents, counts = kmeans_train_int(ds, k, n_iter=iters)

    # sequential reference, identical integer semantics
    xm = np.round(x * KMEANS_SCALE).astype(np.int64)
    ref = xm[:k].copy()
    for _ in range(iters):
        scores = np.sum(ref * ref, axis=1)[None, :] - 2 * (xm @ ref.T)
        assign = np.argmin(scores, axis=1)
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, assign, xm)
        cnt = np.bincount(assign, minlength=k)
        nz = cnt > 0
        ref[nz] = np.floor_divide(sums[nz], cnt[nz][:, None])
    assert np.array_equal(cents, ref)
    # repartitioning differently must not change a single bit
    cents2, counts2 = kmeans_train_int(ray.data.from_arrow(tbl).repartition(2), k, n_iter=iters)
    assert np.array_equal(cents, cents2) and np.array_equal(counts, counts2)
    assert counts.sum() == n

    summary = kmeans_clusters(ds, k, n_iter=iters)
    assert len(summary) == k
    assert summary["n_members"].to_pylist() == counts.tolist()

    import pytest as _pt

    with _pt.raises(ValueError):
        kmeans_train_int(ray.data.from_arrow(tbl.slice(0, 3)), k=5)


def test_kll_sketch_rank_error_and_determinism(ray_session):
    """KLL quantiles stay within a small rank error of the exact
    quantiles, the sketch is deterministic for a fixed input, merge is
    associative enough that block layout changes stay within the same
    rank-error bound, and n is counted exactly."""
    import ray.data

    from python_rasterstats_ray.stages.sketch import KLLSketch, kll_quantiles

    rng = np.random.default_rng(77)
    vals = np.concatenate(
        [rng.standard_normal(30_000) * 10, rng.exponential(5, 20_000) + 50]
    )
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    exact = np.quantile(vals, qs)
    svals = np.sort(vals)

    def rank_err(v, q):
        return abs(np.searchsorted(svals, v) / len(svals) - q)

    # local sketch: error + determinism + state roundtrip
    s1 = KLLSketch(256).update(vals)
    s2 = KLLSketch(256).update(vals)
    assert s1.n == len(vals) == s2.n
    assert all(a == b for a, b in zip(s1.quantiles(qs), s2.quantiles(qs)))
    rt = KLLSketch.from_state(s1.to_state())
    assert list(rt.quantiles(qs)) == list(s1.quantiles(qs))
    for q, v in zip(qs, s1.quantiles(qs)):
        assert rank_err(v, q) <= 0.03, (q, v, rank_err(v, q))

    # merged partial sketches (the distributed shape) hold the bound too
    parts = [KLLSketch(256).update(c) for c in np.array_split(vals, 13)]
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert m.n == len(vals)
    for q, v in zip(qs, m.quantiles(qs)):
        assert rank_err(v, q) <= 0.03, (q, v)

    # distributed pipeline over Ray blocks
    tbl = pa.table({"n_chars": pa.array(vals, pa.float64())})
    out = kll_quantiles(ray.data.from_arrow(tbl).repartition(9), "n_chars", qs)
    assert out["n"].to_pylist() == [len(vals)] * len(qs)
    for q, v in zip(qs, out["value"].to_pylist()):
        assert rank_err(v, q) <= 0.03, (q, v)


def test_jpeg_progressive_subsampled_matches_baseline():
    """Progressive with 4:2:0 / 4:2:2 chroma subsampling (interleaved DC
    MCUs carrying v*h luma blocks; AC scans over each component's REAL
    block grid) decodes bit-identically to baseline at the same
    subsampling — including with restart markers and odd sizes."""
    from python_rasterstats_ray.sources.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(19)
    yy, xx = np.mgrid[0:37, 0:45]
    smooth = np.clip(
        np.stack([128 + 90 * np.sin(yy / 9), 128 + 80 * np.cos(xx / 7),
                  128 + 70 * np.sin((xx + yy) / 11)], axis=2), 0, 255
    ).astype(np.uint8)
    for sub in ("4:2:0", "4:2:2"):
        for img, q, ri in [
            (smooth, 90, 0),
            (rng.integers(0, 256, (21, 30, 3), dtype=np.uint8), 75, 2),
            (rng.integers(0, 256, (17, 17, 3), dtype=np.uint8), 100, 3),
        ]:
            got = jpeg_decode(
                jpeg_encode_progressive(img, quality=q, restart_interval=ri,
                                        subsampling=sub)
            )
            want = jpeg_decode(jpeg_encode(img, quality=q, subsampling=sub))
            assert np.array_equal(got, want), (sub, img.shape, q, ri)


def test_pq_train_encode_scan_matches_sequential(ray_session):
    """PQ training must be BIT-IDENTICAL to a per-subspace sequential
    Lloyd's reference (same init/tie-break/floor-divide), encode must
    reproduce the reference assignment, and the distributed ADC scan's
    top-k must equal a sequential ADC brute force with the same int64
    scores and tie-break — all regardless of block layout."""
    import ray.data

    from python_rasterstats_ray.stages.similarity import (
        KMEANS_SCALE,
        knn_pq,
        pq_encode,
        pq_train_int,
    )

    rng = np.random.default_rng(29)
    n, d, ns, nc, iters = 400, 12, 4, 8, 5
    dsub = d // ns
    x = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(9)
    books = pq_train_int(ds, n_subspaces=ns, n_codes=nc, n_iter=iters)

    # sequential reference: independent Lloyd's per subspace
    xm = np.round(x * KMEANS_SCALE).astype(np.int64)
    ref = np.stack([xm[:nc, s * dsub : (s + 1) * dsub] for s in range(ns)])
    for _ in range(iters):
        for s in range(ns):
            xs = xm[:, s * dsub : (s + 1) * dsub]
            scores = np.sum(ref[s] * ref[s], axis=1)[None, :] - 2 * (xs @ ref[s].T)
            assign = np.argmin(scores, axis=1)
            sums = np.zeros((nc, dsub), np.int64)
            np.add.at(sums, assign, xs)
            cnt = np.bincount(assign, minlength=nc)
            nz = cnt > 0
            ref[s][nz] = np.floor_divide(sums[nz], cnt[nz][:, None])
    assert np.array_equal(books, ref)
    books2 = pq_train_int(
        ray.data.from_arrow(tbl).repartition(2), n_subspaces=ns, n_codes=nc, n_iter=iters
    )
    assert np.array_equal(books, books2)

    # encode: distributed codes == reference argmin per subspace
    codes_tbl = (
        pq_encode(ds, books).sort("vec_id").to_pandas()
    )
    got = np.stack(codes_tbl["pq_code"].to_numpy())
    want = np.zeros((n, ns), np.uint8)
    for s in range(ns):
        xs = xm[:, s * dsub : (s + 1) * dsub]
        scores = np.sum(ref[s] * ref[s], axis=1)[None, :] - 2 * (xs @ ref[s].T)
        want[:, s] = np.argmin(scores, axis=1).astype(np.uint8)
    assert np.array_equal(got, want)

    # ADC scan: distributed top-k == sequential brute force (int64 lut)
    qids = np.array([0, 1], np.int64)
    qmat = x[:2] + 0.01
    code_ds = ray.data.from_pandas(
        codes_tbl[["vec_id", "pq_code"]]
    ).repartition(5)
    k = 7
    out = knn_pq(code_ds, (qids, qmat), books, k=k).sort(
        ["query_id", "rank"]
    ).to_pandas()
    qm = np.round(qmat * KMEANS_SCALE).astype(np.int64)
    for j, qid in enumerate(qids):
        lut = np.empty((ns, nc), np.int64)
        for s in range(ns):
            diff = qm[j, s * dsub : (s + 1) * dsub][None, :] - ref[s]
            lut[s] = np.sum(diff * diff, axis=1)
        dist = lut[np.arange(ns)[None, :], want.astype(np.int64)].sum(axis=1)
        order = np.lexsort((np.arange(n), dist))[:k]
        sub = out[out["query_id"] == qid]
        assert sub["neighbor_id"].tolist() == order.tolist()
        assert sub["adc_dist"].tolist() == dist[order].tolist()
        assert sub["rank"].tolist() == list(range(1, k + 1))

    import pytest as _pt

    with _pt.raises(ValueError):
        pq_train_int(ds, n_subspaces=5, n_codes=nc)  # 12 % 5 != 0


def test_bloom_filter_properties(ray_session):
    """No false negatives ever; merge-of-partials == single build (OR is
    the combine); distributed sketch build assembles to the same bitmap
    as a local one-shot build regardless of block layout."""
    import ray.data

    from python_rasterstats_ray.stages.sketch import (
        bloom_assemble,
        bloom_contains,
        bloom_sketch,
        bloom_words_from_hashes,
    )

    rng = np.random.default_rng(41)
    m_bits, k = 1 << 14, 5
    h = rng.integers(0, 2**63, size=3000, dtype=np.int64).astype(np.uint64)
    words = bloom_words_from_hashes(h, m_bits, k)
    # membership: every inserted hash probes positive
    assert bloom_contains(words, h, m_bits, k).all()
    # split build ORs to the same bitmap
    w1 = bloom_words_from_hashes(h[:1000], m_bits, k)
    w2 = bloom_words_from_hashes(h[1000:], m_bits, k)
    assert np.array_equal(words, w1 | w2)
    # false-positive rate is sane at this load factor (~3000 keys, 16k bits)
    probe = rng.integers(0, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    fresh = probe[~np.isin(probe, h)]
    fp = bloom_contains(words, fresh, m_bits, k).mean()
    assert fp < 0.25

    # distributed build == local build, any block layout
    tbl = pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    def hash_fn(batch):
        return batch["h"].to_numpy(zero_copy_only=False).view(np.uint64)

    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        sk = bloom_sketch(ds, hash_fn, m_bits=m_bits, k=k).to_pandas()
        assert np.array_equal(bloom_assemble(sk, m_bits), words)

    import pytest as _pt

    with _pt.raises(ValueError):
        bloom_words_from_hashes(h, 1000, k)  # not a power of two


def test_decontaminate_bloom_matches_exact(ray_session):
    """The bloom-prefiltered + exact-verify plan must be bit-identical to
    the broadcast-exact decontamination on the same corpus."""
    import pandas as pd

    from python_rasterstats_ray.pipelines.queries import (
        q_docs_decontaminate,
        q_docs_decontaminate_bloom,
    )

    sf = "/root/testdata/sf0.001"
    a = (
        q_docs_decontaminate_bloom(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_docs_decontaminate(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_contaminated_grams"] > 0).any()


def test_bpe_encode_matches_reference(ray_session):
    """Distributed encode (distinct-word trick) must reproduce a
    per-document sequential reference applying the same trained rules
    leftmost-first non-overlapping, in rank order."""
    import ray.data

    from python_rasterstats_ray.stages.bpe import (
        bpe_encode_counts,
        bpe_train,
        rules_of,
    )

    texts = [
        "the theater thesis then these theme the the",
        "low lower lowest low low slow slowly",
        "new newer newest news new new",
        "the lower the newer the slower",
        "aaaa aaa aa aaaa aaa",
        "",  # empty doc -> 0 tokens
        "   ",  # whitespace-only doc -> 0 tokens
    ] * 2
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    merges = bpe_train(ds, n_merges=10)
    rules = rules_of(merges)

    got = (
        bpe_encode_counts(ds, merges)
        .to_pandas()
        .sort_values("doc_id")["n_bpe_tokens"]
        .tolist()
    )

    EOW = 0x10FFFF

    def ref_encode_word(word):
        seq = [ord(c) for c in word] + [EOW]
        for a, b, new_id in rules:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return len(seq)

    want = [sum(ref_encode_word(w) for w in t.split()) for t in texts]
    assert got == want
    assert want[5] == 0 and want[6] == 0  # empty/whitespace docs
    # merges actually compress: encoded shorter than raw symbol count
    raw = [sum(len(w) + 1 for w in t.split()) for t in texts]
    assert sum(got) < sum(raw)


def test_incremental_dedup_store(ray_session, tmp_path):
    """Store-write + probe: planted cross-shard duplicates resolve to the
    corpus' min-id representative; fresh texts pass clean; bucket misses
    (empty store buckets) are handled."""
    import ray.data

    from python_rasterstats_ray.stages.dedup import (
        dedup_against_store,
        dedup_store_write,
    )

    corpus_texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon zeta"]
    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(corpus_texts, pa.string()),
        }
    )
    shard = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": pa.array(
                ["alpha beta", "brand new text", "epsilon zeta", "another fresh one"],
                pa.string(),
            ),
        }
    )
    store = str(tmp_path / "store")
    dedup_store_write(ray.data.from_arrow(corpus).repartition(2), store, n_buckets=4)
    out = (
        dedup_against_store(ray.data.from_arrow(shard).repartition(3), store, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [10, 11, 12, 13]
    assert out["is_dup"].tolist() == [True, False, True, False]
    # "alpha beta" appears twice in the corpus (ids 0 and 2): min wins
    assert out["dup_of"].tolist() == [0, -1, 3, -1]


def test_range_partitioned_store(ray_session, tmp_path):
    """Range store: write clusters rows by key; read_range prunes to the
    overlapping partitions only (verified by directory count), exact
    re-filter recovers precisely the window; empty window -> 0 rows."""
    import os

    import ray.data

    from python_rasterstats_ray.stages.bucketed import (
        read_range,
        write_range_partitioned,
    )

    n = 4000
    tbl = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "payload": pa.array(np.arange(n, dtype=np.int64) * 7, pa.int64()),
        }
    )
    store = str(tmp_path / "rstore")
    bounds = write_range_partitioned(
        ray.data.from_arrow(tbl).repartition(5), "k", n_parts=8, path=store
    )
    assert len(bounds) >= 4  # KLL cut points materialized
    parts = [d for d in os.listdir(store) if d.startswith("part=")]
    assert len(parts) >= 4

    # narrow window: must touch a strict subset of partitions
    lo, hi = 100, 300
    ds = read_range(store, lo, hi)
    rows = ds.to_pandas()
    got = rows[(rows["k"] >= lo) & (rows["k"] < hi)].sort_values("k")
    assert got["k"].tolist() == list(range(lo, hi))
    assert (got["payload"].to_numpy() == got["k"].to_numpy() * 7).all()
    # pruning really happened: the un-pruned store holds all n rows
    assert len(rows) < n

    # window beyond the store
    assert read_range(store, 10 * n, 11 * n).count() == 0


def test_epoch_shuffle_matches_sequential(ray_session):
    """Distributed epoch shuffle == argsort of splitmix64 keys, and the
    result is invariant across input repartitionings (the exchange plan
    must not leak block layout into positions)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.ordering import epoch_shuffle, shuffle_keys

    rng = np.random.default_rng(3)
    ids = rng.permutation(5000).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})

    # sequential reference: rank in ascending key order
    keys = shuffle_keys(ids, seed=7)
    order = np.argsort(keys, kind="stable")
    ref = np.empty(len(ids), np.int64)
    ref[order] = np.arange(len(ids), dtype=np.int64)
    ref_by_id = dict(zip(ids.tolist(), ref.tolist()))

    for nblocks in (1, 3, 17):
        out = (
            epoch_shuffle(ray.data.from_arrow(tbl).repartition(nblocks), seed=7)
            .to_pandas()
        )
        assert len(out) == len(ids)
        assert out["doc_id"].is_monotonic_increasing
        got = dict(zip(out["doc_id"].astype(int), out["epoch_pos"].astype(int)))
        assert got == ref_by_id
        # a permutation: every position exactly once
        assert sorted(out["epoch_pos"]) == list(range(len(ids)))

    # different seed -> different permutation (overwhelmingly)
    out2 = epoch_shuffle(ray.data.from_arrow(tbl), seed=8).to_pandas()
    got2 = dict(zip(out2["doc_id"].astype(int), out2["epoch_pos"].astype(int)))
    assert got2 != ref_by_id

    # empty corpus -> empty result with the full schema (Dataset.schema();
    # to_pandas() on a zero-block dataset drops columns, a Ray quirk)
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    ds3 = epoch_shuffle(ray.data.from_arrow(empty), seed=7)
    assert ds3.schema().names == ["doc_id", "epoch_pos"]
    assert ds3.count() == 0


def test_semantic_dedup_matches_sequential(ray_session):
    """SemDeDup: distributed (kmeans assign -> in-cluster cosine prune)
    must match an independent sequential reference exactly, be invariant
    across block layouts, and drop planted near-duplicate clones while
    keeping their lower-id originals."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.dedup import semantic_dedup
    from python_rasterstats_ray.stages.similarity import KMEANS_SCALE

    rng = np.random.default_rng(11)
    n_base, d, k, iters, tau = 120, 16, 4, 5, 0.95
    base = rng.standard_normal((n_base, d))
    # plant clones: ids n_base.. are tiny perturbations of base rows
    clones = base[:20] + 1e-4 * rng.standard_normal((20, d))
    x = np.vstack([base, clones])
    ids = np.arange(len(x), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float64())),
        }
    )

    # ---- independent sequential reference (same integer semantics)
    xm = np.round(x * KMEANS_SCALE).astype(np.int64)
    ref_c = xm[:k].copy()
    for _ in range(iters):
        scores = np.sum(ref_c * ref_c, axis=1)[None, :] - 2 * (xm @ ref_c.T)
        assign = np.argmin(scores, axis=1)
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, assign, xm)
        cnt = np.bincount(assign, minlength=k)
        nz = cnt > 0
        ref_c[nz] = np.floor_divide(sums[nz], cnt[nz][:, None])
    scores = np.sum(ref_c * ref_c, axis=1)[None, :] - 2 * (xm @ ref_c.T)
    assign = np.argmin(scores, axis=1)
    unit = x / np.linalg.norm(x, axis=1, keepdims=True)
    ref_keep = np.ones(len(x), bool)
    for c in range(k):
        m = np.flatnonzero(assign == c)
        if len(m) < 2:
            continue
        sim = unit[m] @ unit[m].T
        ref_keep[m] = ~(np.tril(sim, k=-1) >= tau).any(axis=1)

    for nblocks in (1, 5):
        out = (
            semantic_dedup(
                ray.data.from_arrow(tbl).repartition(nblocks),
                k=k, n_iter=iters, threshold=tau,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(x)
        assert np.array_equal(out["cluster_id"].to_numpy(), assign[out["vec_id"]])
        assert np.array_equal(out["keep"].to_numpy(), ref_keep[out["vec_id"]])

    keep_by_id = dict(zip(out["vec_id"].astype(int), out["keep"]))
    # every planted clone is in its original's cluster neighborhood:
    # clone dropped, original (lower id, no lower near-dup) kept
    dropped = [i for i in range(n_base, len(x)) if not keep_by_id[i]]
    assert len(dropped) >= 15  # most clones land in the same cluster
    assert all(keep_by_id[i - n_base] for i in dropped)


def test_corpus_mix_matches_sequential(ray_session):
    """Deterministic mixture selection == per-domain smallest-shuffle-key
    quota fill, invariant across block layouts; undersized domains
    contribute everything they have."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.ordering import corpus_mix, shuffle_keys

    rng = np.random.default_rng(5)
    langs = np.array(["en"] * 300 + ["de"] * 100 + ["fr"] * 8 + ["xx"] * 50)
    rng.shuffle(langs)
    ids = np.arange(len(langs), dtype=np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )
    weights, budget = {"en": 0.5, "de": 0.3, "fr": 0.2}, 100  # fr quota 20 > 8 docs

    # sequential reference
    key = shuffle_keys(ids, seed=7)
    ref: set[tuple[int, str]] = set()
    for g, w in weights.items():
        q = int(w * budget)
        m = np.flatnonzero(langs == g)
        take = m[np.argsort(key[m], kind="stable")[:q]]
        ref.update((int(i), g) for i in take)

    for nblocks in (1, 6):
        out = (
            corpus_mix(
                ray.data.from_arrow(tbl).repartition(nblocks), weights, budget, seed=7
            )
            .to_pandas()
        )
        got = set(zip(out["doc_id"].astype(int), out["lang"]))
        assert got == ref
        assert out["doc_id"].is_monotonic_increasing
    # quotas: en=50, de=30, fr=all 8; 'xx' (unweighted) contributes 0
    counts = out["lang"].value_counts()
    assert counts["en"] == 50 and counts["de"] == 30 and counts["fr"] == 8
    assert "xx" not in counts


def test_token_budget_fill_matches_sequential(ray_session):
    """Grouped ordered prefix-sum curation == sequential walk per domain
    in shuffle-key order, invariant across block layouts; unbudgeted
    domains contribute nothing."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.ordering import shuffle_keys, token_budget_fill

    rng = np.random.default_rng(9)
    n = 600
    langs = np.array(["en"] * 350 + ["de"] * 200 + ["xx"] * 50)
    rng.shuffle(langs)
    ids = np.arange(n, dtype=np.int64)
    toks = rng.integers(1, 200, n).astype(np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "n_tokens": pa.array(toks, pa.int64()),
        }
    )
    budgets = {"en": 5000, "de": 2500}

    # exact reference: keep iff cum_before (over ALL docs in order) + n <= b
    key = shuffle_keys(ids, seed=7)
    ref: set[int] = set()
    for g, b in budgets.items():
        m = np.flatnonzero(langs == g)
        m = m[np.argsort(key[m], kind="stable")]
        before = np.concatenate(([0], np.cumsum(toks[m])[:-1]))
        ref.update(int(i) for i in m[before + toks[m] <= b])

    for nblocks in (1, 6):
        out = (
            token_budget_fill(
                ray.data.from_arrow(tbl).repartition(nblocks), budgets, seed=7
            )
            .to_pandas()
        )
        assert set(out["doc_id"].astype(int)) == ref
        assert out["doc_id"].is_monotonic_increasing
        assert "xx" not in set(out["lang"])
        # per-domain token sums within budget
        sums = out.groupby("lang")["n_tokens"].sum()
        assert all(sums[g] <= budgets[g] for g in sums.index)


def test_image_phash_dups_matches_sequential(ray_session):
    """Perceptual-hash image dedup: distributed band-bucket plan == a
    sequential reference applying the same banding candidate rule;
    planted pixel-identical re-encodes (different PNG filter) surface at
    distance 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.sources.png import png_encode
    from python_rasterstats_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        image_phash_dups,
        phash64,
        synth_png_media_table,
    )

    base = synth_png_media_table(24, size=(64, 48), seed=4)
    # plant: ids 24..29 are pixel-identical re-encodes of ids 0..5 with a
    # different filter type (same decoded pixels -> same phash)
    payloads, ids = [], []
    for i in range(6):
        img = decode_image(base["payload"][i].as_py(), 64, 48)
        payloads.append(png_encode(img, filter_type=(i + 1) % 5))
        ids.append(24 + i)
    clones = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["png"] * 6, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(6, 64, np.int32)),
            "height": pa.array(np.full(6, 48, np.int32)),
            "sample_rate": pa.array(np.zeros(6, np.int32)),
            "n_frames": pa.array(np.ones(6, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )
    tbl = pa.concat_tables([base, clones])

    # sequential reference: same hashes, same banding candidate rule
    tau = 6
    hashes = {}
    for row in range(len(tbl)):
        img = decode_image(tbl["payload"][row].as_py(), 64, 48)
        hashes[int(tbl["media_id"][row].as_py())] = phash64(img)
    ref = {}
    keys = sorted(hashes)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            x = hashes[a] ^ hashes[b]
            shares_band = any(((x >> (8 * k)) & 0xFF) == 0 for k in range(8))
            d = bin(x).count("1")
            if shares_band and d <= tau:
                ref[(a, b)] = d

    for nblocks in (1, 4):
        out = (
            image_phash_dups(
                ray.data.from_arrow(tbl).repartition(nblocks), max_distance=tau
            )
            .to_pandas()
        )
        got = {
            (int(r.id_a), int(r.id_b)): int(r.distance) for r in out.itertuples()
        }
        assert got == ref
    # every planted re-encode found at distance 0
    for i in range(6):
        assert ref[(i, 24 + i)] == 0


def test_heavy_hitters_exact(ray_session):
    """Two-pass heavy hitters == exact GROUP BY/HAVING: a word
    concentrated in ONE block (locally heavy nowhere else) is still
    found (the averaging guarantee), thresholds are >= inclusive, and
    the result is layout-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.sketch import heavy_hitters

    # corpus: 100 docs x 10 filler words, plus "rare" appearing 34 times
    # all inside doc 0 (globally heavy at phi=1/33 over N=1034+, locally
    # heavy only in doc 0's block), plus "edge" at exactly the threshold
    rng = np.random.default_rng(2)
    fillers = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(fillers, 10)) for _ in range(100)]
    docs[0] = " ".join(["rare"] * 40) + " " + docs[0]
    tbl = pa.table({"text": pa.array(docs, pa.string())})

    # exact reference
    from collections import Counter

    words = [w for d in docs for w in d.split(" ")]
    total = len(words)
    cnt = Counter(words)
    ref = {w: c for w, c in cnt.items() if c * 33 >= total}
    assert "rare" in ref  # the planted concentrated word qualifies

    for nblocks in (1, 10):
        out = (
            heavy_hitters(
                ray.data.from_arrow(tbl).repartition(nblocks), 1, 33
            ).to_pandas()
        )
        got = dict(zip(out["word"], out["n"].astype(int)))
        assert got == ref


def test_epoch_shuffle_property_extreme_ids(ray_session):
    """Property sweep: arbitrary unique int64 ids (negative, huge,
    adjacent) still produce a valid, reference-matching permutation —
    splitmix64 is bijective so no ties exist."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.ordering import epoch_shuffle, shuffle_keys

    rng = np.random.default_rng(17)
    for trial in range(3):
        ids = np.unique(
            np.concatenate(
                [
                    rng.integers(-(2**62), 2**62, 800, dtype=np.int64),
                    np.array(
                        [0, 1, -1, 2**63 - 1, -(2**63), 42, 43], dtype=np.int64
                    ),
                ]
            )
        )
        rng.shuffle(ids)
        keys = shuffle_keys(ids, seed=trial)
        assert len(np.unique(keys)) == len(ids)  # bijective on the sample
        order = np.argsort(keys, kind="stable")
        ref = {int(ids[order[i]]): i for i in range(len(ids))}

        tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
        out = epoch_shuffle(
            ray.data.from_arrow(tbl).repartition(1 + trial * 3), seed=trial
        ).to_pandas()
        got = dict(zip(out["doc_id"].astype(int), out["epoch_pos"].astype(int)))
        assert got == ref


def test_ivfpq_store_matches_sequential(ray_session, tmp_path):
    """IVF-PQ store (fused assign+encode, partitioned write, probe-pruned
    integer ADC scan) == a sequential IVFADC reference: same coarse
    routing, same codes, same per-query restricted top-k; only probed
    partitions' files exist/are read."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.similarity import (
        KMEANS_SCALE,
        ivfpq_write_partitioned,
        knn_ivfpq_from_store,
        pq_train_int,
        train_centroids,
        _unit_rows,
    )

    rng = np.random.default_rng(23)
    n, d = 400, 16
    x = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    cents = train_centroids(ds, n_centroids=6)
    books = pq_train_int(ds, n_subspaces=4, n_codes=8, n_iter=4)

    store = str(tmp_path / "ivfpq")
    ivfpq_write_partitioned(ds, cents, books, store)
    assert any(p.startswith("ivf_list=") for p in os.listdir(store))

    qids = np.array([3, 77, 201], np.int64)
    qmat = x[qids]
    nprobe, k = 3, 5
    out = (
        knn_ivfpq_from_store(store, (qids, qmat), cents, books, k=k, nprobe=nprobe)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )

    # sequential IVFADC reference
    assign = np.argmax(_unit_rows(x) @ cents.T, axis=1)
    xm = np.round(x * KMEANS_SCALE).astype(np.int64)
    ns, nc, dsub = books.shape
    codes = np.zeros((n, ns), np.int64)
    for s in range(ns):
        xs = xm[:, s * dsub : (s + 1) * dsub]
        scores = np.sum(books[s] * books[s], axis=1)[None, :] - 2 * (xs @ books[s].T)
        codes[:, s] = np.argmin(scores, axis=1)
    qm = np.round(qmat * KMEANS_SCALE).astype(np.int64)
    probes = np.argsort(-(_unit_rows(qmat) @ cents.T), axis=1)[:, :nprobe]
    for j, qid in enumerate(qids):
        mask = np.isin(assign, probes[j])
        mids = np.arange(n)[mask]
        lut = np.empty((ns, nc), np.int64)
        for s in range(ns):
            diff = qm[j, s * dsub : (s + 1) * dsub][None, :] - books[s]
            lut[s] = np.sum(diff * diff, axis=1)
        dist = lut[np.arange(ns)[None, :], codes[mask]].sum(axis=1)
        top = np.lexsort((mids, dist))[:k]
        sub = out[out["query_id"] == qid]
        assert sub["neighbor_id"].tolist() == mids[top].tolist()
        assert sub["adc_dist"].tolist() == dist[top].tolist()


def test_winnow_fingerprints_matches_sequential(ray_session):
    """Distributed winnowing vs a per-doc sequential reference (the
    Schleimer et al. definition verbatim), incl. rightmost-tie windows
    (repeated grams), short docs (< w grams -> none) and the shared-
    substring guarantee."""
    import hashlib

    import ray.data

    from python_rasterstats_ray.stages.text import winnow_fingerprints

    K, W = 3, 4
    texts = [
        "a b c d e f g h i j",                 # plain
        "x y x y x y x y x y x y",             # repeated grams: tie-breaks
        "a b c",                                # exactly one gram, no window
        "q r",                                  # no grams at all
        "m n o p q r s t a b c d e f",          # shares 'a b c d e f' with doc 0
        "",                                     # empty
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )

    ref = set()
    for d, t in enumerate(texts):
        toks = t.split(" ")
        fps = [hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()
               for i in range(len(toks) - K + 1)]
        for s in range(len(fps) - W + 1):
            win = fps[s : s + W]
            mn = min(win)
            pos = s + max(j for j, f in enumerate(win) if f == mn)
            ref.add((d, pos, fps[pos]))

    for nblocks in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = ds.map_batches(
            lambda b: winnow_fingerprints(b, k=K, w=W),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        got = {(r["doc_id"], r["pos"], r["fp"])
               for b in out.iter_batches(batch_format="pyarrow")
               for r in b.to_pylist()}
        assert got == ref

    # guarantee: docs 0 and 4 share a 6-word (k + w - 1) substring ->
    # they must share at least one fingerprint hash
    f0 = {fp for d, _p, fp in ref if d == 0}
    f4 = {fp for d, _p, fp in ref if d == 4}
    assert f0 & f4


def test_events_funnel_partial_paths(ray_session, tmp_path):
    """Funnel ordering edge cases the fixture corpus can't exercise
    (every sf user completes all 3 steps): purchase BEFORE click doesn't
    count, equal timestamps are excluded by the strict >, and users stop
    at every depth 0-3."""
    import pandas as pd

    from python_rasterstats_ray.pipelines.queries import q_events_funnel

    us = 1_000_000
    rows = [
        # user 0: full ordered funnel
        (1, 10 * us, 0, "view"), (2, 20 * us, 0, "click"), (3, 30 * us, 0, "purchase"),
        # user 1: purchase before click -> step 2 only
        (4, 10 * us, 1, "view"), (5, 30 * us, 1, "click"), (6, 20 * us, 1, "purchase"),
        # user 2: click at the SAME us as view -> strict > excludes it
        (7, 10 * us, 2, "view"), (8, 10 * us, 2, "click"),
        # user 3: no view at all -> step 0 despite later events
        (9, 10 * us, 3, "click"), (10, 20 * us, 3, "purchase"),
        # user 4: two views; funnel anchors on the EARLIEST
        (11, 50 * us, 4, "view"), (12, 5 * us, 4, "view"),
        (13, 10 * us, 4, "click"), (14, 11 * us, 4, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["value"] = 1.0
    df["props"] = ""
    path = str(tmp_path / "events.parquet")
    df.to_parquet(path)

    got = (
        pa.concat_tables(
            q_events_funnel(str(tmp_path)).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert got.loc[0, "step_reached"] == 3
    assert got.loc[0, "t3_us"] == 30 * us
    assert got.loc[1, "step_reached"] == 2
    assert np.isnan(got.loc[1, "t3_us"])
    assert got.loc[2, "step_reached"] == 1
    assert np.isnan(got.loc[2, "t2_us"])
    assert got.loc[3, "step_reached"] == 0
    assert np.isnan(got.loc[3, "t1_us"])
    assert got.loc[4, "step_reached"] == 3
    assert got.loc[4, "t1_us"] == 5 * us
    assert got.loc[4, "t2_us"] == 10 * us


def test_events_anomaly_degenerate_types(ray_session, tmp_path):
    """Degenerate event types must not crash the moment fold (regression:
    n==1 divided by zero; a constant type's float-rounded variance could go
    negative into sqrt; sd==0 produced inf z). Single-event and
    constant-valued types flag nothing; a genuine outlier still flags."""
    import pandas as pd

    from python_rasterstats_ray.pipelines.queries import q_events_anomaly

    us = 1_000_000
    rows = [
        (1, "solo", 42.0),            # n == 1: sd undefined
        (2, "const", 7.77), (3, "const", 7.77), (4, "const", 7.77),  # sd == 0
    ]
    # 'normal': 20 values at 10.0 plus one far outlier
    rows += [(10 + i, "normal", 10.0 + (i % 2) * 0.02) for i in range(20)]
    rows += [(99, "normal", 1000.0)]
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
    df["ts"] = pd.to_datetime(df["event_id"] * us, unit="us")
    df["user_id"] = 0
    df["props"] = ""
    df.to_parquet(str(tmp_path / "events.parquet"))

    got = q_events_anomaly(str(tmp_path)).to_pandas()
    assert list(got["event_id"]) == [99]
    assert got["event_type"].iloc[0] == "normal"
    assert got["z"].iloc[0] > 3.0


def test_cdc_chunks_shift_invariance(ray_session):
    """The content-defined property: a long shared run chunks into the
    SAME interior chunk hashes even when one doc shifts it by an
    arbitrary prefix — the fixed-size chunker's failure mode. Also:
    short docs (< k bytes) are one chunk; empty docs emit nothing;
    chunks tile the doc exactly."""
    import ray.data

    from python_rasterstats_ray.stages.text import cdc_chunks

    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 8
    texts = [
        shared,
        "PREFIX-OF-DIFFERENT-LENGTH " + shared,
        "tiny",
        "",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = pa.concat_tables(
        ray.data.from_arrow(tbl)
        .map_batches(lambda b: cdc_chunks(b), batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    ).to_pandas()

    # tiling: chunks cover each doc exactly, in order
    for d, t in enumerate(texts):
        g = out[out["doc_id"] == d].sort_values("chunk_idx")
        if not t:
            assert len(g) == 0
            continue
        assert g["start"].iloc[0] == 0
        assert (g["start"] + g["len"]).iloc[-1] == len(t.encode())
        assert (g["start"].to_numpy()[1:] ==
                (g["start"] + g["len"]).to_numpy()[:-1]).all()
    assert out[out["doc_id"] == 2]["len"].tolist() == [4]  # < k: one chunk

    h0 = set(out[out["doc_id"] == 0]["chunk_md5"])
    h1 = set(out[out["doc_id"] == 1]["chunk_md5"])
    common = h0 & h1
    # interior chunks of the shared run realign despite the shift
    assert len(common) >= max(len(h0), len(h1)) - 2, (h0, h1)
    assert len(h0) >= 3  # the run actually split into several chunks


def test_edit_distance_matches_duckdb():
    """Vectorized Levenshtein DP vs DuckDB's levenshtein on random
    strings incl. empties and equal strings."""
    import random

    import duckdb

    from python_rasterstats_ray.stages.dedup import edit_distance

    random.seed(7)
    con = duckdb.connect()
    cases = [("", ""), ("", "abc"), ("abc", ""), ("same same", "same same"),
             # non-ASCII: codepoint (not byte) semantics — DuckDB parity
             ("naïve", "naive"), ("héllo wörld", "hello world"),
             ("日本語テキスト", "日本語のテキスト"), ("αβγδ", "αβζδ"),
             ("éclair", "éclair")]  # combining mark vs precomposed
    for _ in range(150):
        n1, n2 = random.randint(0, 15), random.randint(0, 15)
        cases.append(
            ("".join(random.choice("abcd ") for _ in range(n1)),
             "".join(random.choice("abcd ") for _ in range(n2)))
        )
    for _ in range(80):
        n1, n2 = random.randint(0, 12), random.randint(0, 12)
        cases.append(
            ("".join(random.choice("abé日χ ") for _ in range(n1)),
             "".join(random.choice("abé日χ ") for _ in range(n2)))
        )
    for a, b in cases:
        ref = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert edit_distance(a, b) == ref, (a, b)


def test_jaro_winkler_matches_duckdb():
    """From-scratch Jaro-Winkler vs DuckDB's jaro_winkler_similarity:
    classic textbook pairs plus 300 random cases, 1e-9 agreement
    (matched-sequence transposition rule, empty-side -> 0 convention,
    prefix boost gated at jaro > 0.7)."""
    import random

    import duckdb

    from python_rasterstats_ray.stages.dedup import jaro_winkler

    random.seed(13)
    con = duckdb.connect()
    cases = [("", ""), ("abc", ""), ("martha", "marhta"),
             ("dwayne", "duane"), ("dixon", "dicksonx"), ("same", "same"),
             ("naïve", "naive"), ("日本語テキスト", "日本語のテキスト"),
             ("αβγδ", "αβζδ")]
    for _ in range(300):
        n1, n2 = random.randint(0, 16), random.randint(0, 16)
        cases.append(("".join(random.choice("abcd ") for _ in range(n1)),
                      "".join(random.choice("abcd ") for _ in range(n2))))
    for _ in range(100):
        n1, n2 = random.randint(0, 12), random.randint(0, 12)
        cases.append(("".join(random.choice("abé日χ ") for _ in range(n1)),
                      "".join(random.choice("abé日χ ") for _ in range(n2))))
    for a, b in cases:
        ref = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(jaro_winkler(a, b) - ref) <= 1e-9, (a, b)


def test_orders_skyline_layout_invariant(ray_session, tmp_path):
    """Skyline edge cases the fixture can't pin: ties on BOTH dims keep
    all tied rows, within-group later dates are dominated, and the
    per-block partial prune is layout-invariant (dominance pairs split
    across blocks still resolve in the final prune)."""
    import pandas as pd

    from python_rasterstats_ray.pipelines.queries import q_orders_skyline

    rows = [
        # (orderkey, price, date_day) — pareto front on (price max, date min)
        (1, 100.00, 5),
        (2, 100.00, 5),   # exact tie with 1 on both dims: both survive
        (3, 100.00, 6),   # same price, later date: dominated by 1/2
        (4, 90.00, 1),    # lower price but earliest date: survives
        (5, 95.00, 3),    # middle: survives (nothing >=95 with date <=3)
        (6, 95.00, 4),    # dominated by 5
        (7, 80.00, 2),    # dominated by 4 (90 >= 80, 1 <= 2, strict)
        (8, 101.00, 9),   # highest price: survives
    ]
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_totalprice", "day"])
    df["o_orderdate"] = pd.to_datetime("2000-01-01") + pd.to_timedelta(df["day"], unit="D")
    df["o_custkey"] = 0
    df["o_orderstatus"] = "O"
    df["o_orderpriority"] = "1"
    df = df.drop(columns=["day"])
    df.to_parquet(str(tmp_path / "orders.parquet"))
    got = (
        pa.concat_tables(
            q_orders_skyline(str(tmp_path)).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .sort_values("o_orderkey")
    )
    assert got["o_orderkey"].tolist() == [1, 2, 4, 5, 8]


def test_convex_hull_properties(ray_session):
    """Distributed strict hull: hand-built shape with collinear edge
    points (excluded), plus property checks on a random integer set —
    every vertex is an input point, the polygon is strictly convex, all
    inputs lie inside-or-on it, every vertex is extreme (removing it
    shrinks the hull), and the result is layout-invariant."""
    import ray.data

    from python_rasterstats_ray.stages.ordering import convex_hull_points

    def hull_of(arr, nblocks):
        tbl = pa.table(
            {"x": pa.array(arr[:, 0], pa.int64()), "y": pa.array(arr[:, 1], pa.int64())}
        )
        out = convex_hull_points(ray.data.from_arrow(tbl).repartition(nblocks))
        return np.stack(
            [out["x"].to_numpy().astype(np.int64), out["y"].to_numpy().astype(np.int64)],
            axis=1,
        )

    # hand case: unit square scaled, with edge midpoints (collinear ->
    # excluded) and interior points
    sq = np.array([[0, 0], [0, 10], [10, 0], [10, 10],
                   [5, 0], [0, 5], [10, 5], [5, 10],  # edge midpoints
                   [3, 4], [7, 2], [5, 5]])           # interior
    got = hull_of(sq, 3)
    assert sorted(map(tuple, got)) == [(0, 0), (0, 10), (10, 0), (10, 10)]

    rng = np.random.default_rng(23)
    pts = rng.integers(0, 1000, size=(500, 2)).astype(np.int64)

    def inside_or_on(hull_ccw, p):
        n = len(hull_ccw)
        for i in range(n):
            ax, ay = hull_ccw[i]
            bx, by = hull_ccw[(i + 1) % n]
            if (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) < 0:
                return False
        return True

    def ccw_order(h):
        c = h.mean(axis=0)
        ang = np.arctan2(h[:, 1] - c[1], h[:, 0] - c[0])
        return h[np.argsort(ang)]

    for nblocks in (1, 4):
        h = hull_of(pts, nblocks)
        hs = {tuple(v) for v in h}
        assert hs <= {tuple(p) for p in pts}          # vertices are inputs
        hc = ccw_order(h)
        n = len(hc)
        for i in range(n):  # strict convexity: every turn strictly left
            a, b, c = hc[i], hc[(i + 1) % n], hc[(i + 2) % n]
            assert (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) > 0
        for p in pts:
            assert inside_or_on(hc, p)
        for i in range(n):  # extremality: dropping a vertex shrinks the hull
            rest = np.array([p for p in pts if tuple(p) != tuple(hc[i])])
            h2 = hull_of(rest, 1)
            assert tuple(hc[i]) not in {tuple(v) for v in h2}
    assert {tuple(v) for v in hull_of(pts, 1)} == {tuple(v) for v in hull_of(pts, 4)}


def test_minhash_signatures_batch_bit_identical():
    """signatures_batch must equal the per-doc reference path bitwise,
    including multi-chunk splits, padded short docs, and empty text."""
    import random
    import string

    import numpy as np

    from python_rasterstats_ray.stages.dedup import MinHashKernel

    k = MinHashKernel()
    rnd = random.Random(7)
    texts = ["", "ab", "hello world " * 3] + [
        "".join(rnd.choices(string.ascii_lowercase + " ", k=rnd.randint(1, 300)))
        for _ in range(120)
    ]
    ref = np.stack([k.signature(t) for t in texts])
    assert (k.signatures_batch(texts) == ref).all()
    k._CHUNK_BYTES = 256  # force many sub-chunks incl. single-doc ones
    assert (k.signatures_batch(texts) == ref).all()
    assert k.signatures_batch([]).shape == (0, k.num_perm)


def test_grouped_pairs_table_matches_per_group_reference():
    """Vectorized within-group pair generation == per-group triu/chain."""
    import numpy as np
    import pyarrow as pa

    from python_rasterstats_ray.stages.dedup import grouped_pairs_table

    rng = np.random.default_rng(3)
    key = rng.integers(0, 40, size=600).astype(np.int64)
    ids = rng.integers(0, 80, size=600).astype(np.int64)
    t = pa.table({"k": pa.array(key), "doc_id": pa.array(ids)})
    for cap in (None, 4):
        got = grouped_pairs_table(t, "k", "doc_id", cap=cap)
        got_set = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
        want = set()
        for kk in np.unique(key):
            u = np.unique(ids[key == kk])
            if len(u) < 2:
                continue
            if cap is not None and len(u) > cap:
                want |= set(zip(u[:-1].tolist(), u[1:].tolist()))
            else:
                ia, ib = np.triu_indices(len(u), k=1)
                want |= set(zip(u[ia].tolist(), u[ib].tolist()))
        assert got_set == want
        # within ONE key group no pair repeats (cross-group repeats are
        # expected — the same pair may collide under several keys, and
        # the downstream distinct handles them, as with LSH bands)
        one = pa.table(
            {"k": pa.array(np.zeros(600, np.int64)), "doc_id": pa.array(ids)}
        )
        g1 = grouped_pairs_table(one, "k", "doc_id", cap=cap)
        assert len(g1) == len(
            set(zip(g1["id_a"].to_pylist(), g1["id_b"].to_pylist()))
        )
    empty = grouped_pairs_table(t.slice(0, 0), "k", "doc_id")
    assert len(empty) == 0 and empty.column_names == ["id_a", "id_b"]
