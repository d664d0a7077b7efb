"""Distributed BPE tokenizer training on Ray Data.

Training a byte-pair-encoding vocabulary is a canonical step of a
100-TB corpus pipeline (Sennrich et al. 2016, public): iteratively
merge the most frequent adjacent symbol pair. The classic trick makes
it tractable — train on the WORD-FREQUENCY table, not the corpus:

  1. ONE exchange: documents -> per-block word-count partials ->
     groupby(word) sum. Distinct words follow Zipf's law, so the word
     table is orders of magnitude smaller than the corpus and shards
     naturally.
  2. K merge supersteps over the PINNED word table, each with ZERO
     shuffles: per-block vectorized pair counting (numpy over Arrow
     list offsets — no per-word Python in the hot path) -> tree-sum of
     sparse pair-count partials (the zonal tree-reduce pattern) ->
     argmax pair on the driver (deterministic tie-break) -> merge rule
     broadcast via ray.put -> per-block vectorized merge apply.

Scale bounds, stated: the word table is a Dataset (never driver-held);
the driver sees only the tree-reduced pair-count table per superstep
(bounded by distinct adjacent pairs — Zipf-small; at worst
|alphabet + merges|^2) and the O(1) merge rule. Symbols are int64
codepoint ids; merged symbols take ids above 0x110000, so pair keys
pack into one int64.

Determinism: ties on pair frequency break toward the smallest packed
key, so the merge sequence is reproducible and differential-testable
against a sequential reference implementation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERGE_BASE = 0x110000  # first id above any unicode codepoint
_EOW = _MERGE_BASE - 1  # end-of-word marker (a non-character codepoint)


def word_frequencies(docs_ds, text_col: str = "text"):
    """documents -> Dataset(word:string, cnt:int64) via per-block
    partial counts + one groupby exchange."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern_regex(batch[text_col], r"\s+")
        )
        words = words.filter(pc.not_equal(words, ""))
        t = pa.table({"word": words})
        g = t.group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "cnt"])

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("cnt"))
        .map_batches(
            lambda t: pa.table({"word": t["word"], "cnt": t["sum(cnt)"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def _words_to_seqs(batch: pa.Table) -> pa.Table:
    """word string -> list<int64> of codepoints + end-of-word marker."""
    if len(batch) == 0 or "word" not in batch.column_names:
        return pa.table(
            {
                "seq": pa.array([], pa.list_(pa.int64())),
                "cnt": pa.array([], pa.int64()),
            }
        )
    words = batch["word"].to_pylist()
    flat: list[int] = []
    offsets = [0]
    for wtext in words:
        flat.extend(ord(ch) for ch in wtext)
        flat.append(_EOW)
        offsets.append(len(flat))
    seqs = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.int64())
    )
    return pa.table({"seq": seqs, "cnt": batch["cnt"]})


def _pair_counts(batch: pa.Table, key_base: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized adjacent-pair counting over one block: Arrow list
    offsets + numpy only. Returns (packed pair keys, weighted counts)."""
    if len(batch) == 0 or "seq" not in batch.column_names:
        # empty shuffle partitions emit zero-row bare-schema blocks
        return np.empty(0, np.int64), np.empty(0, np.int64)
    seq = batch["seq"].combine_chunks()
    flat = seq.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = seq.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    left, right = flat[:-1], flat[1:]
    # weight of the pair at position i = count of the word containing it
    word_of = np.searchsorted(offs, np.arange(len(flat) - 1), side="right") - 1
    valid = np.ones(len(flat) - 1, bool)
    valid[offs[1:-1] - 1] = False  # pairs spanning a word boundary
    keys = left[valid] * key_base + right[valid]
    w = cnt[word_of[valid]]
    uk, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(uk), np.int64)
    np.add.at(sums, inv, w)
    return uk, sums


def _apply_merge(batch: pa.Table, a: int, b: int, new_id: int) -> pa.Table:
    """Replace non-overlapping leftmost-first (a,b) occurrences with
    new_id across all sequences of a block, vectorized except the tiny
    loop over overlap candidates."""
    if len(batch) == 0 or "seq" not in batch.column_names:
        return batch
    seq = batch["seq"].combine_chunks()
    flat = seq.values.to_numpy(zero_copy_only=False).astype(np.int64).copy()
    offs = seq.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) >= 2:
        hit = (flat[:-1] == a) & (flat[1:] == b)
        hit[offs[1:-1] - 1] = False  # never merge across word boundary
        pos = np.nonzero(hit)[0]
        if len(pos):
            if a == b:  # overlapping runs: keep leftmost-first alternates
                keep = []
                last = -2
                for p in pos:
                    if p != last + 1:
                        keep.append(p)
                        last = p
                pos = np.asarray(keep, np.int64)
            flat[pos] = new_id
            drop = np.zeros(len(flat), bool)
            drop[pos + 1] = True
            # new offsets: each sequence shrinks by its dropped count
            dropped_before = np.cumsum(drop)
            new_offs = offs - np.concatenate(([0], dropped_before))[offs]
            flat = flat[~drop]
            offs = new_offs
    seqs = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(flat, pa.int64())
    )
    return pa.table({"seq": seqs, "cnt": batch["cnt"]})


def bpe_train(docs_ds, n_merges: int = 20, text_col: str = "text") -> pa.Table:
    """Train ``n_merges`` BPE merges; returns an Arrow table
    (rank:int64, left:int64, right:int64, merged:int64, freq:int64)
    of symbol ids (codepoints below 0x110000 - 1; _EOW = 0x10FFFF;
    merged ids from 0x110000 + rank). Use ``merge_table_strings`` for a
    human-readable view."""
    import ray as _ray

    key_base = _MERGE_BASE + n_merges + 1
    words = word_frequencies(docs_ds, text_col=text_col)
    # the word table is pinned once as block refs; each superstep is then
    # ONE fused task wave (apply previous merge + count pairs of the new
    # blocks) + a tree-sum — raw tasks because the Dataset API cannot
    # re-map the same pinned blocks K times without a plan + executor
    # spin-up per superstep (measured 2.5 s/superstep of pure overhead
    # on tiny data; same justification as pagerank_broadcast)
    block_refs = list(
        words.map_batches(
            _words_to_seqs, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize()
        .to_arrow_refs()
    )

    @_ray.remote(num_returns=2)
    def _apply_and_count(tbl: pa.Table, rule, key_base: int):
        if rule is not None:
            a, b, new_id = rule
            tbl = _apply_merge(tbl, a, b, new_id)
        k, s = _pair_counts(tbl, key_base)
        return tbl, (k, s)

    @_ray.remote
    def _merge_partials(*pairs):
        return _combine([p[0] for p in pairs], [p[1] for p in pairs])

    def _combine(ks, ws):
        ks = [k for k in ks if len(k)]
        ws = [w for w in ws if len(w)]
        if not ks:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        allk = np.concatenate(ks)
        allw = np.concatenate(ws)
        uk, inv = np.unique(allk, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, allw)
        return uk, sums

    group = 16
    rules = []
    rule = None
    for rank in range(n_merges):
        new_refs, count_refs = [], []
        for ref in block_refs:
            tref, cref = _apply_and_count.remote(ref, rule, key_base)
            new_refs.append(tref)
            count_refs.append(cref)
        block_refs = new_refs
        futs = count_refs
        while len(futs) > 1:
            futs = [
                _merge_partials.remote(*futs[i : i + group])
                for i in range(0, len(futs), group)
            ]
        keys, counts = _ray.get(futs[0]) if futs else (np.empty(0, np.int64),) * 2
        if len(keys) == 0 or counts.max() < 2:
            break  # nothing left worth merging
        best = counts.max()
        cand = keys[counts == best]
        key = int(cand.min())  # deterministic tie-break: smallest packed key
        a, b = key // key_base, key % key_base
        new_id = _MERGE_BASE + rank
        rules.append((rank, a, b, new_id, int(best)))
        rule = (a, b, new_id)
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rules], pa.int64()),
            "left": pa.array([r[1] for r in rules], pa.int64()),
            "right": pa.array([r[2] for r in rules], pa.int64()),
            "merged": pa.array([r[3] for r in rules], pa.int64()),
            "freq": pa.array([r[4] for r in rules], pa.int64()),
        }
    )


def merge_table_strings(merges: pa.Table) -> pa.Table:
    """Symbol-id merge table -> human-readable strings by expanding
    merged ids recursively ('</w>' for the end-of-word marker)."""

    def expand(sym: int, lut: dict[int, str]) -> str:
        if sym in lut:
            return lut[sym]
        return "</w>" if sym == _EOW else chr(sym)

    lut: dict[int, str] = {}
    lefts, rights, tokens = [], [], []
    for rank in range(len(merges)):
        a = int(merges["left"][rank].as_py())
        b = int(merges["right"][rank].as_py())
        m = int(merges["merged"][rank].as_py())
        sa, sb = expand(a, lut), expand(b, lut)
        lut[m] = sa + sb
        lefts.append(sa)
        rights.append(sb)
        tokens.append(sa + sb)
    return pa.table(
        {
            "rank": merges["rank"],
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "token": pa.array(tokens, pa.string()),
            "freq": merges["freq"],
        }
    )


class BPEEncodeKernel:
    """map_batches kernel: apply a TRAINED merge table to documents and
    emit per-doc token counts — the tokenize step a training pipeline
    runs over the whole corpus after ``bpe_train``.

    Hot path stays vectorized via the distinct-word trick: each batch
    dictionary-encodes its words (Zipf: far fewer distinct words than
    occurrences), applies every merge rule to the DICTIONARY block only
    (the same ``_apply_merge`` numpy pass as training), then scatters
    the per-word token lengths back to documents with one integer
    ``np.add.at``. Token count = symbols remaining after all merges,
    including the end-of-word marker (the training representation).

    The rule table is O(n_merges) and travels by value in the actor
    constructor — no per-batch re-ship.
    """

    def __init__(self, rules: list[tuple[int, int, int]], text_col: str = "text"):
        self.rules = rules
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        words = pc.split_pattern_regex(batch[self.text_col], r"\s+")
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts.astype(np.int64))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        doc_idx = doc_idx[nonempty]
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dict_words = enc.dictionary.to_pylist()

        # distinct words -> codepoint seqs (+EOW), merges applied in rank order
        seq_flat: list[int] = []
        offsets = [0]
        for w in dict_words:
            seq_flat.extend(ord(ch) for ch in w)
            seq_flat.append(_EOW)
            offsets.append(len(seq_flat))
        tbl = pa.table(
            {
                "seq": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(seq_flat, pa.int64())
                ),
                "cnt": pa.array(np.ones(len(dict_words), np.int64), pa.int64()),
            }
        )
        for a, b, new_id in self.rules:
            tbl = _apply_merge(tbl, a, b, new_id)
        seq = tbl["seq"].combine_chunks()
        offs = seq.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_len = np.diff(offs)

        n_tokens = np.zeros(n, np.int64)
        if len(codes):
            np.add.at(n_tokens, doc_idx, tok_len[codes])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(n_tokens, pa.int64()),
            }
        )


def rules_of(merges: pa.Table) -> list[tuple[int, int, int]]:
    """Merge table (as returned by ``bpe_train``) -> rank-ordered
    (left, right, merged) rule list for the encode kernel."""
    return list(
        zip(
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
            merges["merged"].to_pylist(),
        )
    )


def bpe_encode_counts(docs_ds, merges: pa.Table, text_col: str = "text",
                      concurrency=None):
    """documents -> Dataset(doc_id, n_bpe_tokens) under a trained merge
    table; stateless per batch, no shuffle."""
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    return docs_ds.map_batches(
        BPEEncodeKernel,
        fn_constructor_kwargs=dict(rules=rules_of(merges), text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
