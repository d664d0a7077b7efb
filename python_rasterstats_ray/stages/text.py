"""Text-analysis stages for large-scale training-data pipelines.

All kernels are vectorized ``map_batches`` transforms over Arrow batches:
token counting (regex run count), quality scoring (length / alpha /
uppercase / punctuation ratios), n-gram language id heuristic, and rolling
document fingerprints. No Python row loops in the hot path except where a
per-document hash is inherently scalar (fingerprint/minhash shingling, which
operate on numpy views).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
ALPHA_RE = r"[^A-Za-z]"
UPPER_RE = r"[^A-Z]"
PUNCT_RE = r"[^.,;:!?'\"()\[\]-]"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens = count of non-whitespace runs (SQL-oracle parity:
    length(regexp_extract_all(text, '\\S+')))."""
    n = pc.count_substring_regex(batch[text_col], TOKEN_RE)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


# GPT-2-style pre-tokenizer segments (no lookaheads, RE2-safe): contraction
# suffixes, space-prefixed letter / digit / symbol runs, whitespace runs.
# Both pyarrow and DuckDB count it with RE2, so the SQL mirror is exact.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_bpe_tokens = count of BPE-ish pre-tokenizer segments — the
    LLM-training token-budget estimator (whitespace tokens undercount CJK
    and punctuation-heavy text)."""
    n = pc.count_substring_regex(batch[text_col], BPE_TOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality metrics per document, all computed with Arrow kernels:

    - n_chars_calc: utf8 length
    - n_tokens: non-whitespace runs
    - alpha_ratio: ascii-letter chars / chars
    - upper_ratio: uppercase ascii / chars
    - punct_ratio: punctuation chars / chars
    - avg_token_len: (chars - whitespace) / tokens
    """
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
    n_alpha = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, ALPHA_RE, "")), pa.int64()
    )
    n_upper = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, UPPER_RE, "")), pa.int64()
    )
    n_punct = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, PUNCT_RE, "")), pa.int64()
    )
    n_space = pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64())
    fl = pa.float64()
    denom = pc.cast(pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())), fl)
    tok_denom = pc.cast(pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64())), fl)
    out = batch
    out = out.append_column("n_chars_calc", n_chars)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column("alpha_ratio", pc.divide(pc.cast(n_alpha, fl), denom))
    out = out.append_column("upper_ratio", pc.divide(pc.cast(n_upper, fl), denom))
    out = out.append_column("punct_ratio", pc.divide(pc.cast(n_punct, fl), denom))
    out = out.append_column(
        "avg_token_len",
        pc.divide(pc.cast(pc.subtract(n_chars, n_space), fl), tok_denom),
    )
    return out


# ----------------------------------------------------------- language id

# Tiny per-language character/bigram profiles (heuristic; public knowledge).
_LANG_PROFILES = {
    "en": [" th", "the", " an", "ing", " of"],
    "de": ["der", "ein", "ich", "sch", " un"],
    "fr": [" le", " de", "es ", "ent", " la"],
    "es": [" de", " la", "os ", " el", "ión"],
    "pt": [" de", " qu", "ão ", " um", "os "],
    "ru": [" пр", "ого", " на", "ать", " по"],
    "zh": ["的", "是", "了", "在", "我"],
    "ja": ["の", "に", "は", "を", "た"],
}


class LangIdKernel:
    """Actor-pool kernel: n-gram-profile language guess per document.

    Profiles are compiled once per actor in ``__init__`` (stateful-stage
    pattern). Scores = count of profile-ngram hits per language, argmax.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_LANG_PROFILES)
        self.patterns = [
            "|".join(__import__("re").escape(g) for g in _LANG_PROFILES[lang])
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        scores = np.zeros((len(batch), len(self.langs)), dtype=np.int64)
        for j, pat in enumerate(self.patterns):
            scores[:, j] = pc.count_substring_regex(text, pat).to_numpy(
                zero_copy_only=False
            )
        best = np.argmax(scores, axis=1)
        guesses = np.array(self.langs, dtype=object)[best]
        no_signal = scores.max(axis=1) == 0
        guesses[no_signal] = "und"
        return batch.append_column("lang_guess", pa.array(guesses.tolist(), pa.string()))


# ---------------------------------------------------------- fingerprints

_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def _fnv1a_bytes(data: bytes) -> int:
    h = 14695981039346656037
    for b in data:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit FNV-1a content fingerprint per document (deterministic,
    process-stable; the exact-dedup key)."""
    texts = batch[text_col].to_pylist()
    fps = np.fromiter(
        (_fnv1a_bytes(t.encode("utf-8")) for t in texts),
        dtype=np.uint64,
        count=len(texts),
    )
    return batch.append_column(
        "fingerprint", pa.array(fps.astype(np.int64), pa.int64())
    )


def md5_batch(batch: pa.Table, text_col: str = "text", out_col: str = "text_md5") -> pa.Table:
    """Hex md5 per document (matches DuckDB ``md5(text)`` for the oracle)."""
    import hashlib

    texts = batch[text_col].to_pylist()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out_col, pa.array(h, pa.string()))


# ------------------------------------------- repetition / decontamination


def _split_words(text_col) -> tuple[np.ndarray, np.ndarray, "pa.Array"]:
    """Split a string column on single spaces (DuckDB string_split
    parity, including empty-string tokens from doubled spaces).

    Returns (doc_idx, codes, dictionary): one row per word, the word
    dictionary-encoded so downstream set/count logic is integer numpy."""
    words = pc.split_pattern(text_col, " ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return doc_idx, codes, enc.dictionary


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document, all-integer so the
    DuckDB oracle hash is bit-exact:

    - n_words / n_distinct_words: duplicate-word fraction numerator
      and denominator (dup_frac = 1 - distinct/words)
    - n_bigrams / top_bigram_count: fraction of all word-bigrams taken
      by the most frequent one (boilerplate detector)

    Fully vectorized: words dictionary-encoded once per batch, distinct
    and bigram counting are numpy unique/bincount over integer keys.
    """
    doc_idx, codes, dictionary = _split_words(batch[text_col])
    n = len(batch)
    C = max(len(dictionary), 1)
    n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)

    # distinct words per doc: unique over the combined (doc, word) key
    key = doc_idx * C + codes
    uniq = np.unique(key)
    n_distinct = np.bincount(uniq // C, minlength=n).astype(np.int64)

    # consecutive-word bigrams that do not cross a document boundary
    same = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) else np.zeros(0, bool)
    bdoc = doc_idx[:-1][same]
    bkey = (bdoc * C + codes[:-1][same]) * C + codes[1:][same]
    n_bigrams = np.bincount(bdoc, minlength=n).astype(np.int64)
    top = np.zeros(n, dtype=np.int64)
    if len(bkey):
        ub, cnt = np.unique(bkey, return_counts=True)
        np.maximum.at(top, (ub // C) // C, cnt)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct_words": pa.array(n_distinct, pa.int64()),
            "n_bigrams": pa.array(n_bigrams, pa.int64()),
            "top_bigram_count": pa.array(top, pa.int64()),
        }
    )


_GRAM_MIX = np.uint64(0x100000001B3)  # FNV prime as the rolling multiplier


def _word_hashes(dictionary, codes: np.ndarray) -> np.ndarray:
    """uint64 FNV-1a per UNIQUE word (Python loop over the small
    dictionary only), broadcast to every occurrence via the codes."""
    dict_hashes = np.fromiter(
        (_fnv1a_bytes(w.encode("utf-8")) for w in dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(dictionary),
    )
    return dict_hashes[codes] if len(codes) else np.zeros(0, np.uint64)


def ngram_hashes(doc_idx: np.ndarray, word_hashes: np.ndarray, ngram: int):
    """Rolling-combined uint64 hash of every within-document word
    ``ngram``; returns (gram_doc_idx, gram_hash), vectorized."""
    m = len(word_hashes) - ngram + 1
    if m <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        h = word_hashes[:m].copy()
        for j in range(1, ngram):
            h = h * _GRAM_MIX + word_hashes[j : j + m]
    keep = doc_idx[:m] == doc_idx[ngram - 1 :]
    return doc_idx[:m][keep], h[keep]


def benchmark_gram_set(texts, ngram: int = 5) -> np.ndarray:
    """Sorted unique gram hashes of a (small) benchmark/eval corpus —
    the broadcast side of decontamination. ``texts``: iterable of str."""
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(list(texts), pa.string())})
    doc_idx, codes, dictionary = _split_words(tbl["text"])
    wh = _word_hashes(dictionary, codes)
    _, grams = ngram_hashes(doc_idx, wh, ngram)
    return np.unique(grams)


class DecontaminateKernel:
    """Actor-pool stage: flag documents sharing any word-``ngram`` with a
    benchmark set (test-set decontamination for training corpora).

    The benchmark gram set is tiny by nature (an eval suite), broadcast
    once via ``ray.put`` and fetched per actor in ``__init__``; documents
    stream through in Arrow batches; membership is one ``np.isin``
    (searchsorted against the sorted gram array) per batch.

    Output: doc_id + n_contaminated_grams (int64; 0 = clean).
    """

    def __init__(self, gram_set_ref, ngram: int = 5, text_col: str = "text"):
        import ray

        self.grams = ray.get(gram_set_ref)
        self.ngram = ngram
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, codes, dictionary = _split_words(batch[self.text_col])
        wh = _word_hashes(dictionary, codes)
        gdoc, gh = ngram_hashes(doc_idx, wh, self.ngram)
        hits = np.isin(gh, self.grams)
        n_hits = np.bincount(gdoc[hits], minlength=len(batch)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_contaminated_grams": pa.array(n_hits, pa.int64()),
            }
        )


# ------------------------------------------------------------- PII scrub

# RE2-safe patterns (no lookarounds): pyarrow.compute and DuckDB both run
# RE2, so per-document match counts and redacted lengths agree bit-exact
# between the engine and the SQL oracle.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_PII_RULES = (
    ("n_emails", PII_EMAIL_RE, "<EMAIL>"),
    ("n_phones", PII_PHONE_RE, "<PHONE>"),
    ("n_ipv4", PII_IPV4_RE, "<IP>"),
)


def pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Count and redact PII-shaped spans (emails, phone numbers, IPv4
    addresses) per document — the standard scrub pass of a training-data
    pipeline. Stateless, fully vectorized (one RE2 count + one RE2
    replace per rule per batch), no shuffle.

    Redaction order is emails -> phones -> IPv4 so an address inside an
    already-redacted span is not double-counted; ``clean_len`` is the
    post-redaction utf8 length (proves the replacement really ran
    without shipping the full redacted text into the result).
    """
    text = batch[text_col]
    out = pa.table({"doc_id": batch["doc_id"]})
    clean = text
    for col, pattern, repl in _PII_RULES:
        n = pc.cast(pc.count_substring_regex(clean, pattern), pa.int64())
        out = out.append_column(col, n)
        clean = pc.replace_substring_regex(clean, pattern, repl)
    return out.append_column(
        "clean_len", pc.cast(pc.utf8_length(clean), pa.int64())
    )


# -------------------------------------------------------- unigram LM score


def token_count_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch (token, c) partial counts: the combiner half of the
    vocabulary build. Only one row per DISTINCT token in the batch enters
    the downstream ``groupby('token').sum('c')`` shuffle, so the exchange
    carries vocabulary-sized data (Heaps' law), not corpus-sized."""
    _, codes, dictionary = _split_words(batch[text_col])
    cnt = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
    return pa.table(
        {
            "token": pc.cast(dictionary, pa.string()),
            "c": pa.array(cnt, pa.int64()),
        }
    )


def vocab_micronats(tokens, counts) -> tuple[list, np.ndarray]:
    """floor(ln(c / total) * 1e6) per token as int64 "micronats".

    ``math.log`` (libm) is used instead of ``np.log`` so the value is
    computed by the same std::log the DuckDB oracle calls; the floor at
    1e-6 nat granularity makes the per-document SUM order-independent
    and bit-exact (integer accumulation, |score| < 2^53 for any real
    document length)."""
    import math

    total = int(sum(counts))
    mn = np.fromiter(
        (math.floor(math.log(int(c) / total) * 1_000_000) for c in counts),
        dtype=np.int64,
        count=len(counts),
    )
    return list(tokens), mn


class UnigramLMKernel:
    """Actor-pool stage: per-document unigram-LM quality score (the
    CCNet-style LM filter, with the n-gram model reduced to unigrams so
    the oracle is closed-form SQL).

    The (token -> micronat log-prob) table is built once from a corpus
    pass and broadcast via ``ray.put``; each batch dictionary-encodes its
    words, maps only the UNIQUE words through the lookup (Python dict hit
    on the small per-batch dictionary), then scores every document with
    one ``np.bincount``. At 100 TB the vocabulary is capped by a
    min-count threshold before broadcast; rare tokens score as OOV.
    """

    OOV = np.int64(-50_000_000)  # ~e^-50 floor for unseen tokens

    def __init__(self, vocab_ref, text_col: str = "text"):
        import ray

        tokens, micronats = ray.get(vocab_ref)
        self.lut = {t: int(m) for t, m in zip(tokens, micronats)}
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, codes, dictionary = _split_words(batch[self.text_col])
        lut = self.lut
        dict_mn = np.fromiter(
            (lut.get(w, self.OOV) for w in dictionary.to_pylist()),
            dtype=np.int64,
            count=len(dictionary),
        )
        per_tok = dict_mn[codes]
        n = len(batch)
        # Integer scatter-add: float64 bincount weights are exact only
        # while partial sums stay under 2^53 (~1.8e8 tokens/doc at the
        # OOV floor); np.add.at on int64 keeps the bit-exact guarantee
        # unconditionally.
        score = np.zeros(n, dtype=np.int64)
        np.add.at(score, doc_idx, per_tok)
        n_tok = np.bincount(doc_idx, minlength=n)
        n_oov = np.zeros(n, dtype=np.int64)
        np.add.at(n_oov, doc_idx, (per_tok == self.OOV).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lm_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
                "lm_score_micronats": pa.array(score, pa.int64()),
            }
        )


# ------------------------------------------------- DSIR importance weights


def dsir_count_partials(
    batch: pa.Table,
    text_col: str = "text",
    lang_col: str = "lang",
    target_lang: str = "en",
) -> pa.Table:
    """Per-batch (token, c_src, c_tgt) partials for DSIR-style importance
    weighting (Xie et al. 2023, reduced to unigram features so the
    oracle is closed-form SQL): c_src counts every occurrence, c_tgt
    only those inside target-distribution documents. One pass, one row
    per DISTINCT token enters the shuffle."""
    doc_idx, codes, dictionary = _split_words(batch[text_col])
    is_tgt = pc.equal(batch[lang_col], target_lang).to_numpy(zero_copy_only=False)
    tok_tgt = is_tgt[doc_idx]
    c_src = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
    c_tgt = np.bincount(
        codes[tok_tgt], minlength=len(dictionary)
    ).astype(np.int64)
    return pa.table(
        {
            "token": pc.cast(dictionary, pa.string()),
            "c_src": pa.array(c_src, pa.int64()),
            "c_tgt": pa.array(c_tgt, pa.int64()),
        }
    )


def dsir_weights(tokens, c_src, c_tgt) -> tuple[list, np.ndarray]:
    """Per-token integer importance weight in micronats:
    floor(ln(ct/Tt)*1e6) - floor(ln(cs/Ts)*1e6) for tokens seen in the
    target distribution (others are skipped — weight-0, counted). The
    two floors are applied SEPARATELY so the value is reproducible in
    SQL; libm log keeps both sides bit-identical (same trick as
    vocab_micronats)."""
    import math

    ts = int(sum(int(c) for c in c_src))
    tt = int(sum(int(c) for c in c_tgt))
    out_t, out_w = [], []
    for tok, cs, ct in zip(tokens, c_src, c_tgt):
        cs, ct = int(cs), int(ct)
        if ct <= 0:
            continue
        w = math.floor(math.log(ct / tt) * 1_000_000) - math.floor(
            math.log(cs / ts) * 1_000_000
        )
        out_t.append(tok)
        out_w.append(w)
    return out_t, np.asarray(out_w, np.int64)


class TokenWeightKernel:
    """Actor-pool stage: per-document sum of broadcast integer token
    weights (int64 scatter-add — order-independent, SQL-exact). Tokens
    absent from the weight table contribute 0 and count as skipped."""

    def __init__(self, weights_ref, text_col: str = "text"):
        import ray

        tokens, w = ray.get(weights_ref)
        self.lut = {t: int(x) for t, x in zip(tokens, w)}
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, codes, dictionary = _split_words(batch[self.text_col])
        lut = self.lut
        words = dictionary.to_pylist()
        dict_w = np.fromiter(
            (lut.get(wd, 0) for wd in words), dtype=np.int64, count=len(words)
        )
        dict_in = np.fromiter(
            (wd in lut for wd in words), dtype=bool, count=len(words)
        )
        per_tok = dict_w[codes]
        in_vocab = dict_in[codes]
        n = len(batch)
        score = np.zeros(n, np.int64)
        np.add.at(score, doc_idx, per_tok)
        n_ranked = np.zeros(n, np.int64)
        np.add.at(n_ranked, doc_idx, in_vocab.astype(np.int64))
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ranked": pa.array(n_ranked, pa.int64()),
                "n_skipped": pa.array(n_tok - n_ranked, pa.int64()),
                "dsir_micronats": pa.array(score, pa.int64()),
            }
        )


class BloomDecontaminateCandidates:
    """Actor-pool stage, the SCALE path of decontamination: when the
    benchmark set is too big to broadcast exactly, broadcast only its
    bloom bitmap (a few MB regardless of gram count) and emit a
    (doc_id, gram_hash) candidate row per gram OCCURRENCE whose probe is
    positive — typically orders of magnitude fewer rows than the corpus'
    grams. Bloom has NO false negatives, so an exact semi-join of the
    candidates against the distinct benchmark grams (a shuffle the bloom
    just shrank) reproduces the exact answer.
    """

    def __init__(self, words_ref, m_bits: int, k: int, ngram: int = 5,
                 text_col: str = "text"):
        import ray

        self.words = ray.get(words_ref)
        self.m_bits = m_bits
        self.k = k
        self.ngram = ngram
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .sketch import bloom_contains

        doc_idx, codes, dictionary = _split_words(batch[self.text_col])
        wh = _word_hashes(dictionary, codes)
        gdoc, gh = ngram_hashes(doc_idx, wh, self.ngram)
        pos = bloom_contains(self.words, gh, self.m_bits, self.k)
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)[gdoc[pos]]
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "gram_hash": pa.array(gh[pos].view(np.int64), pa.int64()),
            }
        )


# --------------------------------------------------- winnowing fingerprints


def winnow_fingerprints(
    batch: pa.Table,
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003, the MOSS algorithm): hash every word k-gram, slide a window of
    ``w`` consecutive gram hashes over the document, select the RIGHTMOST
    minimal hash in each window, report the distinct selected
    (position, hash) pairs. Guarantees every shared substring of
    k + w - 1 words produces at least one shared fingerprint, with a
    ~2/(w+1) expected selection density.

    The gram key is the md5 hex digest of the space-joined words —
    content-defined and reproducible as SQL ``md5()``, with identical
    ordering on both sides (lowercase-hex ASCII compares bytewise).
    Documents with fewer than w grams have no full window and emit no
    fingerprints (the paper's rule). Selection is vectorized: md5 ranks
    via np.unique, per-window rightmost argmin over a stride view;
    windows never span documents. Stateless per-batch map — at 100 TB
    the operator is an embarrassingly parallel scan; only the selected
    ~2/(w+1) of grams would feed any downstream (e.g. match-finding)
    shuffle. Output: (doc_id, pos, fp) per selected fingerprint."""
    import hashlib

    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    toks = words.to_pylist()
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    md5s, gdoc, gpos = [], [], []
    for d, tl in zip(did, toks):
        n_g = len(tl) - k + 1
        for i in range(max(n_g, 0)):
            md5s.append(hashlib.md5(" ".join(tl[i : i + k]).encode("utf-8")).hexdigest())
            gdoc.append(d)
            gpos.append(i)
    if not md5s:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "fp": pa.array([], pa.string()),
            }
        )
    gdoc = np.asarray(gdoc, np.int64)
    gpos = np.asarray(gpos, np.int64)
    uniq, ranks = np.unique(np.asarray(md5s), return_inverse=True)
    m = len(ranks) - w + 1
    out_doc, out_pos, out_fp = [], [], []
    if m > 0:
        sw = np.lib.stride_tricks.sliding_window_view(ranks, w)
        # rightmost minimal: argmin over the REVERSED window picks the
        # first (= rightmost original) occurrence of the minimum
        idx = w - 1 - np.argmin(sw[:, ::-1], axis=1)
        starts = np.arange(m, dtype=np.int64)
        infull = gdoc[starts] == gdoc[starts + w - 1]  # window within one doc
        sel = starts[infull] + idx[infull]
        sel = np.unique(sel)  # adjacent windows often pick the same gram
        out_doc = gdoc[sel]
        out_pos = gpos[sel]
        out_fp = uniq[ranks[sel]]
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(out_doc, np.int64), pa.int64()),
            "pos": pa.array(np.asarray(out_pos, np.int64), pa.int64()),
            "fp": pa.array(list(out_fp), pa.string()),
        }
    )


# ---------------------------------------------- content-defined chunking


def cdc_chunks(
    batch: pa.Table,
    text_col: str = "text",
    k: int = 8,
    base: int = 31,
    mod: int = 1 << 31,
    div: int = 64,
    rem: int = 0,
) -> pa.Table:
    """Content-defined chunking (the Rabin-Karp / FastCDC-family
    storage-dedup primitive): a chunk boundary falls after byte i+k-1
    wherever the k-byte polynomial hash
    ``h(i) = sum_j byte[i+j] * base^j  (mod m)`` satisfies
    ``h % div == rem`` — so chunk boundaries move WITH the content and
    shared runs between near-duplicate documents chunk identically no
    matter how the surrounding bytes shift (the property fixed-size
    chunking lacks). Positional variant: no min/max clamp, so the rule
    is closed-form and the DuckDB oracle reproduces it with the same
    integer arithmetic (ASCII contract: byte == codepoint; the fixture
    corpus is ASCII).

    Emits (doc_id, chunk_idx, start, len, chunk_md5) per chunk; docs
    shorter than k are one chunk; empty docs emit nothing. Stateless
    per-batch scan (vectorized rolling hash per doc; md5 per chunk is
    the same scalar status as docs_chunk)."""
    import hashlib

    pows = np.array([base ** j for j in range(k)], dtype=np.int64)
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch[text_col].to_pylist()
    o_doc, o_idx, o_start, o_len, o_md5 = [], [], [], [], []
    for d, t in zip(did, texts):
        bs = t.encode("utf-8")
        n = len(bs)
        if n == 0:
            continue
        cuts = [n]
        if n >= k:
            b = np.frombuffer(bs, np.uint8).astype(np.int64)
            m = n - k + 1
            h = np.zeros(m, np.int64)
            for j in range(k):
                h += b[j : j + m] * pows[j]
            h %= mod
            pos = np.nonzero(h % div == rem)[0] + k  # cut AFTER byte i+k-1
            cuts = sorted(set(pos.tolist()) | {n})
        start = 0
        for ci, e in enumerate(cuts):
            o_doc.append(int(d))
            o_idx.append(ci)
            o_start.append(start)
            o_len.append(e - start)
            o_md5.append(hashlib.md5(bs[start:e]).hexdigest())
            start = e
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.int64()),
            "chunk_idx": pa.array(o_idx, pa.int64()),
            "start": pa.array(o_start, pa.int64()),
            "len": pa.array(o_len, pa.int64()),
            "chunk_md5": pa.array(o_md5, pa.string()),
        }
    )
