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
