"""Text-analysis operators for training-data pipelines.

All hot-path metrics are built-in Spark SQL expressions (JVM-side,
whole-stage codegen) — no Python in the row path. Only simhash needs a
(vectorized) pandas UDF.

Operators: token counting, quality scoring, language ID (stopword
n-gram heuristic), document fingerprinting.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

__all__ = [
    "with_text_stats",
    "with_quality_score",
    "with_language_id",
    "with_fingerprint",
    "with_simhash",
    "with_winnow_fingerprints",
    "with_bpe_token_count",
    "BPE_TOKEN_PATTERN",
    "with_repetition_stats",
    "redact_pii",
    "PII_PATTERNS",
    "STOPWORDS",
]

# Minimal per-language stopword marker sets for the n-gram/stopword
# language heuristic (deterministic, no external models).
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "une"],
    "es": ["el", "la", "los", "que", "es", "en", "por", "una", "con"],
}


def _tokens(text_col: Column) -> Column:
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def with_text_stats(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Add length / token / character-class statistics — all JVM-side."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return (
        df.withColumn(f"{prefix}n_chars", n_chars.cast("long"))
        .withColumn(
            f"{prefix}n_tokens",
            F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(toks)).cast("long"),
        )
        .withColumn(
            f"{prefix}n_punct",
            F.length(
                F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", "")
            ).cast("long"),
        )
        .withColumn(
            f"{prefix}punct_ratio",
            F.col(f"{prefix}n_punct") / safe_chars,
        )
        .withColumn(
            f"{prefix}digit_ratio",
            F.length(F.regexp_replace(t, r"[^0-9]", "")) / safe_chars,
        )
        .withColumn(
            f"{prefix}upper_ratio",
            F.length(F.regexp_replace(t, r"[^A-Z]", "")) / safe_chars,
        )
        .withColumn(
            f"{prefix}space_ratio",
            F.length(F.regexp_replace(t, r"[^ \t\n]", "")) / safe_chars,
        )
    )


def with_quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality_score"
) -> DataFrame:
    """Heuristic [0,1] document quality from length/punct/stopword ratios
    (the usual pretraining-filter shape: mean word length sane, some
    stopwords present, not digit/punct-dominated)."""
    d = with_text_stats(df, text_col, prefix="__q_")
    toks = _tokens(F.col(text_col))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(toks, en_stop))
    n_tok = F.greatest(F.col("__q_n_tokens"), F.lit(1)).cast("double")
    avg_word = F.col("__q_n_chars") / n_tok
    score = (
        F.lit(1.0)
        - F.least(F.col("__q_punct_ratio") * 3.0, F.lit(0.4))
        - F.least(F.col("__q_digit_ratio") * 2.0, F.lit(0.3))
        # word lengths far from ~5 chars get docked
        - F.least(F.abs(avg_word - 5.0) / 20.0, F.lit(0.2))
        + F.least(stop_hits.cast("double") / 10.0, F.lit(0.1))
    )
    out = d.withColumn(out_col, F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)))
    return out.drop(*[c for c in out.columns if c.startswith("__q_")])


def with_language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_id"
) -> DataFrame:
    """Stopword-marker language heuristic, JVM-side: count stopword hits
    per language, argmax via greatest-of-structs; 'und' (undetermined)
    when nothing matches."""
    toks = _tokens(F.col(text_col))
    scored = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.array_intersect(toks, arr))
        scored.append(F.struct(hits.alias("score"), F.lit(lang).alias("lang")))
    best = F.greatest(*scored)
    return df.withColumn(
        out_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Deterministic content fingerprint of whitespace-normalized,
    lower-cased text (md5 → portable across engines for dedup oracles)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn(out_col, F.md5(norm))


def with_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """64-bit simhash over token hashes (vectorized pandas UDF): sign of
    the per-bit sum of token hash bits. Near-duplicate docs differ in few
    bits (compare with hamming distance via bit_count(a ^ b)).

    Token hash = first 8 bytes of md5(token), big-endian. md5 is
    bit-identical in every engine, so the whole simhash is replicable in
    plain SQL (DuckDB: ``('0x' || substr(md5(tok), 1, 16))::UBIGINT``) —
    that is what makes an exact cross-engine oracle possible. md5 runs
    once per *unique* token per Arrow batch; votes are numpy matmuls.
    """

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(texts), dtype=np.int64)
        tok_lists = [
            t.lower().split() if t is not None else [] for t in texts
        ]
        all_toks = [tok for lst in tok_lists for tok in lst]
        if not all_toks:
            return pd.Series(out)
        uniq, inv = np.unique(
            np.asarray(all_toks, dtype=object), return_inverse=True
        )
        uh = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(u.encode("utf-8")).digest()[:8], "big"
                )
                for u in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        bit_idx = np.arange(64, dtype=np.uint64)
        # unique-token bit matrix (V × 64); per-doc votes sum rows of it
        bits_u = ((uh[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        pow2 = np.uint64(1) << bit_idx
        pos = 0
        for i, lst in enumerate(tok_lists):
            n = len(lst)
            if n == 0:
                continue
            vote = bits_u[inv[pos:pos + n]].sum(axis=0) * 2 - n
            pos += n
            sh = np.sum(pow2[vote > 0], dtype=np.uint64)
            out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    return df.withColumn(out_col, _simhash(F.col(text_col)))


def _winnow_hashes(
    data: bytes, k: int, w: int, base: int = 1000003
) -> np.ndarray:
    """Winnowing fingerprint selection over one byte string: polynomial
    rolling k-gram hashes (uint64 wraparound), then the RIGHTMOST
    minimal hash of every window of ``w`` consecutive k-grams
    (Schleimer–Wilkerson–Aiken, SIGMOD'03 §3). Returns the selected
    hashes (deduplicated, unsorted)."""
    codes = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = codes.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    b = np.uint64(base)
    with np.errstate(over="ignore"):
        for j in range(k):  # Horner over the k gram positions
            h = h * b + codes[j:j + m]
    if m <= w:
        # fewer grams than one window: the whole doc is one window —
        # select the single rightmost global minimum
        rightmost_min = m - 1 - int(np.argmin(h[::-1]))
        return h[rightmost_min:rightmost_min + 1]
    sw = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimum: argmin of the reversed window is leftmost of
    # the reversal == rightmost of the original
    amin_rev = sw[:, ::-1].argmin(axis=1)
    pos = np.arange(sw.shape[0]) + (w - 1 - amin_rev)
    return h[np.unique(pos)]


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "winnow_fp",
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing
    (Schleimer–Wilkerson–Aiken, SIGMOD'03): k-gram byte-level rolling
    hashes over whitespace-normalized lower-cased text; every window of
    ``w`` consecutive grams contributes its rightmost-minimal hash.

    THE guarantee that makes this the plagiarism/overlap primitive: any
    shared substring of length ≥ w + k − 1 between two documents is
    certain to produce at least one shared fingerprint — no false
    negatives above the noise threshold, with fingerprint density ~2/(w+1).
    Output: sorted distinct ``array<long>`` (int64 bit-view of the
    uint64 hashes). Pair detection: ``dedup.winnow_overlap_pairs``.
    """
    from pyspark.sql.types import ArrayType

    kk, ww = int(k), int(w)
    if kk < 2 or ww < 1:
        raise ValueError("winnow fingerprints need k >= 2 and w >= 1")

    @F.pandas_udf(ArrayType(LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            norm = " ".join(t.lower().split()).encode("utf-8")
            sel = _winnow_hashes(norm, kk, ww)
            out.append(
                np.unique(sel.view(np.int64)).tolist() if sel.size else []
            )
        return pd.Series(out)

    return df.withColumn(out_col, _fp(F.col(text_col)))


# GPT-2-style pre-tokenizer pattern (contraction pieces, space-prefixed
# letter runs, digit runs, punctuation runs) with explicit unicode
# classes — Java regex and RE2 agree on \p{L}/\p{N}, unlike the
# engine-dependent \w.  Class membership mirrors the GPT-2 original:
# letters and digits split into separate runs, and `_` belongs to the
# punctuation class, so the piece count stays a faithful lower bound on
# real BPE token counts (a looser combined class would OVERcount
# underscore-adjacent punctuation common in code/markdown).  The
# whitespace exclusion is the EXPLICIT class [ \t\n\x0B\f\r], never \s:
# Java's \s includes \x0B while RE2's does not — the exact cross-engine
# divergence the r3 text_stats fix documented as a hash killer.
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+"
)


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """Approximate BPE token count via the GPT-2-style pre-tokenizer
    regex — the standard "how many tokens will this document cost"
    estimator when the real tokenizer isn't on the cluster.  Counts the
    pre-tokenizer pieces (each piece maps to ≥1 BPE token, so this is a
    lower bound that tracks real counts closely for natural text).
    Pure ``regexp_count`` — JVM-side, whole-stage codegen, no UDF."""
    return df.withColumn(
        out_col,
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
        .cast("long"),
    )


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", prefix: str = "rep_"
) -> DataFrame:
    """Within-document repetition signals (the Gopher/RefinedWeb-style
    quality filters): fraction of duplicate lines, fraction of
    characters inside duplicate lines, and the character fraction
    covered by the single most frequent word {2,3}-gram.  Highly
    repetitive documents (boilerplate, scraper loops, degenerate
    generations) score high and get filtered before training.

    One vectorized pandas UDF emitting a struct — counting n-gram
    multiplicities needs per-document grouping that plain Catalyst
    expressions cannot express."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_t = StructType([
        StructField("dup_line_frac", DoubleType(), False),
        StructField("dup_line_char_frac", DoubleType(), False),
        StructField("top_bigram_char_frac", DoubleType(), False),
        StructField("top_trigram_char_frac", DoubleType(), False),
    ])

    def _doc_stats(t: str):
        if not t:
            return (0.0, 0.0, 0.0, 0.0)
        lines = [ln for ln in t.splitlines() if ln.strip()]
        if lines:
            cnt = Counter(lines)
            dup_lines = sum(c for c in cnt.values() if c > 1)
            dup_chars = sum(
                len(ln) * c for ln, c in cnt.items() if c > 1
            )
            dlf = dup_lines / len(lines)
            dcf = dup_chars / max(sum(len(ln) for ln in lines), 1)
        else:
            dlf = dcf = 0.0
        toks = t.split()
        total_chars = max(len(t), 1)
        grams = []
        for n in (2, 3):
            if len(toks) < n:
                grams.append(0.0)
                continue
            c = Counter(
                tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)
            )
            gram, occ = c.most_common(1)[0]
            gram_chars = sum(len(w) for w in gram) + (n - 1)
            grams.append(
                min(occ * gram_chars / total_chars, 1.0) if occ > 1
                else 0.0
            )
        return (dlf, dcf, grams[0], grams[1])

    @F.pandas_udf(out_t)
    def _rep(texts: pd.Series) -> pd.DataFrame:
        rows = [
            _doc_stats(t) if t is not None else (0.0, 0.0, 0.0, 0.0)
            for t in texts
        ]
        return pd.DataFrame(rows, columns=[f.name for f in out_t.fields])

    tmp = "__rep_struct"
    out = df.withColumn(tmp, _rep(F.col(text_col)))
    for f in out_t.fields:
        out = out.withColumn(f"{prefix}{f.name}", F.col(f"{tmp}.{f.name}"))
    return out.drop(tmp)


# Conservative PII patterns — emails, IPv4 addresses, NANP-shaped
# phone numbers. Deliberately precision-leaning (no bare digit runs,
# which would eat order ids; the phone form requires the 3-3-4
# grouping with separators): pretraining scrubbing wants low
# false-positive damage to clean text. ORDER MATTERS and is the dict
# order redact_pii applies: ipv4 must run before phone so a dotted
# address is never half-eaten as a phone number.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"(?:\+\d{1,3}[-. ]?)?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: Optional[str] = None,
    kinds: Optional[List[str]] = None,
) -> DataFrame:
    """Replace PII matches with ``<KIND>`` placeholders — pure chained
    ``regexp_replace`` (JVM, whole-stage codegen, no UDF).  ``kinds``
    selects a subset of :data:`PII_PATTERNS` (default: all, applied in
    dict order — email first, then ipv4 BEFORE phone so a dotted
    address is never half-eaten as a phone number).  Residual known
    false-positive class: a bare 3-3-4 digit grouping with separators
    is phone-shaped and gets redacted.
    """
    out_col = out_col or text_col
    expr = F.col(text_col)
    for kind in (kinds if kinds is not None else list(PII_PATTERNS)):
        if kind not in PII_PATTERNS:
            raise ValueError(
                f"unknown PII kind {kind!r}; known: {sorted(PII_PATTERNS)}"
            )
        expr = F.regexp_replace(
            expr, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return df.withColumn(out_col, expr)
