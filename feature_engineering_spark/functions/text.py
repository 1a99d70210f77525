"""Text-analysis functions for web-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure JVM column expressions (whole-stage codegen, no Python) — these
run per page over the full corpus, so they must live on the scan side of
the first shuffle. Each has an exact DuckDB-SQL twin in
plans/driver_queries.py; cross-engine-stable primitives only (md5, conv,
regexp with ASCII classes, single-space split).

The reference analog is the JSON-message flatten + derived scalar layer
(/root/reference/utils/data_loaders.py:178-199, 382) — the per-row scalar
function surface of the engine, generalized to text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists (public common-word lists, truncated).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "他"],
}
_LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tiebreak

# BPE-ish tokenization: letter runs | single digits | single punctuation.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def ws_tokens(text: Column) -> Column:
    """Single-space split (cross-engine identical, keeps empty strings)."""
    return F.split(text, " ")


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.expr(f"regexp_extract_all(text, '{BPE_ISH_PATTERN}', 0)"))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.array_distinct(ws_tokens(F.lower(text)))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax stopword-hit language, 'und' when no hits; ties broken by
    _LANG_ORDER (first wins)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, "[.,!?;:]", ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, "[0-9]", ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = ws_tokens(F.lower(text))
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, some stopwords,
    not digit/punct-heavy. The exact formula is the contract (oracle-
    matched), not a claim of linguistic truth."""
    n_tok = ws_token_count(text)
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * stopword_ratio(text)
        + F.lit(0.15) * (F.lit(1.0) - digit_ratio(text))
        + F.lit(0.15) * (F.lit(1.0) - punct_ratio(text))
    )


def md5_fingerprint(text: Column) -> Column:
    return F.md5(text)


def token_hash64(tok: Column) -> Column:
    """60-bit integer hash of a token via md5 — identical in Spark and
    DuckDB (unlike murmur/xxhash whose seeds differ across engines)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def rolling_hash(text: Column, base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over character codes (Rabin-Karp shape):
    acc = (acc * base + ascii(ch)) % mod. aggregate() keeps it JVM-side."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def simhash64(text: Column, nbits: int = 60) -> Column:
    """SimHash over whitespace tokens with md5-derived 60-bit token hashes:
    bit b of the result = 1 iff sum over tokens of (+1 if token-hash bit b
    set else -1) > 0. Pure JVM (aggregate over a per-bit transform).

    NOTE: ``nbits`` per-bit aggregates each reference the token-hash
    array; in one projection the md5 transform re-runs per reference
    (interpreted HOFs have no subexpression elimination). Hot paths
    should stage the hash array in its own select and call
    ``simhash_from_hashes`` on the attribute."""
    toks = ws_tokens(text)
    hashes = F.transform(toks, lambda t: token_hash64(t))
    return simhash_from_hashes(hashes, nbits)


def simhash_from_hashes(hashes: Column, nbits: int = 60) -> Column:
    """``simhash64`` over an already-materialized token-hash array — pass
    an ATTRIBUTE so the per-bit aggregates read the array instead of
    re-deriving it."""

    def _vote(b: int):
        # closure factory: pyspark higher-order lambdas must take exactly
        # (acc, x) — a default-arg third parameter breaks introspection
        def merge(acc, h):
            bit = F.shiftright(h, b).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, 1).otherwise(-1)

        return merge

    bit_votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), _vote(b)) for b in range(nbits)
    ]
    out = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def word_ngrams_all(text: Column, n: int = 2) -> Column:
    """ALL word n-gram occurrences (multiset semantics — unlike
    word_shingles, duplicates are kept): the input to repetition /
    frequency statistics where COUNTS matter, not membership."""
    toks = ws_tokens(text)
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), m - n), lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    # guard m < n: sequence(0, negative) would DESCEND, not be empty
    return F.when(m >= n, grams).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (set semantics) of the single-space
    tokenization. JVM: transform over a sequence of start offsets.

    NOTE: references the token split several times (size guard, sequence
    bound, slice source). Higher-order functions evaluate interpreted with
    no subexpression elimination, so when this Column lands in one
    projection the split re-runs per reference. Hot paths should stage
    the split in its own select and use ``word_shingles_from_tokens``
    (operators/dedup._shingle_frame does exactly that)."""
    return word_shingles_from_tokens(ws_tokens(text), n)


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """``word_shingles`` over an already-materialized token-array column —
    pass an ATTRIBUTE (a column projected in a previous select) so the
    multiple references here are cheap per-row array reads, not repeated
    evaluations of the split."""
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), m - n), lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    # guard m < n: sequence(0, negative) would DESCEND, not be empty
    return F.when(m >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct CHARACTER n-gram shingles (set semantics) — the standard
    web-corpus alternative to word shingles for short documents and
    scripts without whitespace word boundaries (CJK-ish text), where word
    3-grams are too sparse to near-dup on. JVM scan-side: transform over a
    sequence of start offsets with Column.substr — no Python, no shuffle."""
    m = F.length(text)
    grams = F.transform(
        F.sequence(F.lit(1), m - n + 1), lambda i: text.substr(i, F.lit(n))
    )
    # guard m < n: sequence(1, non-positive) would DESCEND, not be empty
    return F.when(m >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def normalize_text(text: Column) -> Column:
    """Canonical cleaning pass (the per-page normalize step of a corpus
    pipeline): lowercase, strip [.,!?;:] punctuation, collapse whitespace
    runs, trim. Deterministic and cross-engine exact (same regexes in the
    DuckDB twin), so normalized text stays byte-comparable."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[.,!?;:]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)
