"""Within-document repetition signals — the Gopher/RefinedWeb-style
quality heuristics a webtext pipeline filters on before training:
heavily repetitive documents (boilerplate, keyword stuffing, scraper
loops) are low-value and skew n-gram statistics.

Per document:
- ``n_words``          total whitespace tokens;
- ``dup_word_frac``    fraction of word OCCURRENCES that are repeats
                       (1 - distinct/total — 0 for all-unique text);
- ``top_2gram``        the most frequent word 2-gram (ties: smallest
                       gram — deterministic), and its ``top_2gram_count``;
- ``top_2gram_char_frac`` non-space characters covered by occurrences of
                       that 2-gram / non-space characters of the doc —
                       Gopher's "fraction of characters in the most
                       common n-gram";
- ``dup_2gram_frac``   fraction of 2-gram occurrences whose gram occurs
                       more than once.

Scale shape: two explode → map-side-combined groupBy((doc, term)) →
groupBy(doc) chains; per-doc term counts partial-aggregate before the
shuffle, so shuffle volume is distinct-(doc, term) rows, bounded by the
corpus token count and in practice far below it. All expressions are
cross-engine exact (single-space split, replace-based char counts) and
mirrored by the DuckDB oracle of the ``repetition_signals`` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_spark.functions.text import ws_tokens, word_ngrams_all


def repetition_signals(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    t = F.col(text)
    base = docs.select(
        F.col(id_col),
        ws_tokens(t).alias("__toks"),
        word_ngrams_all(t, 2).alias("__grams"),
        F.length(F.expr(f"replace({text}, ' ', '')")).alias("__nschars"),
    )

    words = (
        base.select(id_col, "__nschars", F.explode("__toks").alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("__dupw"),
        )
    )

    grams = (
        base.select(id_col, F.explode("__grams").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("__ng"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("__dupg"),
            # (count DESC, gram ASC) argmax in ONE aggregate: min of
            # (-count, gram) structs — no second pass, no window
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("g").alias("g"))).alias(
                "__top"
            ),
        )
    )

    chars = base.select(id_col, "__nschars")
    # Fractions are quantized to millionths via INTEGER arithmetic
    # (a * 1e6 div b) and only then divided by 1e6: ratios of small
    # integers land exactly on .xxxxxx5 boundaries where Spark's
    # BigDecimal ROUND and DuckDB's multiply-first ROUND can disagree
    # (CLAUDE.md, window_features precedent) — integer div is
    # bit-identical in both engines and int/1e6 is one deterministic
    # IEEE division, so the doubles match exactly.
    out = (
        words.join(grams, id_col, "left")
        .join(chars, id_col)
        .select(
            id_col,
            "n_words",
            (F.expr("(__dupw * 1000000) div n_words") / F.lit(1e6)).alias(
                "dup_word_frac"
            ),
            F.col("__top.g").alias("top_2gram"),
            (-F.col("__top.nc")).cast("long").alias("top_2gram_count"),
            (
                F.coalesce(
                    F.when(
                        F.col("__nschars") > 0,
                        F.expr(
                            "((-__top.nc) * length(replace(__top.g, ' ', ''))"
                            " * 1000000) div __nschars"
                        ),
                    ),
                    F.lit(0).cast("long"),
                )
                / F.lit(1e6)
            ).alias("top_2gram_char_frac"),
            (
                F.coalesce(
                    F.expr("(__dupg * 1000000) div __ng"), F.lit(0).cast("long")
                )
                / F.lit(1e6)
            ).alias("dup_2gram_frac"),
        )
    )
    return out


def filter_repetitive(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = 0.6,
    max_top_2gram_char_frac: float = 0.2,
) -> DataFrame:
    """Corpus minus documents over the repetition thresholds (Gopher-style
    quality gate). The signals frame is one row per doc; the anti-join
    side carries only the ids of rejected docs."""
    sig = repetition_signals(docs, text, id_col)
    bad = sig.where(
        (F.col("dup_word_frac") > max_dup_word_frac)
        | (F.col("top_2gram_char_frac") > max_top_2gram_char_frac)
    ).select(id_col)
    return docs.join(bad, id_col, "left_anti")
