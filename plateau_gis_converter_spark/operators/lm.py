"""Character-n-gram language-model quality scoring (the CCNet pattern).

CCNet (Wenzek et al., LREC 2020) ranks Common-Crawl documents by the
perplexity of a language model trained on a clean reference corpus and
keeps the low-perplexity head — the single most load-bearing quality
filter in modern web-text curation.  The Spark-native shape:

* **model (one partial-agg shuffle)**: the reference corpus's char
  n-gram counts, ``(gram, cnt)``.  The state is bounded by the charset
  (``|alphabet|^n`` distinct grams — ~10^5-10^6 for web text at n=3)
  no matter how large the reference corpus is, so the model relation
  always broadcasts.
* **scoring (map + broadcast join + one agg)**: each document's grams
  LEFT-join the broadcast model; a per-gram rarity folds into a per-doc
  mean.  The corpus side never shuffles on gram — only the final
  per-doc aggregation shuffles, keyed by doc_id.

INTEGER-EXACT scoring (house discipline — see retrieval.py's BM25):
the hash-gated score is the mean **inverse probability** in micro
units,

    gram_rarity  = (T * 10^6) div (cnt + 1)       (add-one smoothing)
    rarity_micro = sum(gram_rarity) div n_grams

with ``T = sum(cnt)`` the model's total gram mass.  This is the exact
rational surrogate of perplexity: monotone in mean inverse probability
for the ranking use (keep the LOW-rarity head = fluent text under the
reference model; garbage/wrong-language text scores high), but with no
transcendental, so Spark and DuckDB agree bit-for-bit.  Overflow:
``T * 10^6 < 2^63`` holds through ``T ~ 9e12`` model grams; a bigger
reference corpus caps the model by min count or top-k first (standard
practice — rare grams are noise anyway).

``nll_score`` is the float NLL/gram variant (true log-prob, for
production ranking where cross-engine hash parity is not required) —
same plan shape, documented non-gated, like retrieval.py's
``exact=False``.

Reference parity: none — the reference converts geometry; LM quality
scoring is the engine's web-text curation addition (SURVEY §2.8b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def char_grams(df: DataFrame, n: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, gram) — one row per char-n-gram OCCURRENCE of
    ``lower(text)``; docs shorter than n chars contribute nothing.
    Map-only.  ``lower`` is materialized as a projection attribute FIRST
    so the per-element substring reads a plain column — an inline
    ``lower(text)`` inside the lambda re-evaluates over the whole string
    per element, O(len^2) per document (text._ngrams's measured trap)."""
    lowered = df.select(F.col(id_col),
                        F.lower(F.col(text_col)).alias("_t"))
    grams = F.expr(
        f"CASE WHEN length(_t) >= {int(n)} THEN "
        f"  transform(sequence(1, length(_t) - {int(n) - 1}), "
        f"            i -> substring(_t, i, {int(n)})) "
        f"ELSE array() END")
    return (lowered.select(F.col(id_col), grams.alias("_g"))
            .select(id_col, F.explode("_g").alias("gram")))


def char_ngram_model(ref: DataFrame, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Reference-corpus gram counts ``(gram, cnt)`` — ONE hash aggregation
    with map-side combine; output bounded by |alphabet|^n."""
    return (char_grams(ref, n, text_col, id_col)
            .groupBy("gram").agg(F.count(F.lit(1)).alias("cnt")))


def lm_rarity(docs: DataFrame, model: DataFrame, n: int = 3,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Integer-exact mean-inverse-probability score per document.

    Output: (doc_id, n_grams, rarity_micro) — docs with zero grams
    (shorter than n chars) carry rarity_micro = 0 with n_grams = 0.
    LOW = fluent under the reference model, HIGH = out-of-domain /
    garbage; filter/rank like CCNet's perplexity buckets.
    """
    total = model.agg(F.sum("cnt").cast("bigint").alias("_T"))
    grams = char_grams(docs, n, text_col, id_col)
    scored = (grams
              .join(F.broadcast(model), "gram", "left")
              .crossJoin(F.broadcast(total))
              .select(F.col(id_col),
                      F.expr(f"(_T * {MICRO}) div (coalesce(cnt, 0) + 1)")
                      .alias("_r")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                    F.expr("sum(_r) div count(1)").alias("rarity_micro")))
    base = docs.select(id_col).distinct()
    return (base.join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).cast("bigint")
                    .alias("n_grams"),
                    F.coalesce("rarity_micro", F.lit(0)).cast("bigint")
                    .alias("rarity_micro")))


def nll_score(docs: DataFrame, model: DataFrame, n: int = 3,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Float NLL/gram under add-one smoothing (production ranking path;
    NOT hash-gated — float ln differs across libms).  Same plan shape as
    ``lm_rarity``: broadcast model, one per-doc agg."""
    total = model.agg(F.sum("cnt").cast("double").alias("_T"),
                      F.count(F.lit(1)).cast("double").alias("_V"))
    grams = char_grams(docs, n, text_col, id_col)
    nll = -F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                 / (F.col("_T") + F.col("_V")))
    return (grams
            .join(F.broadcast(model), "gram", "left")
            .crossJoin(F.broadcast(total))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                 (F.sum(nll) / F.count(F.lit(1))).alias("nll_per_gram")))
