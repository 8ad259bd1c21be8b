"""PII redaction for web-text curation: emails, IPv4 addresses and
hyphenated phone numbers replaced with typed placeholder tokens, with
per-kind match counts.

Training-data pipelines scrub PII before packing (the reference's
EditFieldNames/attribute-rewrite stage, nusamai/src/transformer/
transform/attrname.rs, is the schema-level analog — this is the
value-level one a Common-Crawl corpus needs). Everything is map-side
Catalyst ``regexp_replace`` / ``regexp_count`` — zero shuffle, zero
Python, whole-stage codegen'd, so at 10^12 rows the stage is pure scan
throughput.

Cross-engine determinism: the patterns use only the regex subset with
identical semantics in Java (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, ``\\b`` ASCII word boundaries, no
backreferences or lookaround. Greedy quantifiers on these patterns are
unambiguous (leftmost match, maximal extent in both engines), so the
redacted strings are byte-identical and the gate can md5 them.

Kinds are applied IN ORDER (email -> ipv4 -> phone) and each kind's
count is taken on the text as it stands after the previous kind's
replacement — otherwise the digits inside an email's host would also
count as a phone/IP fragment. The oracle mirrors the same staged
pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — ordered. Patterns are valid and
# equivalent in Java regex and RE2.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{2,4}-\d{3,4}-\d{4}\b", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Append ``out_col`` (the redacted text) and one ``n_<kind>``
    count column per rule, applied in :data:`PII_RULES` order."""
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for kind, pat, rep in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("bigint")
                      .alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, rep)
    return df.select("*", *counts, cur.alias(out_col))


def pii_document_summary(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Gate-shaped projection: per document the per-kind counts, the
    md5 of the redacted text (byte-identity proxy) and its length."""
    red = redact_pii(df, text_col=text_col)
    return red.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(f"n_{kind}") for kind, _, _ in PII_RULES],
        F.md5(F.col("redacted")).alias("redacted_md5"),
        F.length(F.col("redacted")).cast("bigint").alias("n_chars_red"),
    )
