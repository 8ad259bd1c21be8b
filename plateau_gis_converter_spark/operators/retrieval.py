"""BM25-shaped full-text retrieval over the corpus (inverted scoring).

A curation pipeline constantly answers "which documents best match this
probe?" — benchmark-contamination audits, topic filtering, nearest
training docs for an eval item.  The classical engine for that is an
inverted index + BM25 (Robertson & Spärck Jones; the Okapi formulation
with k1 tf-saturation and b length normalization).  On Spark the index
IS a DataFrame of postings, and scoring is one join + one aggregation:

* **postings (map + one partial-agg shuffle)**: explode word-bigram
  terms -> ``(doc_id, term, tf)``.  Bigrams (not unigrams) keep the
  vocabulary discriminative on web text, same shape as
  ``dedup.shingles``.
* **corpus stats**: doc length ``dl`` (bigram count), total length
  ``T = sum(dl)``, doc count ``N`` — O(1) scalars; per-term ``df`` — a
  second partial agg over postings.
* **scoring**: queries are a SMALL relation -> ``broadcast`` join
  against postings on term (the posting-list probe; never a corpus
  shuffle), then one groupBy (query, doc) sum.
* **top-k**: ``row_number`` per query over (score desc, doc_id).

INTEGER-EXACT scoring (the house discipline — integer-exact PageRank,
geohash, raster): with k1 = 6/5 and b = 3/4, the Okapi tf-saturation
term ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with the exact
rational ``avgdl = T/N`` reduces to the all-integer ratio

    sat_micro = (22 * tf * T * 10^6) // (10*tf*T + 3*T + 9*dl*N)

and the idf uses the exact-rational surrogate ``idf_micro =
((N - df) * 10^6) // df + 10^6`` — monotone-decreasing in df like
``ln((N - df + .5)/(df + .5))`` but with no transcendental, so both
engines agree bit-for-bit (a float ``ln`` can round differently across
libms, which a value-hash gate cannot tolerate).  Score =
``sum(idf_micro * sat_micro // 10^6)``.  Overflow bound: the sat
numerator needs ``22 * tf * T * 10^6 < 2^63`` i.e. ``tf * T <
4.2e11`` — fine through sf1-scale fixtures; a trillion-token corpus
runs the same plan with the documented float scoring (``exact=False``)
where hash-gating is not required.

Scale: postings/df are partial-aggregated (map-side combine), the query
side is broadcast, and nothing ever collects the corpus.  Skewed terms
(stop-bigrams) are a real hazard at web scale — cap them upstream with
``frequent.heavy_hitters`` as a stop-list (the standard trick), which
composes as a broadcast anti-join on term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _ngrams, _tokens

MICRO = 1_000_000


def doc_terms(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) posting occurrences — word bigrams, one per
    occurrence (tf = occurrence count downstream)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(F.col(text_col)).alias("toks"))
    return toks.select("doc_id",
                       F.explode(_ngrams(F.col("toks"), 2)).alias("term"))


def postings(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) + per-doc length dl — one partial-agg shuffle."""
    occ = doc_terms(docs, text_col, id_col)
    tf = occ.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    dl = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"))
    return tf.join(dl, "doc_id")


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              exact: bool = True, post: DataFrame | None = None) -> DataFrame:
    """Top-k docs per query by BM25 (k1=1.2, b=0.75).

    ``queries``: (query_id bigint, term string) — one row per query
    term.  Returns (query_id, rank, doc_id, score_micro).

    ``exact=True`` (default): the integer-exact rational scoring above —
    hash-gateable, valid while ``22 * tf * T * 10^6 < 2^63``.
    ``exact=False``: the standard Okapi float scoring (ln idf) for
    corpora past the int64 ceiling; same plan shape, same ranking
    tiebreak, score in micro-units rounded to bigint.
    """
    # materialize the postings relation ONCE (the classic "build the
    # index" stage — at production scale this is a parquet/bucketed
    # table, cf. sources/bucketed.py); without it the tf/df/stats/score
    # consumers would each re-run the tokenize+explode scan (audited:
    # 18 exchanges -> 8, ~2x wall at sf0.1). r6: callers that already
    # hold the materialized index pass it via ``post`` — the gate entry
    # shares ONE postings build between corpus_queries and the scorer.
    if post is None:
        post = postings(docs, text_col, id_col).localCheckpoint(eager=True)
    # O(1) corpus scalars: N docs with >=1 term, T total bigram tokens
    row = (post.groupBy("doc_id").agg(F.max("dl").alias("dl"))
           .groupBy().agg(F.count(F.lit(1)).alias("n"),
                          F.sum("dl").alias("t"))
           .collect()[0])
    n_docs, t_total = int(row["n"]), int(row["t"])
    dfreq = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))

    q = F.broadcast(queries.select("query_id", "term"))
    hits = (post.join(q, "term")
            .join(F.broadcast(dfreq), "term"))
    if exact:
        # `div` = exact int64 integer division (never a double
        # round-trip) — the only ceiling is int64 overflow:
        # 22*tf*T*1e6 < 2^63
        contrib = F.expr(
            f"(((({n_docs} - df) * {MICRO}) div df + {MICRO})"
            f" * ((22 * tf * {t_total} * {MICRO})"
            f"    div (10 * tf * {t_total} + 3 * {t_total}"
            f"         + 9 * dl * {n_docs}))) div {MICRO}")
    else:
        idf = F.log(F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5))
        avgdl = float(t_total) / float(n_docs)
        sat = (F.col("tf") * 2.2) / (
            F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl))
        contrib = F.round(idf * sat * MICRO).cast("bigint")
    scored = (hits.withColumn("c", contrib)
              .groupBy("query_id", "doc_id")
              .agg(F.sum("c").cast("bigint").alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("bigint"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score_micro"))


def corpus_queries(docs: DataFrame, n_queries: int = 8,
                   skip: int = 5, text_col: str = "text",
                   id_col: str = "doc_id",
                   post: DataFrame | None = None) -> DataFrame:
    """Deterministic corpus-derived probe queries: rank terms by
    (df desc, term), skip the ``skip`` most common (stop-bigrams), and
    pair consecutive ranks into ``n_queries`` two-term queries.  Purely
    a fixture generator for gates/benches — real callers pass their own
    query relation."""
    # r6: with a prebuilt (doc_id, term, tf) index, df per term is the
    # plain row count (one row per distinct (doc, term)) — identical to
    # count_distinct(doc_id) over raw occurrences
    if post is not None:
        dfreq = (post.groupBy("term")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("df")))
    else:
        dfreq = (doc_terms(docs, text_col, id_col)
                 .groupBy("term")
                 .agg(F.count_distinct("doc_id").alias("df")))
    # r6 OPTIMIZATION: the global row_number window forced a
    # single-partition sort of the full term dictionary; only the top
    # skip + 2*n_queries terms can survive, so take them with
    # orderBy().limit() (planned as TakeOrderedAndProject — parallel
    # partial top-k per partition, merged once) and rank inside that
    # O(n_queries) relation. Same order key, identical ranks.
    m = skip + 2 * n_queries
    top = dfreq.orderBy(F.col("df").desc(), F.col("term")).limit(m)
    w = Window.orderBy(F.col("df").desc(), F.col("term"))
    ranked = (top.withColumn("r", F.row_number().over(w))
              .where(F.col("r") > skip))
    return ranked.select(
        F.floor((F.col("r") - skip - 1) / 2).cast("bigint")
        .alias("query_id"),
        "term")


def positional_postings(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Positional inverted index as a DataFrame: (doc_id, pos, term) with
    0-based token positions — the index layout phrase/proximity queries
    need (Lucene's positions file, Manning IR §2.4.2). Map-only: one
    posexplode of the token array; at 10^12 docs this is a staged table
    partitioned/bucketed by term."""
    t = docs.select(id_col, _tokens(F.col(text_col)).alias("_t"))
    return t.select(id_col, F.posexplode("_t").alias("pos", "term")) \
        .select(id_col, F.col("pos").cast("bigint").alias("pos"), "term")


def phrase_match(docs: DataFrame, phrases: DataFrame,
                 phrase_col: str = "phrase", qid_col: str = "query_id",
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """EXACT phrase search over the positional index: for each (query_id,
    phrase) return every document containing the phrase's tokens
    CONSECUTIVELY, with occurrence count and first position.

    The classic decomposition (Manning IR §2.4.2): a phrase [q0..qk]
    matches doc d at base position p iff token qj sits at p+j for every
    j. In relational form: join postings to phrase terms, normalize each
    hit to ``base = pos - qpos``, and a base where the DISTINCT matched
    qpos count equals the phrase length is a full consecutive match
    (duplicate terms inside the phrase are handled because each qpos is
    tested independently at the same base).

    Scale: the phrase relation is tiny -> broadcast against the postings
    (never a corpus shuffle); the match test is one partial-agg groupBy
    keyed by (query, doc, base); per-doc fan-out is bounded by phrase
    length x tf of the phrase's terms in that doc. Zero Python, zero
    driver data.

    Output: (query_id, doc_id, n_hits, first_pos).
    """
    qt = phrases.select(qid_col, _tokens(F.col(phrase_col)).alias("_qt"))
    qterms = (qt.select(qid_col, F.size("_qt").alias("qlen"),
                        F.posexplode("_qt").alias("qpos", "term"))
              .select(qid_col, F.col("qlen").cast("bigint").alias("qlen"),
                      F.col("qpos").cast("bigint").alias("qpos"), "term"))
    post = positional_postings(docs, text_col, id_col)
    hits = (post.join(F.broadcast(qterms), "term")
            .select(qid_col, id_col,
                    (F.col("pos") - F.col("qpos")).alias("base"),
                    "qpos", "qlen")
            .where(F.col("base") >= 0))
    matches = (hits.groupBy(qid_col, id_col, "base", "qlen")
               .agg(F.countDistinct("qpos").alias("__nq"))
               .where(F.col("__nq") == F.col("qlen")))
    return (matches.groupBy(qid_col, id_col)
            .agg(F.count(F.lit(1)).alias("n_hits"),
                 F.min("base").alias("first_pos")))


def corpus_phrases(docs: DataFrame, every: int = 97, start: int = 3,
                   length: int = 4, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus-derived probe phrases (fixture generator, like
    corpus_queries): for docs with id % every == 0 and enough tokens,
    the phrase is tokens [start, start+length) — so each phrase has at
    least its source doc as a guaranteed hit."""
    t = docs.select(id_col, _tokens(F.col(text_col)).alias("_t"))
    return (t.where((F.col(id_col) % every == 0)
                    & (F.size("_t") >= start + length))
            .select(F.col(id_col).alias("query_id"),
                    F.array_join(F.slice("_t", start + 1, length), " ")
                    .alias("phrase")))


def tfidf_topk_terms(docs: DataFrame, k: int = 5, n_docs: int | None = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Top-k TF-IDF terms per document — keyword extraction / salient-
    term tagging over the corpus (the per-doc dual of bm25_topk's
    per-query ranking; same postings relation, one extra window).

    idf is quantized once per TERM (idf_e6 = floor(10^6 * ln((N+1)/(df+1))
    + 0.5)) so the per-posting score tf * idf_e6 is pure integer
    arithmetic — associative, partition-order free, and the double ln is
    evaluated in one identical op order in both engines. Ranking is
    deterministic: (score desc, term asc) within each doc.

    Scale: postings + df are partial-agg shuffles on the term key; the
    top-k window partitions by doc_id — the natural key, never skewed
    beyond one doc's vocabulary. No Python anywhere.
    """
    if n_docs is None:
        n_docs = docs.count()
    post = postings(docs, text_col, id_col).select("doc_id", "term", "tf")
    df_rel = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    idf_e6 = F.floor(F.log((F.lit(float(n_docs) + 1.0))
                           / (F.col("df").cast("double") + F.lit(1.0)))
                     * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    scored = (post.join(df_rel, "term")
              .select("doc_id", "term", "tf", "df",
                      (F.col("tf") * idf_e6).alias("score_e6")))
    w = Window.partitionBy("doc_id").orderBy(F.col("score_e6").desc(),
                                             F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select("doc_id", "term", F.col("tf").cast("bigint").alias("tf"),
                    "df", "score_e6", F.col("rank").cast("int").alias("rank")))


def maxscore_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
                  text_col: str = "text", id_col: str = "doc_id",
                  post: DataFrame | None = None) -> DataFrame:
    """Top-k BM25 with MaxScore candidate pruning (Turtle & Flood 1995;
    the block-max/WAND family) — LOSSLESSLY identical output to
    ``bm25_topk(exact=True)``, but the expensive per-(query, doc)
    aggregation only runs over docs that can still reach the top-k.

    The relational recast of MaxScore:

    1. **seed θ**: exact-score only the docs containing ALL of a
       query's terms (a tiny conjunctive subset — one countDistinct
       filter) and take the k-th best score as θ.  θ is a LOWER bound
       on the final k-th score, so it is always safe; if fewer than k
       conjunctive docs exist, θ = −∞ (no pruning, exact fallback).
    2. **term classification**: per term, ub = max per-doc contribution
       over the probed postings (one partial agg).  Sort a query's
       terms by ub ascending; a term is NON-essential when the
       inclusive prefix sum of ubs is < θ.  Any doc containing only
       non-essential terms scores ≤ that prefix sum < θ ≤ final k-th
       score — strictly below, so it can never enter the top-k under
       the (score desc, doc_id) tiebreak.  The top-ub term is always
       essential (θ ≤ Σ ub), so candidates are never empty.
    3. **score candidates**: docs holding ≥1 essential term (one
       equi-join), exact-scored over ALL their query hits.

    At web scale this is the difference between aggregating the full
    posting lists of stop-ish terms (huge df, tiny idf → tiny ub →
    non-essential) and touching them only for already-candidate docs.
    The gate's oracle is the FULL exact BM25 ranking, so the gate is a
    losslessness proof, same pattern as ``heavy_hitters`` /
    ``decontaminate_bloom``.  Scale: postings/df/ub are partial aggs;
    queries/θ/term-classes are O(|queries|) broadcasts; the candidate
    join is an equi-join keyed by (query, doc) — no all-pairs anywhere.
    """
    if post is None:
        post = postings(docs, text_col, id_col).localCheckpoint(eager=True)
    row = (post.groupBy("doc_id").agg(F.max("dl").alias("dl"))
           .groupBy().agg(F.count(F.lit(1)).alias("n"),
                          F.sum("dl").alias("t"))
           .collect()[0])
    n_docs, t_total = int(row["n"]), int(row["t"])
    dfreq = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    q = F.broadcast(queries.select("query_id", "term"))
    qlen = queries.groupBy("query_id").agg(
        F.countDistinct("term").alias("qlen"))
    contrib = F.expr(
        f"(((({n_docs} - df) * {MICRO}) div df + {MICRO})"
        f" * ((22 * tf * {t_total} * {MICRO})"
        f"    div (10 * tf * {t_total} + 3 * {t_total}"
        f"         + 9 * dl * {n_docs}))) div {MICRO}")
    # the probed postings subset (bounded by the query terms' df) is
    # reused three times (θ seed, ub, candidate scoring) — pin it once
    hits = (post.join(q, "term").join(F.broadcast(dfreq), "term")
            .withColumn("c", contrib)
            .select("query_id", "doc_id", "term", "c")
            .localCheckpoint(eager=True))

    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id"))
    conj = (hits.groupBy("query_id", "doc_id")
            .agg(F.countDistinct("term").alias("nt"),
                 F.sum("c").cast("bigint").alias("score_micro"))
            .join(F.broadcast(qlen), "query_id")
            .where(F.col("nt") == F.col("qlen")))
    theta = (conj.withColumn("r", F.row_number().over(w_rank))
             .where(F.col("r") == k)
             .select("query_id", F.col("score_micro").alias("theta")))

    ub = hits.groupBy("query_id", "term").agg(F.max("c").alias("ub"))
    w_cum = (Window.partitionBy("query_id")
             .orderBy(F.col("ub").asc(), F.col("term"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ess = (ub.join(F.broadcast(theta), "query_id", "left")
           .withColumn("cum", F.sum("ub").over(w_cum))
           .where(F.col("theta").isNull()
                  | (F.col("cum") >= F.col("theta")))
           .select("query_id", "term"))

    cand = (hits.join(F.broadcast(ess), ["query_id", "term"])
            .select("query_id", "doc_id").distinct())
    scored = (hits.join(cand, ["query_id", "doc_id"])
              .groupBy("query_id", "doc_id")
              .agg(F.sum("c").cast("bigint").alias("score_micro")))
    return (scored.withColumn("rank",
                              F.row_number().over(w_rank).cast("bigint"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score_micro"))


def prefix_completions(queries: DataFrame, query_col: str = "q",
                       min_len: int = 1, max_len: int = 10,
                       top_k: int = 3) -> DataFrame:
    """Autocomplete index: for every character prefix (lengths
    ``min_len``..``max_len``) of every query string, the ``top_k``
    completions by frequency (count desc, query asc — a deterministic
    total order). The suggest-as-you-type aggregation every search box
    runs over its query log.

    Shape: ONE partial-agg count per distinct query first (the fact
    table is touched once), then a bounded map-side prefix explode
    (<= max_len rows per DISTINCT query — never per log row) and one
    window over the per-prefix relation. A hot prefix like "t" ranks
    its distinct completions, not the raw log.

    Output: (prefix, q, n, rank) with rank 1..top_k.
    """
    if not 1 <= min_len <= max_len:
        raise ValueError(f"need 1 <= min_len <= max_len, "
                         f"got {min_len}..{max_len}")
    q = F.col(query_col)
    counts = (queries.where(q.isNotNull() & (F.length(q) >= min_len))
              .groupBy(q.alias("q"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    prefixes = F.expr(
        f"transform(sequence({int(min_len)}, "
        f"least(char_length(q), {int(max_len)})), "
        f"i -> substr(q, 1, i))")
    pref = counts.select(F.explode(prefixes).alias("prefix"), "q", "n")
    w = Window.partitionBy("prefix").orderBy(F.col("n").desc(),
                                             F.col("q"))
    return (pref.withColumn("rank", F.row_number().over(w)
                            .cast("bigint"))
            .where(F.col("rank") <= int(top_k)))


def snippet_extract(docs: DataFrame, term: str, context: int = 20,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Keyword-in-context (KWIC) snippet extraction: every
    non-overlapping occurrence of ``term`` with up to ``context``
    characters either side — the search-results highlighter, and the
    concordance view corpus linguists audit matches with.

    Map-side only: one regexp_extract_all + posexplode, zero shuffle.
    Both engines share the identical greedy leftmost-first pattern
    (Java regex and RE2 agree on leftmost-first semantics for this
    lookaround-free shape); the term is regex-escaped, so any literal
    query string is safe.

    Output: (doc_id, idx, snippet) — idx numbers occurrences in
    document order.
    """
    import re as _re

    if context < 0:
        raise ValueError(f"context must be >= 0, got {context}")
    pat = (f"(.{{0,{int(context)}}}{_re.escape(term)}"
           f".{{0,{int(context)}}})")
    snips = F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)
    return (docs.select(F.col(id_col),
                        F.posexplode(snips).alias("idx", "snippet"))
            .select(id_col, F.col("idx").cast("bigint").alias("idx"),
                    "snippet"))


def ndcg_at_k(results: DataFrame, rels: DataFrame, k: int = 5,
              query_col: str = "query_id", doc_col: str = "doc_id",
              rank_col: str = "rank",
              rel_col: str = "rel") -> DataFrame:
    """nDCG@k — the ranking-quality number every retrieval change is
    judged by: DCG of the system's top-k against the IDEAL ordering of
    ALL judged documents for the query (including ones the system
    missed — that is the point of the normalization).

    Integer discipline (the token_entropy rule): each position's gain
    rel / log2(rank + 1) is ONE fixed-op-order double floor-quantized
    to micro units BEFORE the sum, so both DCG and IDCG are
    associative integer aggregates; ndcg_milli = 1000 * dcg div idcg.
    The ideal ranking is a row_number window per query over the JUDGED
    relation (bounded by judgments per query, never corpus size),
    ordered (rel desc, doc asc) — deterministic under tied grades.

    Output: (query_id, dcg_micro, idcg_micro, ndcg_milli) — one row
    per query with at least one positive judgment.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")

    def gain(rel, rank):
        # explicit ln ratio instead of log2: both engines' natural log
        # is gate-proven bit-identical; a native log2 may differ in the
        # last ulp between libm implementations
        return F.floor(
            rel.cast("double")
            / (F.log(rank.cast("double") + F.lit(1.0))
               / F.log(F.lit(2.0)))
            * F.lit(1e6) + F.lit(0.5)).cast("bigint")

    r = results.select(F.col(query_col).alias("q"),
                       F.col(doc_col).alias("doc"),
                       F.col(rank_col).cast("bigint").alias("rk"))
    j = rels.select(F.col(query_col).alias("q"),
                    F.col(doc_col).alias("doc"),
                    F.col(rel_col).cast("bigint").alias("rel"))
    dcg = (r.where(F.col("rk") <= int(k))
           .join(j, ["q", "doc"])
           .groupBy("q")
           .agg(F.sum(gain(F.col("rel"), F.col("rk")))
                .cast("bigint").alias("dcg_micro")))
    wi = Window.partitionBy("q").orderBy(F.col("rel").desc(),
                                         F.col("doc"))
    ideal = (j.where(F.col("rel") > 0)
             .withColumn("irk", F.row_number().over(wi))
             .where(F.col("irk") <= int(k))
             .groupBy("q")
             .agg(F.sum(gain(F.col("rel"), F.col("irk")))
                  .cast("bigint").alias("idcg_micro")))
    out = ideal.join(dcg, "q", "left")
    return out.select(
        F.col("q").alias(query_col),
        F.coalesce(F.col("dcg_micro"), F.lit(0)).cast("bigint")
        .alias("dcg_micro"),
        "idcg_micro",
        F.when(F.col("idcg_micro") > 0,
               F.expr("1000 * coalesce(dcg_micro, 0) div idcg_micro"))
        .cast("bigint").alias("ndcg_milli"))
