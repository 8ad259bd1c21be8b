"""Text-analysis operators for a large-scale training-data pipeline over the
``documents`` table (doc_id, text, lang, source, n_chars).

All of these are pure Catalyst expressions (JVM codegen, no Python), designed
so that an equivalent ANSI-SQL oracle exists — tokenization and counting are
defined via regexes that behave identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tokens = maximal runs of word characters; identical regex semantics in
# Spark (Java regex) and DuckDB (RE2) for this simple class.
TOKEN_SPLIT = r"[^A-Za-z0-9_]+"

# a tiny embedded stopword list for the language-ID heuristic
EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"]


def token_count(text: Column) -> Column:
    """Whitespace/punct token count: number of word-character runs."""
    toks = F.split(F.trim(text), TOKEN_SPLIT)
    return F.size(F.filter(toks, lambda t: t != "")).cast("bigint")


def char_classes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_alpha / n_digit / n_punct / n_space counts (regex-replace
    length-difference trick — identical in both engines)."""
    t = F.col(text_col)
    ln = F.length(t)
    return (df
            .withColumn("n_alpha", ln - F.length(F.regexp_replace(t, r"[A-Za-z]", "")))
            .withColumn("n_digit", ln - F.length(F.regexp_replace(t, r"[0-9]", "")))
            .withColumn("n_punct", ln - F.length(F.regexp_replace(t, r"[.,;:!?]", "")))
            .withColumn("n_space", ln - F.length(F.regexp_replace(t, r" ", ""))))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    length band, punctuation ratio, mean token length band. Deterministic,
    rational arithmetic ordered to be engine-identical."""
    t = F.col(text_col)
    df = char_classes(df, text_col)
    ln = F.length(t).cast("double")
    ntok = token_count(t).cast("double")
    punct_ratio = F.when(ln > 0, F.col("n_punct") / ln).otherwise(F.lit(0.0))
    mean_tok = F.when(ntok > 0, F.col("n_alpha") / ntok).otherwise(F.lit(0.0))
    score = (
        F.when((ln >= 200) & (ln <= 20000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return (df.withColumn("n_tokens", token_count(t))
              .withColumn("punct_ratio", punct_ratio)
              .withColumn("quality", score))


def lang_id_heuristic(text: Column) -> Column:
    """n-gram/stopword language-ID heuristic: classify 'en' when enough
    English stopwords appear as standalone tokens, else 'other'. (A real
    deployment would plug fasttext via mapInPandas — same plumbing.)"""
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = None
    for w in EN_STOPWORDS:
        # count non-overlapping " w " occurrences via length difference
        h = (F.length(t) - F.length(F.regexp_replace(t, f"\\b{w}\\b", ""))) / len(w)
        hits = h if hits is None else hits + h
    return F.when(hits >= 3, F.lit("en")).otherwise(F.lit("other"))


def doc_fingerprint(text: Column) -> Column:
    """Document fingerprint: 64-bit-truncated md5 (first 16 hex chars) —
    stable across engines, used for exact dedup grouping."""
    return F.substring(F.md5(text), 1, 16)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    df = quality_score(df, text_col)
    return (df
            .withColumn("lang_pred", lang_id_heuristic(F.col(text_col)))
            .withColumn("fingerprint", doc_fingerprint(F.col(text_col))))


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), TOKEN_SPLIT),
                    lambda t: t != "")


def _ngrams(toks: Column, n: int) -> Column:
    """Overlapping n-grams joined by single spaces; [] when < n tokens.

    Same zip_with-over-shifted-slices fold as dedup.shingles — the
    transform/element_at shape re-evaluates the source expression per
    element (25x slower, measured in round 2). ``toks`` MUST be a
    materialized projection attribute, not an inline expression, for the
    same reason. The ``greatest`` guard keeps short docs at [] (F.slice
    with length 0 is empty; no fabricated grams).
    """
    if n == 1:
        return toks
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(2, n + 1):
        grams = F.zip_with(grams, F.slice(toks, j, m),
                           lambda x, y: F.concat(x, F.lit(" "), y))
    return grams


def repetition_signals(df: DataFrame, text_col: str = "text",
                       ns: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Gopher-style repetition quality signals per document: for each
    n in ``ns``, the fraction of the doc occupied by its single most
    frequent n-gram, plus the distinct-unigram ratio. High top-n-gram
    fractions flag boilerplate / keyword-stuffed / degenerate pages.

    Output (docs with ≥1 token): doc_id, n_words, n_distinct_words,
    top{n}_frac_e6 for each n — fractions as round-half-up ppm computed
    with exact integer arithmetic so the DuckDB oracle is bit-identical.

    Scale: ONE explode of all n-gram structs + two hash aggregations
    (both with map-side partial combine, keyed by doc) — no join, no
    window. State per doc is O(distinct n-grams), the same order as the
    tokenizer output it consumes.
    """
    tdf = df.select("doc_id", _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    def _tag(n: int):
        # NB: must stay a ONE-arg lambda — F.transform passes the element
        # index to a second parameter, which would shadow an `n=n` default
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    gram_structs = F.flatten(F.array(*[
        F.transform(_ngrams(toks, n), _tag(n)) for n in ns]))
    exploded = (tdf.select("doc_id", F.explode(gram_structs).alias("ng"))
                .select("doc_id", F.col("ng.n").alias("n"),
                        F.col("ng.g").alias("g")))
    counts = exploded.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).alias("cnt"))

    def _for(n: int, expr: Column) -> Column:
        return F.when(F.col("n") == n, expr)

    aggs = [
        F.coalesce(F.sum(_for(1, F.col("cnt"))), F.lit(0))
        .cast("bigint").alias("n_words"),
        F.coalesce(F.count(_for(1, F.lit(1))), F.lit(0))
        .cast("bigint").alias("n_distinct_words"),
    ]
    for n in ns:
        aggs.append(F.max(_for(n, F.col("cnt"))).alias(f"top{n}"))
        aggs.append(F.sum(_for(n, F.col("cnt"))).alias(f"total{n}"))
    grouped = counts.groupBy("doc_id").agg(*aggs)
    # round-half-up ppm with exact integer arithmetic (`div` = integer
    # division in Spark SQL and `//` in DuckDB): (top*2e6 + total) div (2*total)
    fracs = [
        F.when(F.col(f"total{n}").isNotNull() & (F.col(f"total{n}") > 0),
               F.expr(f"(top{n} * 2000000 + total{n}) div (2 * total{n})"))
        .otherwise(F.lit(0)).cast("bigint").alias(f"top{n}_frac_e6")
        for n in ns]
    return grouped.select("doc_id", "n_words", "n_distinct_words", *fracs)


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4,
                        text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-gram, slide a window
    of ``w`` consecutive hashes, select the RIGHTMOST minimal hash per
    window, deduplicate the selected (position, hash) pairs.

    Guarantee: any substring match of at least k + w - 1 tokens between
    two documents shares at least one selected fingerprint, while only
    ~2/(w+1) of all k-gram hashes are kept — the principled middle
    ground between full-shingle Jaccard (exact, heavy) and MinHash
    (fixed-size, probabilistic). The classic use is plagiarism /
    text-reuse detection; joining on ``fp`` gives reuse candidates with
    positional evidence.

    Pure Catalyst and MAP-ONLY: the token array materializes once, the
    hash array is a transform, window minima come from slice +
    array_min + reverse + array_position (rightmost tie-break), and the
    per-doc dedup is array_distinct BEFORE the explode — zero shuffles,
    zero Python; the output explode is bounded by the selected
    fingerprints, not the k-grams. Docs with fewer than k + w - 1
    tokens yield no fingerprints (no full window exists).

    Output: (doc_id, pos, fp) — pos is the 1-based k-gram index of the
    selected hash.
    """
    toks = _tokens(F.col(text_col))
    tdf = docs.select("doc_id", toks.alias("__toks"))
    grams = _ngrams(F.col("__toks"), k)
    hdf = tdf.select(
        "doc_id",
        F.transform(grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15),
                                            16, 10).cast("bigint"))
        .alias("__hs"))
    hs = F.col("__hs")
    nw = F.size(hs) - F.lit(w - 1)

    def pick(i):
        win = F.slice(hs, i, w)
        mn = F.array_min(win)
        pos = (i + F.lit(w) - F.array_position(F.reverse(win), mn)) \
            .cast("bigint")
        return F.struct(pos.alias("pos"), mn.alias("fp"))

    sel = F.when(nw >= 1,
                 F.array_distinct(
                     F.transform(F.sequence(F.lit(1), F.greatest(nw, F.lit(1))),
                                 pick))) \
        .otherwise(F.array().cast("array<struct<pos:bigint,fp:bigint>>"))
    return (hdf.select("doc_id", F.explode(sel).alias("s"))
            .select("doc_id", F.col("s.pos").alias("pos"),
                    F.col("s.fp").alias("fp")))


def bigram_collocations(docs: DataFrame, min_count: int = 5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Corpus collocation mining: adjacent word pairs whose observed
    frequency beats independence — template/boilerplate phrase
    discovery, tokenizer-merge candidates (the BPE pair rule IS
    max-count bigram mining), and index phrase selection all start
    here.

    Scored by the integer-exact PMI surrogate (house rule — no
    transcendental in gated paths; same discipline as retrieval.py's
    idf):

        lift_micro = n_ab * N * 10^6 div (n_a * n_b)

    the likelihood ratio P(ab)/(P(a)P(b)) in micro units — exp(PMI), so
    identical ranking.  ``N`` = total token count; independence is
    lift ~10^6; strong collocations reach 10^8+.

    Shape: everything is partial-agg shuffles on bounded-cardinality
    keys (bigrams/unigrams), never a pair join: bigram counts (ONE agg
    over adjacent pairs — adjacency caps the blowup at |doc| pairs per
    doc, not |doc|^2), unigram counts (one agg), N (one scalar folded
    back by a 1-row broadcast cross join, the hits_scores pattern), and
    two broadcast-sized joins of the bigram relation against the
    unigram relation.  ``min_count`` prunes the hapax tail BEFORE the
    joins, bounding the scored relation.

    Overflow: n_ab * N * 10^6 < 2^63 needs n_ab * N < 9.2e12 — at a
    10^12-token corpus, pre-scale N to milli units (documented, not
    silent).
    """
    toks = (docs.select(F.col(id_col), _tokens(F.col(text_col))
                        .alias("_t")))
    uni = (toks.select(F.explode("_t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("n_w")))
    big = (toks.select(F.explode(F.expr(
        "CASE WHEN size(_t) >= 2 THEN "
        " zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1), "
        "          (a, b) -> struct(a AS w_a, b AS w_b)) "
        "ELSE array() END")).alias("p"))
        .select("p.w_a", "p.w_b")
        .groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= int(min_count)))
    total = uni.agg(F.sum("n_w").cast("bigint").alias("_N"))
    na = uni.select(F.col("w").alias("w_a"), F.col("n_w").alias("n_a"))
    nb = uni.select(F.col("w").alias("w_b"), F.col("n_w").alias("n_b"))
    return (big.join(F.broadcast(na), "w_a")
            .join(F.broadcast(nb), "w_b")
            .crossJoin(F.broadcast(total))
            .select("w_a", "w_b", "n_ab", "n_a", "n_b",
                    F.expr("n_ab * _N * 1000000 div (n_a * n_b)")
                    .cast("bigint").alias("lift_micro")))


def token_entropy(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document token-distribution Shannon entropy — the lexical-
    diversity / gibberish signal (keyword-stuffed and boilerplate pages
    sit far below prose of the same length; repeated-token spam
    approaches 0). Quantized to integer micro-nats so the value is
    engine-reproducible: entropy = ln(n) - (1/n) * sum(c_i * ln(c_i))
    becomes ln_e6(n) - (sum_i floor(ln(c_i)*c_i*1e6 + 0.5)) DIV n —
    each term quantized BEFORE the sum, so the aggregate is integer and
    merge-order free (the module's float-determinism discipline).

    One tokenize+explode map stage and one partial-agg groupBy per
    level — no windows, no joins.

    Output: (doc_id, n_tokens, n_distinct, entropy_e6_nats).
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(F.col(text_col)).alias("toks"))
    occ = toks.select("doc_id", F.explode("toks").alias("tok"))
    cnt = occ.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    term = F.floor(F.log(F.col("c").cast("double"))
                   * F.col("c").cast("double") * F.lit(1e6)
                   + F.lit(0.5)).cast("bigint")
    agg = (cnt.groupBy("doc_id")
           .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                F.sum(term).cast("bigint").alias("s")))
    ln_n = F.floor(F.log(F.col("n_tokens").cast("double")) * F.lit(1e6)
                   + F.lit(0.5)).cast("bigint")
    return agg.select(
        "doc_id", "n_tokens", "n_distinct",
        (ln_n - F.expr("s DIV n_tokens")).cast("bigint")
        .alias("entropy_e6_nats"))


def readability_milli(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease per document in exact MILLI-points — the
    classic curation quality signal (C4/Gopher-style pipelines gate on
    readability bands; machine-generated and boilerplate text scores
    abnormally).

    Deterministic integer recipe (both engines evaluate it identically,
    so the gate is bit-exact — the float Flesch constant chain would
    diverge in the last ulp):

      words     W = non-empty [a-z0-9']+ runs of the lowercased text
      sentences S = max(1, count of [.!?]+ runs)
      syllables V = max(W, count of [aeiouy]+ vowel GROUPS) — the
                    standard vowel-run approximation, floored at one
                    per word
      fre_milli = 206835 - 1015*((1000*W) DIV S) DIV 1000 * ... — all
                  ratios pre-scaled by 1000 then DIV'd, exactly:
                  206835 - (1015*a) DIV 1000 - (84600*b) DIV 1000
                  with a = (1000*W) DIV S, b = (1000*V) DIV W.

    Scale: pure map-side Catalyst (regexp counts + integer math), no
    shuffle, no Python. Empty/wordless docs emit NULL score.
    """
    t = F.lower(F.col(text_col))
    # count of non-overlapping regex runs = length delta / run collapse:
    # replace each run with one char, count sentinel chars
    def runs(pattern: str) -> F.Column:
        collapsed = F.regexp_replace(t, pattern, "\x01")
        return (F.length(collapsed)
                - F.length(F.regexp_replace(collapsed, "\x01", ""))
                ).cast("bigint")

    w = runs(r"[a-z0-9']+")
    s = F.greatest(F.lit(1).cast("bigint"), runs(r"[.!?]+"))
    v = F.greatest(w, runs(r"[aeiouy]+"))
    return (docs.select(F.col(id_col), w.alias("__w"), s.alias("__s"),
                        v.alias("__v"))
            .select(id_col, F.col("__w").alias("n_words"),
                    F.col("__s").alias("n_sentences"),
                    F.col("__v").alias("n_syllables"),
                    F.when(F.col("__w") > 0,
                           F.lit(206835)
                           - F.expr("CAST((1015 * ((1000 * __w) DIV __s)) "
                                    "DIV 1000 AS BIGINT)")
                           - F.expr("CAST((84600 * ((1000 * __v) DIV __w)) "
                                    "DIV 1000 AS BIGINT)"))
                    .alias("fre_milli")))


def sentence_chunks(docs: DataFrame, chunk_tokens: int = 64,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sentence-boundary chunking — the RAG / embedding-index
    preparation step: split each document into sentences (runs of
    non-terminator characters plus their trailing ``.!?`` — a CONSUMING
    pattern, because the oracle's RE2 has no lookbehind), then pack
    consecutive sentences into chunks by a token budget. A sentence
    lands in chunk floor((cum_tokens - 1) / chunk_tokens) — the
    end-position bucket rule: greedy, deterministic, never splits a
    sentence (an over-budget sentence occupies its own bucket span).

    Shape: one regex explode, one per-doc window over the SENTENCE
    relation (bounded by sentences per doc, not corpus size), one
    groupBy whose chunk text is rebuilt order-exactly via
    array_sort(collect_list(struct(sid, s))) — never a bare
    collect_list (assembly order is not deterministic).

    Output: (doc_id, chunk_id, n_sentences, n_tokens, chunk_text).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    sents = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.regexp_extract_all(
            F.col(text_col), F.lit(r"[^.!?]+[.!?]*"), 0))
        .alias("sid", "raw"))
        .select("doc_id", "sid", F.trim(F.col("raw")).alias("s"))
        .where(F.col("s") != ""))
    ntok = F.size(F.filter(F.split(F.col("s"), r"\s+"),
                           lambda t: t != ""))
    w = (Window.partitionBy("doc_id").orderBy("sid")
         .rowsBetween(Window.unboundedPreceding, 0))
    packed = (sents.withColumn("nt", ntok.cast("bigint"))
              .withColumn("cum", F.sum("nt").over(w))
              .withColumn("chunk_id",
                          F.expr(f"(cum - 1) div {int(chunk_tokens)}")
                          .cast("bigint")))
    parts = F.array_sort(F.collect_list(F.struct("sid", "s")))
    return (packed.groupBy("doc_id", "chunk_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
                 F.sum("nt").cast("bigint").alias("n_tokens"),
                 F.array_join(F.transform(parts, lambda x: x["s"]),
                              " ").alias("chunk_text")))


def token_windows(docs: DataFrame, window: int = 32, stride: int = 16,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Sliding token windows with overlap — the long-document embedding
    preparation (BERT-style max-length windows with stride, exactly the
    Hugging Face ``return_overflowing_tokens`` layout) complementing
    ``sentence_chunks``' boundary-aware packing: fixed geometry, known
    overlap, no dependence on punctuation.

    Map-side only: one tokenize, one bounded explode (ceil(n/stride)
    windows per doc), one slice+join per window — zero shuffle. The
    tail window is kept short (training loaders pad); empty documents
    emit nothing.

    Output: (doc_id, win_id, start_tok, n_tokens, window_text).
    """
    if window < 1 or stride < 1:
        raise ValueError(f"need window >= 1 and stride >= 1, "
                         f"got window={window} stride={stride}")
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(F.col(text_col)).alias("tk"))
    starts = F.sequence(F.lit(0), F.size("tk") - 1, F.lit(int(stride)))
    win = (toks.where(F.size("tk") > 0)
           .select("doc_id", "tk", F.posexplode(starts)
                   .alias("win_id", "start_tok")))
    piece = F.slice(F.col("tk"), F.col("start_tok") + 1,
                    F.lit(int(window)))
    return win.select(
        "doc_id", F.col("win_id").cast("bigint").alias("win_id"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("window_text"))


def textrank_terms(docs: DataFrame, iters: int = 2, k: int = 10,
                   text_col: str = "text") -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) at
    corpus level: PageRank over the token ADJACENCY graph — a term is
    important when important terms co-occur next to it, which raw
    frequency (tfidf) cannot see. Pure composition: the bigram edge
    relation feeds ``graph.pagerank_int`` unchanged (string node ids —
    the rank arithmetic never touches the id), proving the graph suite
    composes with the text suite.

    Edges are the symmetrized distinct adjacent-token pairs (the
    shingles zip_with shape, map-side); scores are integer-exact ppm
    (the pagerank_int contract), so the gate's oracle unrolls the same
    iterations. Output: the top-``k`` terms by (score desc, term asc).

    Output: (term, score_e6, rank).
    """
    from . import graph as _gr

    toks = F.transform(_tokens(F.col(text_col)), lambda t: t)
    tdf = docs.select(toks.alias("_t"))
    t = F.col("_t")
    m = F.greatest(F.size(t) - F.lit(1), F.lit(0))
    pairs = F.zip_with(F.slice(t, 1, m), F.slice(t, 2, m),
                       lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    adj = (tdf.select(F.explode(pairs).alias("p"))
           .select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
           .where(F.col("src") != F.col("dst")))
    und = adj.unionAll(adj.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst"))).distinct()
    nodes = und.select(F.col("src").alias("id")).distinct()
    scores = _gr.pagerank_int(nodes, und, iters=int(iters))
    w = Window.orderBy(F.col("score_e6").desc(), F.col("id"))
    return (scores.withColumn("rank", F.row_number().over(w)
                              .cast("bigint"))
            .where(F.col("rank") <= int(k))
            .select(F.col("id").alias("term"),
                    F.col("score_e6").cast("bigint").alias("score_e6"),
                    "rank"))


def heaps_law_fit(docs: DataFrame, bucket_docs: int = 50,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heaps'-law vocabulary-growth fit: V(T) ~ K * T^beta over the
    corpus in ingest order — the curve that says whether a crawl is
    still finding new language (beta near natural-text 0.4-0.6) or
    re-crawling templates (beta collapsing). Composition: the
    first-seen-token relation (the ``shingle_novelty`` idea at token
    granularity) bucketed by ingest position, cumulative sums over the
    BUCKET relation (n_docs/bucket_docs rows — never a global window
    over tokens), then ``stats.loglog_ols_fit`` on (tokens-so-far,
    vocab-so-far); beta = slope.

    Output (one row): the loglog fit (n_points, slope_milli,
    intercept_milli).
    """
    from .stats import loglog_ols_fit

    if bucket_docs < 1:
        raise ValueError(f"bucket_docs must be >= 1, got {bucket_docs}")
    toks = docs.select(F.col(id_col).alias("d"),
                       F.explode(_tokens(F.col(text_col))).alias("tok"))
    first = toks.groupBy("tok").agg(F.min("d").alias("fd"))
    b = F.expr(f"fd div {int(bucket_docs)}")
    new_per_bucket = (first.groupBy(b.alias("bk"))
                      .agg(F.count(F.lit(1)).cast("bigint").alias("nv")))
    tok_per_bucket = (toks.groupBy(F.expr(f"d div {int(bucket_docs)}")
                                   .alias("bk"))
                      .agg(F.count(F.lit(1)).cast("bigint").alias("nt")))
    wc = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, 0)
    curve = (tok_per_bucket.join(new_per_bucket, "bk", "left")
             .select("bk", "nt",
                     F.coalesce(F.col("nv"), F.lit(0)).alias("nv"))
             .withColumn("t_cum", F.sum("nt").over(wc))
             .withColumn("v_cum", F.sum("nv").over(wc)))
    return loglog_ols_fit(curve, x_col="t_cum", cnt_col="v_cum")
