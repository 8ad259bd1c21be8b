"""Trimmed public-suffix snapshot for registered-domain extraction.

The Public Suffix List (publicsuffix.org, Mozilla, MIT-licensed public
data) is the standard answer to "which part of a host is the registrable
domain". A last-two-labels heuristic collapses every ``.co.jp`` /
``.co.uk`` host into one "domain" (``co.jp``), which breaks per-domain
caps and domain-level spam filters for exactly the corpora this engine
targets.

This module bundles a TRIMMED snapshot: the ICANN-section two-label
suffixes for the ccTLDs that dominate web crawls. The full list has
~9500 rules (incl. 3+-label and wildcard rules like ``*.ck``); the trim
keeps the suffix-matching semantics and the fallback identical, so
swapping in the complete list is a data refresh, not a code change. Two
deployment shapes:

* ``plateau_gis_converter_spark.operators.urls.registered_domain`` —
  the snapshot compiled into a Catalyst ``IN`` set (InSet: JVM-side hash
  probe, zero shuffle, zero Python), the right shape for a frozen
  bundled list.
* ``registered_domain_join`` below — broadcast-join against a
  runtime-supplied suffix table (e.g. the full PSL loaded from parquet),
  the right shape when the list must be updatable without a code deploy.

Both produce identical results on the snapshot. Reference parity: the
reference engine has no URL layer; this is engine-addition surface
(SURVEY.md §2 training-data pipeline block), VERDICT r3 next-round #2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ICANN-section two-label public suffixes, trimmed to high-crawl-volume
# ccTLDs (snapshot of publicsuffix.org; public data).
MULTIPART_SUFFIXES: tuple[str, ...] = (
    # .jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # .uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "sch.uk",
    # .au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # .nz
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # .br
    "art.br", "com.br", "edu.br", "eng.br", "gov.br", "ind.br",
    "inf.br", "mil.br", "net.br", "org.br", "rec.br", "srv.br", "tur.br",
    # .kr
    "ac.kr", "co.kr", "go.kr", "hs.kr", "mil.kr", "ms.kr", "ne.kr",
    "or.kr", "pe.kr", "re.kr", "sc.kr",
    # .cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # .tw
    "club.tw", "com.tw", "edu.tw", "game.tw", "gov.tw", "idv.tw",
    "mil.tw", "net.tw", "org.tw",
    # .in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # .za
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "org.za", "school.za", "web.za",
    # .mx / .ar
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar",
    # .sg / .hk / .my / .id / .th / .vn / .ph
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.my", "edu.my", "gov.my", "mil.my", "net.my", "org.my",
    "ac.id", "co.id", "go.id", "mil.id", "net.id", "or.id", "sch.id",
    "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.vn", "com.vn", "edu.vn", "gov.vn", "int.vn", "net.vn", "org.vn",
    "com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "org.ph",
    # .tr / .il / .ua / .pl
    "av.tr", "bel.tr", "biz.tr", "com.tr", "edu.tr", "gen.tr", "gov.tr",
    "k12.tr", "mil.tr", "net.tr", "org.tr", "pol.tr", "web.tr",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl",
    # .eg / .sa / .pk / .ke / .ng
    "com.eg", "edu.eg", "gov.eg", "mil.eg", "net.eg", "org.eg", "sci.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "sch.sa",
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    "ac.ke", "co.ke", "go.ke", "ne.ke", "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "net.ng", "org.ng", "sch.ng",
    # Latin America (com./edu./gov./net./org. families, trimmed)
    "com.pe", "edu.pe", "gob.pe", "net.pe", "org.pe",
    "com.co", "edu.co", "gov.co", "net.co", "org.co",
    "com.ve", "edu.ve", "gob.ve", "net.ve", "org.ve",
    "com.ec", "edu.ec", "gob.ec", "net.ec", "org.ec",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "org.uy",
)

# PRIVATE-section staples (site-per-subdomain hosting). Off by default:
# crawl-time per-domain caps usually want the ICANN view; content dedup
# per "site" wants these on.
PRIVATE_SUFFIXES: tuple[str, ...] = (
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "web.app", "pages.dev",
)


def suffixes(include_private: bool = False) -> tuple[str, ...]:
    return (MULTIPART_SUFFIXES + PRIVATE_SUFFIXES if include_private
            else MULTIPART_SUFFIXES)


def psl_df(spark, include_private: bool = False) -> DataFrame:
    """The snapshot as a one-column DataFrame ``(suffix)`` — the shape a
    runtime-supplied full PSL would arrive in."""
    return spark.createDataFrame(
        [(s,) for s in suffixes(include_private)], "suffix: string")


def _last_labels(host: Column, n: int) -> Column:
    """Last ``n`` dot-labels of host ('' if host has fewer than n)."""
    pat = r"([^.]+" + r"\.[^.]+" * (n - 1) + r")$"
    return F.regexp_extract(host, pat, 1)


def registered_domain_join(df: DataFrame, psl: DataFrame,
                           host_col: str = "host",
                           out_col: str = "domain") -> DataFrame:
    """Broadcast-join registered-domain extraction for a runtime-supplied
    suffix table ``psl(suffix)`` (two-label rules — the trim's scope; a
    full-PSL variant joins once per rule length, still all-broadcast).

    Scale: the PSL is ~9500 rows — a textbook broadcast dimension. The
    page side never shuffles; plan is one BroadcastHashJoin (left) plus
    map-side expressions.
    """
    host = F.col(host_col)
    joined = df.join(
        F.broadcast(psl.select(F.col("suffix").alias("__psl_suffix"))),
        _last_labels(host, 2) == F.col("__psl_suffix"), "left")
    three = _last_labels(host, 3)
    two = _last_labels(host, 2)
    dom = (F.when(F.col("__psl_suffix").isNotNull() & (three != ""), three)
           .when(two != "", two)
           .otherwise(host))
    return joined.withColumn(out_col, dom).drop("__psl_suffix")
