"""CCNet-style per-host boilerplate paragraph removal."""
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import boilerplate as bp


def test_strip_semantics(spark):
    """Host h: 'NAV' in 3/3 docs (strip), 'mid' in 2/3 (strip at 50%),
    'rare' in 1/3 (keep), bodies unique (keep). Host g has 1 doc: its
    single-doc paragraphs never reach min_df=2. Order preserved;
    all-boilerplate doc stays with empty clean_text."""
    docs = spark.createDataFrame(
        [(1, "h", "NAV\nbody one\nmid"),
         (2, "h", "NAV\nmid\nbody two"),
         (3, "h", "NAV\nrare\nbody three"),
         (4, "h", "NAV\nmid"),          # everything boilerplate
         (5, "g", "NAV\nsolo body")],   # 1-doc host: df=1 < min_df
        ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in
           bp.host_boilerplate_strip(docs, ratio_ppm=500_000, min_df=2)
           .collect()}
    assert out[1]["clean_text"] == "body one"
    assert out[2]["clean_text"] == "body two"
    assert out[3]["clean_text"] == "rare\nbody three"   # order kept
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0
    assert out[4]["n_removed"] == 2
    assert out[5]["clean_text"] == "NAV\nsolo body"     # min_df guard
    assert out[1]["n_kept"] == 1 and out[1]["n_removed"] == 2


def test_normalized_matching_and_intra_doc_repeat(spark):
    """Paragraphs match after lower+trim normalization; a paragraph
    repeated INSIDE one doc counts once toward df (countDistinct)."""
    docs = spark.createDataFrame(
        [(1, "h", "  Footer  \nx\nfooter\nx"),  # footer df=1 via doc 1
         (2, "h", "FOOTER\ny")],                 # ... and doc 2 -> df=2
        ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in
           bp.host_boilerplate_strip(docs, ratio_ppm=500_000, min_df=2)
           .collect()}
    # both footer variants strip from doc 1; the duplicate 'x' within
    # doc 1 has df=1 (one doc) so it survives, twice, in order
    assert out[1]["clean_text"] == "x\nx"
    assert out[2]["clean_text"] == "y"


def test_no_python_stage(spark):
    docs = spark.createDataFrame([(1, "h", "a\nb")],
                                 ["doc_id", "source", "text"])
    plan = (bp.host_boilerplate_strip(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
