"""Composed curation pipeline e2e (plans/curation_pipeline.py): dedup
keep-list → stratified sample → packing, lineage-checkpointed per stage,
output parity with the direct operator computations, and full resume (a
rerun with the same run_id commits zero new keys and recomputes no stage
output)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import packing as pk
from plateau_gis_converter_spark.operators import sampling as sp
from plateau_gis_converter_spark.plans import curation_pipeline as cp

SF_DIR = "/root/testdata/sf0.001"
RATES = {"en": 800_000, "de": 500_000, "fr": 250_000}


def _read_stage(out_root, stage):
    files = glob.glob(os.path.join(out_root, stage, "*.parquet"))
    assert files, f"no output for {stage}"
    import pandas as pd

    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)


def test_curation_pipeline_end_to_end_and_resume(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out_root = str(tmp_path / "cur")

    committed = cp.run_curation_pipeline(
        spark, docs, out_root, run_id="c1", rates_ppm=RATES, budget=64)
    assert committed["keep_list"] == cp.N_SHARDS
    assert committed["sampled"] == len(RATES)
    assert committed["packed"] > 0

    # stage-1 parity: every doc labeled, kept set matches the direct path
    keep = _read_stage(out_root, "keep_list")
    assert len(keep) == docs.count()
    pairs = dd.minhash_dedup_pairs(docs, threshold=0.5).select(
        "doc_a", "doc_b")
    direct_keep = dd.dedup_keep_list(
        docs, gr.connected_components(pairs)).toPandas()
    assert (set(keep[keep.kept]["doc_id"])
            == set(direct_keep[direct_keep.kept]["doc_id"]))

    # stage-2 parity: deterministic sample of the deduplicated corpus
    sampled = _read_stage(out_root, "sampled")
    kept_docs = docs.join(
        spark.createDataFrame(
            keep[keep.kept][["doc_id"]]), "doc_id")
    direct_sample = (sp.stratified_sample(
        kept_docs, RATES, stratum_col="lang", key_col="doc_id", salt="c1")
        .where(F.col("lang").isin(*RATES)).toPandas())
    assert set(sampled["doc_id"]) == set(direct_sample["doc_id"])
    assert set(sampled["lang"].unique()) == set(RATES)

    # stage-3 parity: packing is a pure function of the sampled corpus
    packed = _read_stage(out_root, "packed")
    assert len(packed) == len(sampled)
    direct_pack = pk.pack_concat_chunks(
        spark.read.parquet(os.path.join(out_root, "sampled")),
        budget=64).toPandas()
    a = packed.sort_values("doc_id")[
        ["doc_id", "n_tokens", "token_start", "chunk_start", "chunk_end"]]
    b = direct_pack.sort_values("doc_id")[
        ["doc_id", "n_tokens", "token_start", "chunk_start", "chunk_end"]]
    assert a.values.tolist() == b.values.tolist()
    # global prefix-scan invariant: offsets are contiguous over doc order
    srt = packed.sort_values("doc_id")
    assert srt["token_start"].iloc[0] == 0
    assert (srt["token_start"].values[1:]
            == (srt["token_start"] + srt["n_tokens"]).values[:-1]).all()

    # full resume: zero new keys, outputs untouched
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out_root, "*", "*.parquet"))}
    committed2 = cp.run_curation_pipeline(
        spark, docs, out_root, run_id="c1", rates_ppm=RATES, budget=64)
    assert committed2 == {"keep_list": 0, "sampled": 0, "packed": 0}
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t, f"{f} rewritten on resume"


def test_resume_skips_compute_with_empty_stratum(spark, tmp_path,
                                                 monkeypatch):
    """ADVICE r4: a stratum with zero rows ('xx' below) never commits a
    lineage key, so the old count-vs-total skip guard recomputed the
    whole minhash+CC stage on every resume. With stage-level completion
    markers the resumed run must not re-enter stage-1 compute AT ALL —
    proven by poisoning minhash_dedup_pairs after the first run."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out_root = str(tmp_path / "cur")
    rates = dict(RATES, xx=1_000_000)   # no 'xx' docs exist

    committed = cp.run_curation_pipeline(
        spark, docs, out_root, run_id="c1", rates_ppm=rates, budget=64)
    assert committed["sampled"] == len(RATES)   # 'xx' never commits

    def _poisoned(*a, **k):
        raise AssertionError("stage-1 compute re-entered on resume")

    monkeypatch.setattr(cp.dd, "minhash_dedup_pairs", _poisoned)
    monkeypatch.setattr(cp.sp, "stratified_sample", _poisoned)
    monkeypatch.setattr(cp.pk, "pack_concat_chunks", _poisoned)
    committed2 = cp.run_curation_pipeline(
        spark, docs, out_root, run_id="c1", rates_ppm=rates, budget=64)
    assert committed2 == {"keep_list": 0, "sampled": 0, "packed": 0}
