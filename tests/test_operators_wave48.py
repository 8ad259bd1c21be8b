"""Round-5 wave 48: Heaps-law fit, Fisher scores, UUIDv3-format ids."""
import re
import uuid

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import similarity as sim
from plateau_gis_converter_spark.operators import text as tx
from plateau_gis_converter_spark.sources import layout as ly


# ---------------------------------------------------------------- heaps law

def test_heaps_beta_between_saturated_and_fresh(spark):
    # fresh corpus: every doc all-new tokens -> V = T -> slope 1000
    fresh = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"u{i}_{j}" for j in range(5)))
         for i in range(40)])
    r = tx.heaps_law_fit(fresh, bucket_docs=5).collect()[0]
    assert abs(r["slope_milli"] - 1000) <= 2
    # saturated corpus: same 5 tokens everywhere -> slope ~ 0
    flat = spark.createDataFrame(
        [Row(doc_id=i, text="a b c d e") for i in range(40)])
    r2 = tx.heaps_law_fit(flat, bucket_docs=5).collect()[0]
    assert r2["slope_milli"] <= 50


# ------------------------------------------------------------- fisher scores

def test_fisher_separable_dimension_scores_high(spark):
    # dim 0 separates classes cleanly; dim 1 is identical noise
    rows = []
    for i in range(40):
        y = i % 2
        jitter = 0.1 if i % 4 < 2 else -0.1
        rows.append(Row(vec_id=i, label=y,
                        embedding=[(1.0 if y else -1.0) + jitter,
                                   0.5 if i % 4 < 2 else -0.5]))
    out = {r["d"]: r for r in sim.fisher_scores(
        spark.createDataFrame(rows), dim=2).collect()}
    assert out[0]["score_milli"] > 100_000  # near-infinite separation
    assert out[1]["score_milli"] < 2_000
    assert out[0]["n0"] == out[0]["n1"] == 20


def test_fisher_zero_variance_null(spark):
    rows = [Row(vec_id=i, label=i % 2, embedding=[2.0]) for i in range(6)]
    r = sim.fisher_scores(spark.createDataFrame(rows), dim=1).collect()[0]
    assert r["score_milli"] is None


# ------------------------------------------------------------- stable uuids

def test_uuid3_format_and_determinism(spark):
    df = spark.createDataFrame([Row(name=f"n{i}") for i in range(50)])
    out = [r["uid"] for r in ly.uuid3_ids(df, "name").collect()]
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}"
        r"-[0-9a-f]{12}$")
    assert all(pat.match(u) for u in out)
    assert len(set(out)) == 50  # distinct names -> distinct ids
    again = [r["uid"] for r in ly.uuid3_ids(df, "name").collect()]
    assert sorted(out) == sorted(again)
    # every emitted id is a PARSEABLE RFC 4122 UUID with version 3
    for u in out[:5]:
        assert uuid.UUID(u).version == 3


def test_uuid3_matches_scalar_convention(spark):
    import hashlib
    df = spark.createDataFrame([Row(name="hello")])
    got = ly.uuid3_ids(df, "name", namespace="ns").collect()[0]["uid"]
    h = hashlib.md5(b"ns:hello").hexdigest()
    variant = "89ab89ab89ab89ab"[int(h[16], 16)]
    want = (f"{h[0:8]}-{h[8:12]}-3{h[13:16]}-{variant}{h[17:20]}"
            f"-{h[20:32]}")
    assert got == want
