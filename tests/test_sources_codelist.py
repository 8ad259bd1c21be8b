"""Codelist XML source (VERDICT r2 missing #4 / next #6) — parse PLATEAU
GML SimpleDictionary files into the codes dimension and run the resolve
join on it (xml.rs:1-160 semantics)."""
import pytest
from pyspark.sql import functions as F

from plateau_gis_converter_spark.sources import codelist_xml as cx

DICT_XML = """<?xml version="1.0" encoding="UTF-8"?>
<gml:Dictionary xmlns:gml="http://www.opengis.net/gml" gml:id="cl1">
  <gml:name>Building_usage</gml:name>
  <gml:dictionaryEntry>
    <gml:Definition gml:id="id1">
      <gml:description>business facility</gml:description>
      <gml:name>401</gml:name>
      <gml:unsupportedTag>401</gml:unsupportedTag>
    </gml:Definition>
  </gml:dictionaryEntry>
  <gml:dictionaryEntry>
    <gml:Definition gml:id="id2">
      <gml:name>402</gml:name>
      <gml:description>commercial facility</gml:description>
    </gml:Definition>
  </gml:dictionaryEntry>
  <gml:dictionaryEntry>
    <gml:Definition gml:id="id3">
      <gml:name>0403</gml:name>
      <gml:description>hotel</gml:description>
    </gml:Definition>
  </gml:dictionaryEntry>
</gml:Dictionary>
"""


def test_parse_dictionary_semantics():
    defs = cx.parse_dictionary(DICT_XML)
    assert defs == {"401": "business facility",
                    "402": "commercial facility",
                    "0403": "hotel"}  # leading zero preserved (code = TEXT)
    # root must be a GML Dictionary
    with pytest.raises(cx.CodelistParseError):
        cx.parse_dictionary(
            '<gml:Other xmlns:gml="http://www.opengis.net/gml"/>')
    # a Definition missing name or description is a schema violation
    broken = DICT_XML.replace("<gml:name>401</gml:name>", "")
    with pytest.raises(cx.CodelistParseError):
        cx.parse_dictionary(broken)
    # empty text counts as missing (expect_text rejects empty strings)
    empty = DICT_XML.replace("business facility", "")
    with pytest.raises(cx.CodelistParseError):
        cx.parse_dictionary(empty)
    # wrong-namespace Dictionary rejected
    with pytest.raises(cx.CodelistParseError):
        cx.parse_dictionary('<Dictionary xmlns="urn:x"/>')


def test_load_codelists_and_resolve(spark, tmp_path):
    """Build the dimension from XML files via the binaryFile source, then
    resolve codes with the same broadcast-join mechanics as the
    codelist_resolve gate query."""
    (tmp_path / "Building_usage.xml").write_text(DICT_XML, encoding="utf-8")
    other = DICT_XML.replace("401", "A1").replace("402", "A2") \
                    .replace("0403", "A3").replace("Building_usage", "Roof")
    (tmp_path / "Roof_type.xml").write_text(other, encoding="utf-8")
    (tmp_path / "notes.txt").write_text("ignored", encoding="utf-8")

    dim = cx.load_codelists(spark, str(tmp_path))
    rows = dim.collect()
    assert len(rows) == 6
    assert {r["codelist"] for r in rows} == {"Building_usage", "Roof_type"}
    got = {(r["codelist"], r["code"]): r["value"] for r in rows}
    assert got[("Building_usage", "401")] == "business facility"
    assert got[("Roof_type", "A3")] == "hotel"

    # resolve join: feature codes -> values through the broadcast dimension
    feats = spark.createDataFrame(
        [("b1", "Building_usage", "401"), ("b2", "Building_usage", "0403"),
         ("b3", "Building_usage", "999")],  # unknown code -> null value
        ["feature_id", "codelist", "usage_code"])
    resolved = (feats.join(
        F.broadcast(dim),
        (feats.codelist == dim.codelist) & (feats.usage_code == dim.code),
        "left").select("feature_id", "usage_code", "value"))
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    out = {r["feature_id"]: r["value"] for r in resolved.collect()}
    assert out == {"b1": "business facility", "b2": "hotel", "b3": None}
