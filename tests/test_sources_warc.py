"""Unit tests for sources/warc.py: record framing round-trips, adversarial
payloads (CRLF-CRLF / 'WARC/1.0' inside the text, empty and unicode
payloads), in-file ordering, and fail-fast on corrupt framing."""
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.sources import warc as wc


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


ADVERSARIAL = [
    "plain text",
    "",                                      # empty payload
    "has\r\n\r\ndouble CRLF inside",         # delimiter bytes in payload
    "embedded WARC/1.0\r\nWARC-Type: fake",  # record-start bytes in payload
    "unicode 東京 ünïcødé 🗼",                # multi-byte utf-8
    "trailing newlines\r\n\r\n\r\n",
]


def test_round_trip_adversarial_payloads(spark):
    docs = _docs(spark, ADVERSARIAL)
    parsed = wc.parse_warc_records(wc.synth_warc_files(docs, 3)).collect()
    assert len(parsed) == len(ADVERSARIAL)
    by_url = {r["url"]: r for r in parsed}
    for i, t in enumerate(ADVERSARIAL):
        r = by_url[f"https://example.org/doc/{i}"]
        raw = t.encode("utf-8")
        assert bytes(r["payload"]) == raw, i
        assert r["content_length"] == len(raw)
        assert r["ts_us"] == wc.BASE_US + i * 1_000_000
        assert r["warc_type"] == "response"
        assert r["file_id"] == i // 3


def test_records_concatenated_in_doc_order(spark):
    docs = _docs(spark, [f"text {i}" for i in range(10)])
    blob = bytes(wc.synth_warc_files(docs, 10).collect()[0]["blob"])
    offs = [blob.index(f"doc/{i}\r\n".encode()) for i in range(10)]
    assert offs == sorted(offs)


def test_parse_is_content_length_driven_not_split(spark):
    """A payload that is ITSELF a full valid WARC record must come back
    as payload bytes, not be parsed as a second record."""
    inner = (b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    docs = _docs(spark, [inner.decode("utf-8")])
    parsed = wc.parse_warc_records(wc.synth_warc_files(docs, 1)).collect()
    assert len(parsed) == 1
    assert bytes(parsed[0]["payload"]) == inner


def test_md5_matches_hashlib(spark):
    docs = _docs(spark, ADVERSARIAL)
    parsed = wc.parse_warc_records(wc.synth_warc_files(docs, 100))
    rows = parsed.select("url", F.md5("payload").alias("h")).collect()
    exp = {f"https://example.org/doc/{i}":
           hashlib.md5(t.encode("utf-8")).hexdigest()
           for i, t in enumerate(ADVERSARIAL)}
    assert {r["url"]: r["h"] for r in rows} == exp
    assert wc.payload_md5_hex(b"abc") == hashlib.md5(b"abc").hexdigest()


def test_corrupt_framing_raises(spark):
    bad = spark.createDataFrame(
        [Row(file_id=0, blob=b"NOT-A-WARC\r\n\r\n")])
    with pytest.raises(Exception, match="bad record start"):
        wc.parse_warc_records(bad).collect()


def test_truncated_payload_raises(spark):
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
           b"Content-Length: 100\r\n\r\nshort")
    bad = spark.createDataFrame([Row(file_id=0, blob=rec)])
    with pytest.raises(Exception, match="truncated"):
        wc.parse_warc_records(bad).collect()
