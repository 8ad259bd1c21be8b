"""WARC (Web ARChive, ISO 28500) record plumbing for the Common-Crawl-style
ingestion path: the raw crawl arrives as concatenated WARC records inside
large archive files; the engine needs to split those binary blobs into
(url, warc_date, payload) rows before any of the text/dedup/geo operators
can run.

Two halves, built to round-trip:

* ``synth_warc_files`` — deterministic WARC/1.0 response records derived
  entirely JVM-side from the documents table (format_string + encode +
  binary concat; zero Python), concatenated into per-file blobs with a
  sorted binary fold. This is the test/bench stand-in for real crawl
  archives (no external data in this sandbox) AND the write path a crawler
  sink would use.
* ``parse_warc_records`` — the real ingestion parser: an Arrow-batched
  ``mapInPandas`` that walks each blob by Content-Length (never by naive
  delimiter split, so payloads containing CRLF-CRLF or even "WARC/1.0"
  parse correctly), yielding one row per record. Python is unavoidable
  here (binary record framing is not expressible in Catalyst) and
  acceptable: parsing is a one-pass map over the raw bytes — the same
  stage any engine spends on archive decode — and stays Arrow-batched.

Scale: one blob row = one archive member (Common Crawl WARCs are ~1 GB);
``parse_warc_records`` is map-only, so ingest parallelism = number of
archive files and there is no shuffle until the first downstream groupBy.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# epoch micros of 2020-01-01T00:00:00Z, the synthetic crawl-start instant
BASE_US = 1_577_836_800_000_000

_HDR_FMT = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Record-ID: <urn:doc:%d>\r\n"
    "WARC-Target-URI: https://example.org/doc/%d\r\n"
    "WARC-Date: %s\r\n"
    "Content-Type: text/plain\r\n"
    "Content-Length: %d\r\n"
    "\r\n")


def synth_warc_records(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, rec: binary) — one WARC/1.0 response record per document,
    WARC-Date = BASE + doc_id seconds, payload = utf-8 text."""
    payload = F.encode(F.col(text_col), "UTF-8")
    date_s = F.date_format(
        F.timestamp_micros(F.lit(BASE_US) + F.col("doc_id") * F.lit(1_000_000)),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    header = F.format_string(_HDR_FMT, F.col("doc_id"), F.col("doc_id"),
                             date_s, F.octet_length(payload))
    rec = F.concat(F.encode(header, "UTF-8"), payload,
                   F.encode(F.lit("\r\n\r\n"), "UTF-8"))
    return docs.select("doc_id", rec.alias("rec"))


def synth_warc_files(docs: DataFrame, docs_per_file: int = 100,
                     text_col: str = "text") -> DataFrame:
    """(file_id, blob: binary) — records concatenated in doc_id order per
    file (file_id = doc_id // docs_per_file), via a sorted binary fold."""
    recs = synth_warc_records(docs, text_col).withColumn(
        "file_id", (F.col("doc_id") / F.lit(int(docs_per_file)))
        .cast("bigint"))
    blob = F.aggregate(
        F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
        F.lit(b""), lambda acc, x: F.concat(acc, x["rec"]))
    return recs.groupBy("file_id").agg(blob.alias("blob"))


_PARSED_SCHEMA = ("file_id bigint, url string, warc_type string, "
                  "ts_us bigint, content_length bigint, payload binary")


def parse_warc_records(files: DataFrame, blob_col: str = "blob",
                       file_col: str = "file_id") -> DataFrame:
    """Split (file_id, blob) into one row per WARC record.

    Framing: each record is headers (CRLF lines, terminated by an empty
    line) + exactly Content-Length payload bytes + CRLF CRLF. The walk is
    Content-Length-driven — payload bytes are never scanned for
    delimiters. Malformed framing raises (fail-fast beats silently
    resynchronizing mid-archive).
    """

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for fid, blob in zip(pdf[file_col], pdf[blob_col]):
                b = bytes(blob)
                i = 0
                while i < len(b):
                    if not b.startswith(b"WARC/", i):
                        raise ValueError(
                            f"file {fid}: bad record start at offset {i}")
                    hdr_end = b.index(b"\r\n\r\n", i)
                    headers: dict[str, str] = {}
                    for line in b[i:hdr_end].decode("utf-8").split("\r\n")[1:]:
                        k, _, v = line.partition(":")
                        headers[k.strip().lower()] = v.strip()
                    clen = int(headers["content-length"])
                    payload = b[hdr_end + 4:hdr_end + 4 + clen]
                    if len(payload) != clen:
                        raise ValueError(
                            f"file {fid}: truncated payload at offset {i}")
                    ts = dt.datetime.strptime(
                        headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
                    ).replace(tzinfo=dt.timezone.utc)
                    out.append((fid, headers.get("warc-target-uri", ""),
                                headers.get("warc-type", ""),
                                int(ts.timestamp() * 1_000_000), clen,
                                payload))
                    i = hdr_end + 4 + clen + 4
            yield pd.DataFrame(
                out, columns=["file_id", "url", "warc_type", "ts_us",
                              "content_length", "payload"])

    return files.mapInPandas(_parse, schema=_PARSED_SCHEMA)


def payload_md5_hex(payload: bytes) -> str:
    """Driver/test helper mirroring F.md5 over the payload bytes."""
    return hashlib.md5(payload).hexdigest()
