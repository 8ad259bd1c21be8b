"""PLATEAU codelist XML source (S2 input side).

Parses GML SimpleDictionary codelist files into the codes dimension that
``codelist_resolve`` (J2) broadcast-joins against. Semantics mirror the
reference parser (nusamai-plateau/src/codelist/xml.rs:1-160):

* the root element must be a GML 3.1 ``<Dictionary>``;
* each ``<dictionaryEntry>/<Definition>`` contributes one (code, value)
  pair: ``<gml:name>`` is the code, ``<gml:description>`` the value;
* both are required and must be non-empty text — otherwise the file is
  rejected (the reference raises ParseError::SchemaViolation);
* unknown child elements inside a Definition are ignored;
* later duplicates of a code overwrite earlier ones (HashMap::insert).

The file SET is small (hundreds of files, KBs each — it is the broadcast
dimension), so two loaders are offered: ``load_codelists`` parses a
directory distributed via Spark's binaryFile source (one task per file
group), and ``parse_dictionary`` is the pure kernel for driver-side or
test use.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# GML 3.1 namespace, same constant the reference resolves against
# (nusamai-citygml namespace::GML31_NS)
GML31_NS = "http://www.opengis.net/gml"


class CodelistParseError(ValueError):
    """Schema violation in a codelist file (xml.rs ParseError semantics)."""


def _local(tag: str) -> tuple[str, str]:
    """Split '{ns}local' -> (ns, local)."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns, local
    return "", tag


def parse_dictionary(content: bytes | str) -> dict[str, str]:
    """One codelist XML -> {code: value} (xml.rs parse_dictionary)."""
    root = ET.fromstring(content)
    ns, local = _local(root.tag)
    if not (ns == GML31_NS and local == "Dictionary"):
        raise CodelistParseError(
            f"<Dictionary> is expected, but found {local}")
    definitions: dict[str, str] = {}
    for entry in root:
        ens, elocal = _local(entry.tag)
        if not (ens == GML31_NS and elocal == "dictionaryEntry"):
            continue
        for defn in entry:
            dns, dlocal = _local(defn.tag)
            if not (dns == GML31_NS and dlocal == "Definition"):
                continue
            code = value = None
            for child in defn:
                cns, clocal = _local(child.tag)
                if cns != GML31_NS:
                    continue
                if clocal == "name":
                    code = (child.text or "").strip()
                elif clocal == "description":
                    value = (child.text or "").strip()
            if not code or not value:
                raise CodelistParseError(
                    "Both <name> and <description> are required in a "
                    "code definition.")
            definitions[code] = value
    return definitions


CODELIST_SCHEMA = T.StructType([
    T.StructField("codelist", T.StringType()),
    T.StructField("code", T.StringType()),
    T.StructField("value", T.StringType()),
])


def load_codelists(spark: SparkSession, path: str) -> DataFrame:
    """Directory of codelist .xml files -> (codelist, code, value) rows.

    Reads via the binaryFile source and parses inside mapInPandas — each
    file parses exactly once on an executor; the result is the (small)
    codes dimension to F.broadcast() into resolve joins. The codelist key
    is the file's basename without extension, which is how PLATEAU data
    references dictionaries from codeSpace attributes."""
    import os

    import pandas as pd

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.xml").load(path)
             .select("path", "content"))

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                name = os.path.splitext(os.path.basename(rec.path))[0]
                for code, value in sorted(
                        parse_dictionary(bytes(rec.content)).items()):
                    rows.append({"codelist": name, "code": code,
                                 "value": value})
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(run, schema=CODELIST_SCHEMA)
