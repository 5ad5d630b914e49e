"""Schema-driven structured extraction (SURVEY.md §2.3 T21/T22).

Behavioral spec: /root/reference/crawl4ai/extraction_strategy.py —
JsonCssExtractionStrategy :804-1196 (baseSelector selects repeated
elements; each field is {name, selector, type ∈ text|attribute|html|regex,
attribute?, pattern?}) and RegexExtractionStrategy :1706-1975 (named
built-in patterns).

Spark mapping: one Arrow pandas UDF per schema emitting
``array<map<string,string>>`` (one map per matched base element) —
schema-agnostic output type so arbitrary user schemas need no DDL. Regex
extraction stays fully Catalyst-side (``regexp_extract_all``); the named
pattern registry below mirrors the reference's builtins.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.html.css_select import select, select_one
from crawl4ai_spark.html.parser import parse_html

# Named regex patterns (subset mirroring the reference's builtin catalog,
# extraction_strategy.py:1725-1760; re-derived from public pattern idioms).
BUILTIN_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s\"'<>]+",
    "phone_us": r"\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}",
    "iso_date": r"\d{4}-\d{2}-\d{2}",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "currency": r"[$€£]\s?\d+(?:[.,]\d{2})?",
}


def extract_field(element, field: dict) -> str | None:
    """One field from one base element (reference :1008-1080 semantics)."""
    sel = field.get("selector")
    target = select_one(element, sel) if sel else element
    if target is None:
        return None
    kind = field.get("type", "text")
    if kind == "text":
        return target.text()
    if kind == "attribute":
        return target.attrs.get(field["attribute"])
    if kind == "html":
        return target.serialize()
    if kind == "regex":
        m = re.search(field["pattern"], target.text())
        if not m:
            return None
        return m.group(1) if m.groups() else m.group(0)
    raise ValueError(f"unknown field type: {kind}")


def extract_schema(html: str, base_selector: str, fields: list[dict]) -> list[dict]:
    """Pure function: html → list of {field_name: value} per base element."""
    root = parse_html(html or "")
    out = []
    for el in select(root, base_selector):
        rec: dict[str, str] = {}
        for f in fields:
            v = extract_field(el, f)
            if v is not None:
                rec[f["name"]] = v
        out.append(rec)
    return out


def css_extraction_udf(base_selector: str, fields: list[dict]):
    """Build the Arrow pandas UDF for one extraction schema."""

    @F.pandas_udf(T.ArrayType(T.MapType(T.StringType(), T.StringType())))
    def _extract(html: pd.Series, _url: pd.Series) -> pd.Series:
        rows = []
        for h in html:
            if h is None:
                rows.append([])
                continue
            if isinstance(h, (bytes, bytearray)):
                h = bytes(h).decode("utf-8", errors="replace")
            rows.append(extract_schema(h, base_selector, fields))
        return pd.Series(rows, dtype="object")

    return _extract


def extract_structured(
    df: DataFrame,
    base_selector: str,
    fields: list[dict],
    html_col: str = "html",
    url_col: str = "url",
    out_col: str = "extracted",
) -> DataFrame:
    """df + ``out_col: array<map<string,string>>`` column of extractions."""
    udf = css_extraction_udf(base_selector, fields)
    return df.withColumn(out_col, udf(F.col(html_col), F.col(url_col)))


def regex_extract_col(text: Column, pattern_name: str) -> Column:
    """All matches of a named builtin pattern — pure Catalyst (T22)."""
    return F.regexp_extract_all(text, F.lit(BUILTIN_PATTERNS[pattern_name]), F.lit(0))
