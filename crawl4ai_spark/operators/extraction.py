"""Schema-driven structured extraction (SURVEY.md §2.3 T21/T22).

Behavioral spec: /root/reference/crawl4ai/extraction_strategy.py —
JsonElementExtractionStrategy :804-1196 (baseSelector selects repeated
elements; each field is {name, selector, type ∈ text|attribute|html|regex|
nested|list|nested_list, attribute?, pattern?, fields?, default?,
transform?}), the CSS engine :900-1050, the XPath engine :1612-1705, and
RegexExtractionStrategy :1706-1975 (named built-in patterns).

Spark mapping: one Arrow pandas UDF per schema emitting
``array<map<string,string>>`` (one map per matched base element) —
schema-agnostic output type so arbitrary user schemas need no DDL. Values
of nested/list fields are JSON-encoded in the map (deterministic field
order = schema order). Regex extraction stays fully Catalyst-side
(``regexp_extract_all``); the named pattern registry below mirrors the
reference's builtins.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.html.css_select import select
from crawl4ai_spark.html.parser import parse_html
from crawl4ai_spark.html.xpath_select import xpath_select

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


_ENGINES = {"css": select, "xpath": xpath_select}

_TRANSFORMS = {
    "lowercase": str.lower,
    "uppercase": str.upper,
    "strip": str.strip,
}


def _select_all(element, selector: str, engine: str):
    return _ENGINES[engine](element, selector)


def extract_field(element, field: dict, engine: str = "css"):
    """One field from one base element (reference :953-1009 semantics) —
    including nested / list / nested_list recursion and default values."""
    kind = field.get("type", "text")
    try:
        if kind == "nested":
            found = _select_all(element, field["selector"], engine)
            return (
                extract_item(found[0], field["fields"], engine) if found else {}
            )
        if kind in ("list", "nested_list"):
            found = _select_all(element, field["selector"], engine)
            return [extract_item(el, field["fields"], engine) for el in found]

        sel = field.get("selector")
        if sel:
            found = _select_all(element, sel, engine)
            if not found:
                return field.get("default")
            target = found[0]
        else:
            target = element
        value = None
        if kind == "text":
            value = target.text()
        elif kind == "attribute":
            value = target.attrs.get(field["attribute"])
        elif kind == "html":
            value = target.serialize()
        elif kind == "regex":
            m = re.search(field["pattern"], target.text())
            value = (m.group(1) if m.groups() else m.group(0)) if m else None
        else:
            raise ValueError(f"unknown field type: {kind}")
        if value is not None and "transform" in field:
            value = _TRANSFORMS[field["transform"]](value)
        return value if value is not None else field.get("default")
    except (KeyError, ValueError):
        raise
    except Exception:
        return field.get("default")


def extract_item(element, fields: list[dict], engine: str = "css") -> dict:
    rec: dict = {}
    for f in fields:
        v = extract_field(element, f, engine)
        if v is not None:
            rec[f["name"]] = v
    return rec


def extract_schema(
    html: str, base_selector: str, fields: list[dict], engine: str = "css"
) -> list[dict]:
    """Pure function: html → list of {field_name: value} per base element."""
    root = parse_html(html or "")
    return [
        extract_item(el, fields, engine)
        for el in _select_all(root, base_selector, engine)
    ]


def _jsonify(rec: dict) -> dict[str, str]:
    """Map-typed UDF output: non-string (nested/list) values JSON-encoded
    with schema-order keys — deterministic for the value-hash oracle."""
    return {
        k: v if isinstance(v, str) else json.dumps(v, ensure_ascii=False)
        for k, v in rec.items()
    }


def schema_extraction_udf(base_selector: str, fields: list[dict], engine: str = "css"):
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
            rows.append(
                [_jsonify(r) for r in extract_schema(h, base_selector, fields, engine)]
            )
        return pd.Series(rows, dtype="object")

    return _extract


def css_extraction_udf(base_selector: str, fields: list[dict]):
    return schema_extraction_udf(base_selector, fields, "css")


def extract_structured(
    df: DataFrame,
    base_selector: str,
    fields: list[dict],
    html_col: str = "html",
    url_col: str = "url",
    out_col: str = "extracted",
    engine: str = "css",
) -> DataFrame:
    """df + ``out_col: array<map<string,string>>`` column of extractions.
    ``engine`` ∈ {'css', 'xpath'} picks the selector language (reference
    JsonCss vs JsonXPath strategies)."""
    udf = schema_extraction_udf(base_selector, fields, engine)
    return df.withColumn(out_col, udf(F.col(html_col), F.col(url_col)))


def regex_extract_col(text: Column, pattern_name: str) -> Column:
    """All matches of a named builtin pattern — pure Catalyst (T22)."""
    return F.regexp_extract_all(text, F.lit(BUILTIN_PATTERNS[pattern_name]), F.lit(0))
