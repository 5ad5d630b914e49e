"""CSS selector engine + schema-driven structured extraction (T21)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.html.css_select import select, select_one
from crawl4ai_spark.html.parser import parse_html
from crawl4ai_spark.operators.extraction import (
    BUILTIN_PATTERNS,
    extract_schema,
    extract_structured,
    regex_extract_col,
)

HTML = """
<html><body>
<div id="main" class="content wide">
  <ul class="items">
    <li class="item"><a href="/a" title="A">Alpha</a><span class="price">$1.00</span></li>
    <li class="item featured"><a href="/b">Beta</a><span class="price">$2.50</span></li>
  </ul>
  <p>contact: x@y.example on 2024-03-05</p>
</div>
<div class="sidebar"><li class="item"><a href="/c">Gamma</a></li></div>
</body></html>
"""


def test_select_basics():
    root = parse_html(HTML)
    assert len(select(root, "li")) == 3
    assert len(select(root, "li.item")) == 3
    assert len(select(root, "li.featured")) == 1
    assert len(select(root, "#main li")) == 2
    assert len(select(root, "ul > li")) == 2
    assert len(select(root, "div.sidebar a, #main a")) == 3
    assert select_one(root, "li.featured a").attrs["href"] == "/b"
    assert len(select(root, "a[title]")) == 1
    assert len(select(root, 'a[href=/c]')) == 1


def test_select_document_order():
    root = parse_html(HTML)
    hrefs = [n.attrs["href"] for n in select(root, "a")]
    assert hrefs == ["/a", "/b", "/c"]


def test_extract_schema():
    recs = extract_schema(
        HTML,
        "ul.items li",
        [
            {"name": "name", "selector": "a", "type": "text"},
            {"name": "link", "selector": "a", "type": "attribute", "attribute": "href"},
            {"name": "price", "selector": ".price", "type": "regex", "pattern": r"\$([\d.]+)"},
        ],
    )
    assert recs == [
        {"name": "Alpha", "link": "/a", "price": "1.00"},
        {"name": "Beta", "link": "/b", "price": "2.50"},
    ]


def test_extract_schema_missing_field():
    recs = extract_schema(HTML, "div.sidebar li", [
        {"name": "price", "selector": ".price", "type": "text"},
        {"name": "name", "selector": "a", "type": "text"},
    ])
    assert recs == [{"name": "Gamma"}]  # missing selector → key omitted


def test_extract_structured_spark(spark):
    df = spark.createDataFrame([("u1", HTML)], "url string, html string")
    out = extract_structured(
        df, "ul.items li", [{"name": "name", "selector": "a", "type": "text"}]
    ).collect()[0]
    assert [dict(m) for m in out.extracted] == [{"name": "Alpha"}, {"name": "Beta"}]


def test_regex_builtin_patterns(spark):
    df = spark.createDataFrame(
        [("mail x@y.example visit https://a.example/p on 2024-03-05",)], "t string"
    )
    row = df.select(
        regex_extract_col(F.col("t"), "email").alias("e"),
        regex_extract_col(F.col("t"), "url").alias("u"),
        regex_extract_col(F.col("t"), "iso_date").alias("d"),
    ).collect()[0]
    assert row.e == ["x@y.example"]
    assert row.u == ["https://a.example/p"]
    assert row.d == ["2024-03-05"]
    assert set(BUILTIN_PATTERNS) >= {"email", "url", "phone_us", "iso_date"}


def test_xpath_engine_axes_and_predicates():
    from crawl4ai_spark.html.parser import parse_html
    from crawl4ai_spark.html.xpath_select import xpath_select

    root = parse_html(
        '<div id="a"><ul><li class="x">one</li><li>two</li></ul></div>'
        '<div id="b"><span><li>deep</li></span></div>'
    )
    assert [n.text() for n in xpath_select(root, "//li")] == ["one", "two", "deep"]
    assert [n.text() for n in xpath_select(root, "//div/ul/li")] == ["one", "two"]
    assert [n.text() for n in xpath_select(root, "//li[@class='x']")] == ["one"]
    assert [n.text() for n in xpath_select(root, "//li[1]")] == ["one", "deep"]
    assert [n.attrs["id"] for n in xpath_select(root, "//div[@id]")] == ["a", "b"]
    d = xpath_select(root, "//div[@id='b']")[0]
    assert [n.text() for n in xpath_select(d, ".//li")] == ["deep"]
    assert xpath_select(d, "./li") == []  # child axis: li is not a direct child


def test_nested_and_list_fields():
    from crawl4ai_spark.operators.extraction import extract_schema

    html = (
        '<article><h2>T1</h2><ul>'
        '<li><a href="/a">A</a></li><li><a href="/b">B</a></li></ul></article>'
    )
    out = extract_schema(
        html,
        "article",
        [
            {"name": "title", "selector": "h2", "type": "text", "transform": "lowercase"},
            {"name": "first", "type": "nested", "selector": "a",
             "fields": [{"name": "href", "type": "attribute", "attribute": "href"}]},
            {"name": "items", "type": "list", "selector": "li a",
             "fields": [{"name": "t", "type": "text"},
                        {"name": "href", "type": "attribute", "attribute": "href"}]},
            {"name": "missing", "selector": "h9", "type": "text", "default": "dflt"},
        ],
    )
    assert out == [
        {
            "title": "t1",
            "first": {"href": "/a"},
            "items": [{"t": "A", "href": "/a"}, {"t": "B", "href": "/b"}],
            "missing": "dflt",
        }
    ]


def test_xpath_schema_end_to_end():
    from crawl4ai_spark.operators.extraction import extract_schema

    html = '<body><div class="w"><p>hello</p><p>world</p></div></body>'
    out = extract_schema(
        html, "//div[@class='w']",
        [{"name": "p2", "selector": ".//p[2]", "type": "text"}],
        engine="xpath",
    )
    assert out == [{"p2": "world"}]


def test_select_quoted_attribute_values():
    """Spaces and commas inside quoted [attr=\"...\"] values must not split
    the selector into garbage tokens/branches."""
    from crawl4ai_spark.html.parser import parse_html
    from crawl4ai_spark.html.css_select import select

    root = parse_html(
        '<div title="a b"><span alt="x,y">1</span></div>'
        '<p title="a b">2</p><p title="ab">3</p>'
    )
    assert [n.text() for n in select(root, 'div[title="a b"]')] == ["1"]
    assert [n.text() for n in select(root, 'span[alt="x,y"]')] == ["1"]
    # commas OUTSIDE brackets still split branches
    assert [n.text() for n in select(root, 'p[title="a b"], p[title="ab"]')] == ["2", "3"]


def test_select_bracket_inside_quoted_value():
    """A '[' inside a quoted attribute value must not corrupt the bracket
    depth of the tokenizer/branch-splitter (it used to count raw chars, so
    [alt="a[b"] left the scanner thinking it was still inside brackets and
    mis-split everything after)."""
    from crawl4ai_spark.html.parser import parse_html
    from crawl4ai_spark.html.css_select import select

    root = parse_html(
        '<img alt="a[b"><p>after</p><div alt="a[b"><span>in</span></div>'
    )
    assert [n.tag for n in select(root, 'img[alt="a[b"]')] == ["img"]
    # the chars after the quoted '[' still tokenize: descendant combinator
    assert [n.text() for n in select(root, 'div[alt="a[b"] span')] == ["in"]
    # and branch-splitting after the quoted '[' still works
    assert [n.tag for n in select(root, 'img[alt="a[b"], p')] == ["img", "p"]
