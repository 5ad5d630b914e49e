"""T20 topic segmentation: from-scratch TextTiling over two-topic text."""

from __future__ import annotations

from crawl4ai_spark.operators.texttiling import (
    segment_keywords,
    texttile_segments,
    topic_segmentation_chunks,
)

TOPIC_A = ("spark cluster executor shuffle partition dataframe catalyst "
           "optimizer stage task broadcast join aggregate ") * 18
TOPIC_B = ("recipe butter flour sugar oven baking dough chocolate vanilla "
           "cookie pastry cream whisk ") * 18
TWO_TOPICS = TOPIC_A + " " + TOPIC_B


def test_two_topic_text_splits_at_the_seam():
    segs = texttile_segments(TWO_TOPICS, w=20, k=4)
    assert len(segs) >= 2
    # the topical vocabulary separates across the split
    assert "spark" in segs[0] and "spark" not in segs[-1]
    assert "butter" in segs[-1] and "butter" not in segs[0]
    # segmentation is a partition of the text
    assert "".join(segs) == TWO_TOPICS


def test_short_text_is_one_segment():
    assert texttile_segments("just a few words here") == ["just a few words here"]
    assert texttile_segments("") == []


def test_deterministic():
    assert texttile_segments(TWO_TOPICS) == texttile_segments(TWO_TOPICS)


def test_segment_keywords():
    kws = segment_keywords("spark spark spark shuffle shuffle the of and join", 2)
    assert kws == ["spark", "shuffle"]


def test_topic_chunks_surface():
    out = topic_segmentation_chunks(TWO_TOPICS, w=20, k=4)
    assert all(set(c) == {"segment", "keywords"} for c in out)
    assert any("spark" in c["keywords"] for c in out)
    assert any("butter" in c["keywords"] or "recipe" in c["keywords"] for c in out)


def test_paragraph_text_snaps_boundary_to_paragraph_break():
    a = ("spark cluster executor shuffle partition dataframe catalyst "
         "optimizer stage task broadcast join aggregate ") * 9
    b = ("recipe butter flour sugar oven baking dough chocolate vanilla "
         "cookie pastry cream whisk ") * 9
    text = a.strip() + "\n\n" + a.strip() + "\n\n" + b.strip() + "\n\n" + b.strip()
    segs = texttile_segments(text, w=20, k=4)
    assert len(segs) >= 2
    # every inner boundary falls on a paragraph break: each segment except
    # the last ends at a blank-line offset, so no segment starts or ends
    # mid-sentence
    for seg in segs[:-1]:
        assert seg.endswith("\n\n"), repr(seg[-30:])
    assert "".join(segs) == text
