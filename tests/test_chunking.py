"""Chunker semantics vs a direct restatement of the reference algorithms
(chunking_strategy.py:180-257), including the misaligned-tail and
stop-at-end cases the windowed expressions must reproduce exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.chunking import (
    fixed_window_chunks_col,
    overlapping_window_chunks_col,
    sliding_window_chunks_col,
)


def _ref_fixed(text: str, size: int) -> list[str]:
    words = text.split()
    return [" ".join(words[i : i + size]) for i in range(0, len(words), size)]


def _ref_sliding(text: str, window: int, step: int) -> list[str]:
    words = text.split()
    if len(words) <= window:
        return [text]
    chunks = []
    i = 0
    for i in range(0, len(words) - window + 1, step):
        chunks.append(" ".join(words[i : i + window]))
    if i + window < len(words):
        chunks.append(" ".join(words[-window:]))
    return chunks


def _ref_overlapping(text: str, window: int, overlap: int) -> list[str]:
    words = text.split()
    if len(words) <= window:
        return [text]
    chunks, start = [], 0
    while start < len(words):
        end = start + window
        chunks.append(" ".join(words[start:end]))
        if end >= len(words):
            break
        start = end - overlap
    return chunks


def _texts() -> list[str]:
    return [
        "",
        "one",
        " ".join(f"w{i}" for i in range(5)),
        " ".join(f"w{i}" for i in range(30)),   # == overlap window
        " ".join(f"w{i}" for i in range(45)),   # ADVICE case: 2 chunks, not 3
        " ".join(f"w{i}" for i in range(50)),
        " ".join(f"w{i}" for i in range(51)),
        " ".join(f"w{i}" for i in range(75)),   # sliding: aligned, no tail
        " ".join(f"w{i}" for i in range(80)),   # sliding: misaligned tail
        " ".join(f"w{i}" for i in range(130)),
        "  padded   text  with   runs  ",
    ]


def test_chunkers_match_reference_semantics(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_texts())], "i long, text string")
    out = df.select(
        "i", "text",
        fixed_window_chunks_col("text", 50).alias("fixed"),
        sliding_window_chunks_col("text", 50, 25).alias("sliding"),
        overlapping_window_chunks_col("text", 30, 10).alias("overlap"),
    ).orderBy("i").collect()
    for row in out:
        assert list(row.fixed) == _ref_fixed(row.text, 50), f"fixed @ {row.i}"
        assert list(row.sliding) == _ref_sliding(row.text, 50, 25), f"sliding @ {row.i}"
        assert list(row.overlap) == _ref_overlapping(row.text, 30, 10), f"overlap @ {row.i}"


def test_overlapping_advice_case(spark):
    """45 words, window 30, overlap 10 → reference yields exactly 2 chunks
    (the old expression emitted a third tail fragment)."""
    text = " ".join(f"w{i}" for i in range(45))
    row = spark.range(1).select(
        overlapping_window_chunks_col(F.lit(text), 30, 10).alias("c")
    ).first()
    assert len(row.c) == 2
    assert row.c[0] == " ".join(f"w{i}" for i in range(30))
    assert row.c[1] == " ".join(f"w{i}" for i in range(20, 45))

def test_punkt_sentence_chunks_reference_behavior(spark):
    """Punkt-style splitter vs transcribed nltk sent_tokenize behavior on
    whitespace-normalized text (the nltk doc example plus the abbreviation
    / initial / decimal / quote cases punkt is known for; reference
    NlpSentenceChunking returns list(set(...)) — determinized here to
    first-occurrence-order distinct)."""
    from crawl4ai_spark.operators.chunking import sentence_chunks_punkt_col

    cases = [
        ("Good muffins cost $3.88 in New York. Please buy me two of them. Thanks.",
         ["Good muffins cost $3.88 in New York.", "Please buy me two of them.",
          "Thanks."]),
        ("Mr. Smith went to Washington. He bought 3.5 kg of apples, e.g. red ones. Dr. No was there.",
         ["Mr. Smith went to Washington.",
          "He bought 3.5 kg of apples, e.g. red ones.", "Dr. No was there."]),
        ("Is this it? Yes! No trailing terminator here",
         ["Is this it?", "Yes!", "No trailing terminator here"]),
        ("The U.S.A. is large. J. Doe agrees.",
         ["The U.S.A. is large.", "J. Doe agrees."]),
        ("One. One. Two.", ["One.", "Two."]),  # the reference's set()
        ("", []),
        ("word", ["word"]),
        ('He said "Stop." Then left. (Really.) Done.',
         ['He said "Stop."', "Then left.", "(Really.)", "Done."]),
        ("See Fig. 3 for details. The end.",
         ["See Fig. 3 for details.", "The end."]),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
    )
    got = {r.i: list(r.s) for r in
           df.select("i", sentence_chunks_punkt_col("t").alias("s")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]} != {want}"
