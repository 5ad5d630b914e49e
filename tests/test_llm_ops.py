"""T15/T24/T25 LLM plumbing: exact merge_chunks semantics + the distributed
stubbed extraction pipeline."""

from __future__ import annotations

from crawl4ai_spark.operators.llm_ops import (
    DeterministicStubLLM,
    llm_extract_pages,
    merge_chunks,
)


def _ref_merge(docs, target_size, overlap=0, word_token_ratio=1.0):
    """Direct restatement of utils.py:162-226 for differential checking."""
    from itertools import chain

    all_tokens, total = [], 0
    for doc in docs:
        toks = doc.split()
        count = int(len(toks) * word_token_ratio)
        if count:
            all_tokens.append(toks)
            total += count
    if not total:
        return []
    num_chunks = max(1, (total + target_size - 1) // target_size)
    chunks = [[] for _ in range(num_chunks)]
    cc, cs = 0, 0
    for tok in chain.from_iterable(all_tokens):
        if cs >= target_size and cc < num_chunks - 1:
            if overlap > 0:
                ov = chunks[cc][-overlap:]
                cc += 1
                chunks[cc].extend(ov)
                cs = len(ov)
            else:
                cc += 1
                cs = 0
        chunks[cc].append(tok)
        cs += 1
    return [" ".join(c) for c in chunks if c]


def test_merge_chunks_matches_reference_semantics():
    docs = [
        " ".join(f"w{i}" for i in range(37)),
        "",
        " ".join(f"x{i}" for i in range(11)),
        " ".join(f"y{i}" for i in range(53)),
    ]
    for target in (10, 16, 40, 200):
        for overlap in (0, 3):
            for ratio in (1.0, 1.3, 0.75):
                assert merge_chunks(docs, target, overlap, ratio) == _ref_merge(
                    docs, target, overlap, ratio
                ), (target, overlap, ratio)
    assert merge_chunks([], 10) == []
    assert merge_chunks(["", "  "], 10) == []


def test_overlap_carries_tail_tokens():
    text = " ".join(f"t{i}" for i in range(30))
    chunks = merge_chunks([text], 10, overlap=2)
    assert len(chunks) >= 2
    head_of_second = chunks[1].split()[:2]
    tail_of_first = chunks[0].split()[-2:]
    assert head_of_second == tail_of_first


def test_stub_llm_is_deterministic():
    stub = DeterministicStubLLM()
    p = "extract\n<content>\nspark spark crawl engine. more text here"
    a, b = stub(p), stub(p)
    assert a == b
    import json

    out = json.loads(a)
    assert out["keywords"][0] == "spark"
    assert out["n_words"] == 7


def test_llm_extract_pages_pipeline(spark):
    import json

    df = spark.createDataFrame(
        [("u1", " ".join(f"w{i}" for i in range(900))),
         ("u2", "short doc only"),
         ("u3", None)],
        "url string, text string",
    )
    out = llm_extract_pages(df, "summarize", chunk_token_threshold=400,
                            overlap_rate=0.1, word_token_rate=1.0)
    rows = out.collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    assert len(by_url["u1"]) >= 2          # long doc chunked into multiple calls
    assert len(by_url["u2"]) == 1
    assert "u3" not in by_url              # empty text -> no chunks
    resp = json.loads(by_url["u2"][0].response)
    assert resp["n_words"] == 3
