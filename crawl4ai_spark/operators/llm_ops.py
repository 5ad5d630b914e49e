"""LLM extraction / filtering plumbing (SURVEY.md §2.3 T15/T24/T25).

The reference's LLMExtractionStrategy and LLMContentFilter call an external
model provider — unavailable in this environment, exactly like the
multimodal codecs. The SPARK-side machinery here is real and tested:

- ``merge_chunks``: EXACT restatement of the reference's token-budget chunk
  merger (utils.py:162-226 — pre-allocated even chunk distribution with
  token-count overlap carry), constants from config.py:42-44
  (chunk_token_threshold 2048, overlap_rate 0.1, word_token_rate 1.3);
- ``llm_extract_pages``: the distributed request pipeline — per document,
  the selected input (markdown/html/fit) is chunked with merge_chunks, one
  prompt per chunk, provider calls batched per Arrow partition inside
  ``mapInPandas`` (the row-explosion 1→N shape the real strategy needs),
  responses landed as (url, chunk_idx, response) rows.

The provider itself is STUBBED: ``llm=`` accepts any ``prompt -> str``
callable (a real client drops in unchanged); the default
``DeterministicStubLLM`` returns a reproducible JSON block built from the
chunk text (length, top keywords, first sentence) so the plumbing is
testable end-to-end without a network or a model.
"""

from __future__ import annotations

import json
from array import array
from collections import Counter
from collections.abc import Callable, Iterator
from itertools import chain

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_TOKEN_THRESHOLD = 2 ** 11
OVERLAP_RATE = 0.1
WORD_TOKEN_RATE = 1.3


def merge_chunks(
    docs: list[str],
    target_size: int,
    overlap: int = 0,
    word_token_ratio: float = 1.0,
    splitter: Callable[[str], list[str]] | None = None,
) -> list[str]:
    """Merge documents into ~target_size-token chunks with optional token
    overlap (exact reference semantics: utils.py:162-226 — chunk count
    pre-computed from the total, tokens distributed in order, the last
    ``overlap`` tokens carried into the next chunk)."""
    splitter = splitter or str.split
    token_counts = array("I")
    all_tokens: list[list[str]] = []
    total_tokens = 0
    for doc in docs:
        tokens = splitter(doc)
        count = int(len(tokens) * word_token_ratio)
        if count:
            token_counts.append(count)
            all_tokens.append(tokens)
            total_tokens += count
    if not total_tokens:
        return []
    num_chunks = max(1, (total_tokens + target_size - 1) // target_size)
    chunks: list[list[str]] = [[] for _ in range(num_chunks)]
    curr_chunk = 0
    curr_size = 0
    for token in chain.from_iterable(all_tokens):
        if curr_size >= target_size and curr_chunk < num_chunks - 1:
            if overlap > 0:
                overlap_tokens = chunks[curr_chunk][-overlap:]
                curr_chunk += 1
                chunks[curr_chunk].extend(overlap_tokens)
                curr_size = len(overlap_tokens)
            else:
                curr_chunk += 1
                curr_size = 0
        chunks[curr_chunk].append(token)
        curr_size += 1
    return [" ".join(chunk) for chunk in chunks if chunk]


class DeterministicStubLLM:
    """STUB provider — a pure function of the prompt, so the distributed
    pipeline is testable and reproducible. Swap for a real client callable
    (prompt -> str) to run against an actual model."""

    def __call__(self, prompt: str) -> str:
        from crawl4ai_spark.html.bm25_filter import STOP_WORDS

        body = prompt.split("\n<content>\n", 1)[-1]
        words = body.split()
        keywords = [
            w for w, _ in Counter(
                t for t in (w.lower().strip(".,!?;:") for w in words)
                if len(t) > 2 and t not in STOP_WORDS
            ).most_common(3)
        ]
        first_sentence = body.split(".")[0][:120]
        return json.dumps(
            {"n_words": len(words), "keywords": keywords,
             "summary": first_sentence},
            ensure_ascii=False,
        )


def build_prompt(instruction: str, chunk: str) -> str:
    return f"{instruction}\n<content>\n{chunk}"


def llm_extract_pages(
    df: DataFrame,
    instruction: str,
    llm: Callable[[str], str] | None = None,
    text_col: str = "text",
    id_col: str = "url",
    chunk_token_threshold: int = CHUNK_TOKEN_THRESHOLD,
    overlap_rate: float = OVERLAP_RATE,
    word_token_rate: float = WORD_TOKEN_RATE,
) -> DataFrame:
    """(id, chunk_idx, response) — one provider call per merged chunk,
    executed inside Arrow partitions (no driver-side loops; a partition's
    calls run sequentially, partitions in parallel — the batch analog of
    the reference's per-chunk async fan-out)."""
    provider = llm or DeterministicStubLLM()
    overlap = int(chunk_token_threshold * overlap_rate)
    schema = f"{id_col} string, chunk_idx long, response string"
    cols = df.select(F.col(id_col).cast("string"), F.col(text_col).alias("_t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: [], "chunk_idx": [], "response": []}
            for rid, text in zip(pdf[id_col], pdf["_t"]):
                chunks = merge_chunks(
                    [text or ""], chunk_token_threshold,
                    overlap=overlap, word_token_ratio=word_token_rate,
                )
                for i, chunk in enumerate(chunks):
                    out[id_col].append(rid)
                    out["chunk_idx"].append(i)
                    out["response"].append(provider(build_prompt(instruction, chunk)))
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema)
