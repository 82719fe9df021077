"""Chunking operator semantics: window starts, overlap sharing,
trailing partial chunks, empty documents, and parameter validation."""

from __future__ import annotations

import hashlib

import pytest

from fastmlframework_spark.extensions.chunking import chunk_by_tokens


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_chunk_windows_and_overlap(spark):
    # 7 single-letter tokens, size=4, overlap=2 → step=2 → starts 0,2,4,6.
    text = "a b c d e f g"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = (
        chunk_by_tokens(df, chunk_size=4, overlap=2)
        .orderBy("chunk_idx")
        .collect()
    )
    got = [(r.chunk_idx, r.n_chunk_tokens, r.chunk_digest) for r in rows]
    assert got == [
        (0, 4, _md5("a b c d")),
        (1, 4, _md5("c d e f")),
        (2, 3, _md5("e f g")),
        (3, 1, _md5("g")),
    ]


def test_chunk_exact_multiple_no_phantom_window(spark):
    # 4 tokens, size=4, overlap=2 → starts 0,2 (stop at n-1=3): no
    # window starting at/after the end of the token list.
    df = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    rows = chunk_by_tokens(df, chunk_size=4, overlap=2).collect()
    assert sorted(r.chunk_idx for r in rows) == [0, 1]
    assert {r.chunk_idx: r.n_chunk_tokens for r in rows} == {0: 4, 1: 2}


def test_chunk_empty_doc_yields_one_empty_chunk(spark):
    df = spark.createDataFrame([(1, "")], "doc_id int, text string")
    rows = chunk_by_tokens(df, chunk_size=4, overlap=2).collect()
    assert len(rows) == 1
    assert rows[0].n_chunk_tokens == 0
    assert rows[0].chunk_digest == _md5("")


def test_chunk_short_doc_single_window(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    rows = chunk_by_tokens(df, chunk_size=40, overlap=10).collect()
    assert len(rows) == 1
    assert rows[0].n_chunk_tokens == 2
    assert rows[0].chunk_digest == _md5("hello world")


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_by_tokens(df, chunk_size=4, overlap=4)


def test_chunk_drops_text_keeps_other_columns(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b c")], "doc_id int, lang string, text string"
    )
    out = chunk_by_tokens(df, chunk_size=4, overlap=2)
    assert out.columns == [
        "doc_id",
        "lang",
        "chunk_idx",
        "n_chunk_tokens",
        "chunk_digest",
    ]
