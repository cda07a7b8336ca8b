"""Unit tests: tokenizer golden cases, html→text byte-identity, oracle BM25
vs hand-computed values (SURVEY.md §5.2 tier 1)."""

import hashlib
import math

import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from osu_elastic_indexer_spark import oracle
from osu_elastic_indexer_spark.functions.textprep import (
    extract_text,
    html_escape,
    tokenize,
)
from osu_elastic_indexer_spark.sources.fixtures import (
    HEAD_TERM,
    generate_documents,
)


def test_tokenize_golden():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("a_b c-d") == ["a", "b", "c", "d"]  # underscore splits
    assert tokenize("Straße GROSS") == ["strasse", "gross"]  # casefold, not lower
    assert tokenize("x1 2y 3") == ["x1", "2y", "3"]
    assert tokenize("don't") == ["don", "t"]


def test_extract_text_strips_and_unescapes():
    html = (
        b"<html><head><title>T</title><style>p{x}</style>"
        b"<script>if(1<2){}</script></head>"
        b"<body><p>a &amp; b &lt;tag&gt; c</p></body></html>"
    )
    assert extract_text(html) == "a & b <tag> c"
    assert extract_text(None) is None


def test_extract_tag_inside_entity():
    # generator may insert tags mid-entity; strip-then-unescape handles it
    assert extract_text(b"<body>x &a<b>mp</b>; y</body>") == "x & y"


@given(st.text(min_size=0, max_size=500))
@settings(max_examples=200, deadline=None)
def test_escape_extract_roundtrip(text):
    html = f"<body><p>{html_escape(text)}</p></body>".encode("utf-8")
    assert extract_text(html) == text


def test_fixture_corpus_byte_identity():
    """FIXTURES.md per-row invariant: sha256(extract(html)) == sha256(text)."""
    tbl = generate_documents(300)
    for html, text in zip(tbl["html"].to_pylist(), tbl["text"].to_pylist()):
        assert (
            hashlib.sha256(extract_text(html).encode()).hexdigest()
            == hashlib.sha256(text.encode()).hexdigest()
        )


def test_fixture_deterministic():
    a = generate_documents(50)
    b = generate_documents(50)
    assert a.equals(b)


def test_fixture_head_term_skew():
    tbl = generate_documents(2000)
    df_head = sum(HEAD_TERM in tokenize(t) for t in tbl["text"].to_pylist())
    assert df_head > 1000  # ~60% of docs


def test_oracle_bm25_hand_computed():
    # corpus: 3 docs; query 'cat'
    docs = [
        (0, "cat dog cat"),  # dl=3, tf(cat)=2
        (1, "dog mouse bird"),  # dl=3
        (2, "cat"),  # dl=1, tf(cat)=1
    ]
    idx = oracle.build_index(docs)
    assert idx.n_docs == 3
    assert idx.avgdl == (3 + 3 + 1) / 3
    res = oracle.search(idx, "cat", k=10)
    n, df = 3, 2
    w = math.log(1 + (n - df + 0.5) / (df + 0.5))
    avgdl = 7 / 3

    def score(tf, dl):
        return w * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))

    expect = sorted(
        [(0, score(2, 3)), (2, score(1, 1))], key=lambda kv: (-kv[1], kv[0])
    )
    assert [d for d, _ in res] == [d for d, _ in expect]
    for (d1, s1), (d2, s2) in zip(res, expect):
        assert d1 == d2 and abs(s1 - s2) < 1e-15


def test_oracle_ties_and_dedup_and_absent():
    docs = [(5, "cat dog"), (3, "cat dog"), (9, "cat dog")]
    idx = oracle.build_index(docs)
    res = oracle.search(idx, "cat cat CAT", k=2)  # duplicate terms scored once
    assert [d for d, _ in res] == [3, 5]  # identical scores -> doc_id asc
    s_single = oracle.search(idx, "cat", k=3)
    assert [s for _, s in res] == [s for _, s in s_single[:2]]
    assert oracle.search(idx, "absentterm", k=5) == []


def test_oracle_end_to_end_corpus(corpus_path):
    tbl = pq.read_table(corpus_path)
    corpus = [
        (i, h)
        for i, (h, lang) in enumerate(
            zip(tbl["html"].to_pylist(), tbl["lang"].to_pylist())
        )
        if lang == "en"
    ]
    res = oracle.search_corpus(corpus, HEAD_TERM, k=10)
    assert len(res) == 10
    assert all(res[i][1] >= res[i + 1][1] for i in range(9))
