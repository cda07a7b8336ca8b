"""Deterministic Common-Crawl-style webtext corpus generator (FIXTURES.md §1).

Input table shape mandated by BASELINE.json input_hint:
  documents(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Properties engineered in:
  * ≥1 forced head term with ~100× the Zipf-head df — exercises skew salting
    (SURVEY.md §7.4 #3)
  * rare "needle" terms with known exact tf/df for hand-checkable BM25
  * html built FROM text via escape + decorative tags, so html→text
    extraction is verifiable byte-for-byte per url
  * lang: ~90% 'en', minority 'de'/'fr'/NULL — drives the ShouldIndex-analog
    predicate (reference: Score.cs:33 preserve && ranked && warnings==0)
  * warc_ts monotone-ish — the resume-cursor column (reference cursor:
    ElasticModel.cs:44 keyset pagination on scores.id)

Everything is value = f(seed, row_idx): order-independent, reproducible.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.textprep import html_escape

SEED = 42
VOCAB_SIZE = 30_000
HEAD_TERM = "zebra"  # forced head term, injected into ~60% of docs many times
NEEDLES = ["needleunique", "needlepair", "needletriple"]  # known tiny df
EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _vocab() -> list[str]:
    # deterministic synthetic vocabulary: wAAAA-style words; a few real-ish
    # stopwords at the Zipf head so language-id heuristics have signal
    head = ["the", "and", "of", "to", "in", "is", "for", "with", "on", "that"]
    rest = [f"w{idx:05d}" for idx in range(VOCAB_SIZE - len(head))]
    return head + rest


def generate_documents(n_docs: int, seed: int = SEED) -> pa.Table:
    """Generate the corpus as an Arrow table (url, warc_ts, html, text, lang)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())

    # doc lengths ~ lognormal(mu=5.0, sigma=0.6): median ~148 tokens
    dls = np.clip(rng.lognormal(5.0, 0.6, n_docs).astype(np.int64), 8, 4000)

    # Zipf(1.3) over the vocab — heavy head, long tail. Rejection-sample with
    # a margin: ~5% of draws exceed VOCAB_SIZE and are discarded, so keep
    # drawing until the pool covers sum(dls).
    need = int(dls.sum())
    pool: list[np.ndarray] = []
    have = 0
    while have < need:
        draw = rng.zipf(1.3, size=max(need - have, 1) * 2 + 1024)
        draw = draw[draw <= VOCAB_SIZE]
        pool.append(draw)
        have += draw.size
    zipf_ranks = np.concatenate(pool)[:need] - 1

    urls, texts, langs, tss, htmls = [], [], [], [], []
    pos = 0
    lang_roll = rng.random(n_docs)
    head_roll = rng.random(n_docs)
    jitter = rng.integers(0, 5, n_docs)
    for i in range(n_docs):
        dl = int(dls[i])
        words = list(vocab[zipf_ranks[pos : pos + dl]])
        pos += dl
        # head-term skew: ~60% of docs get 1..8 extra copies of HEAD_TERM
        if head_roll[i] < 0.6:
            k = 1 + int(head_roll[i] * 13) % 8
            words.extend([HEAD_TERM] * k)
        # needles: tiny known df
        if i % 997 == 0:
            words.append(NEEDLES[0])
        if i % 499 == 0:
            words.append(NEEDLES[1])
        if i % 101 == 0:
            words.extend([NEEDLES[2]] * (1 + i % 3))
        # deterministic shuffle of word order (rank-irrelevant, realism only)
        order = np.random.default_rng(seed * 1_000_003 + i).permutation(len(words))
        words = [words[j] for j in order]
        # paragraphs every ~40 words; text includes punctuation + newlines
        parts: list[str] = []
        for j, w in enumerate(words):
            parts.append(w)
            parts.append("\n\n" if (j + 1) % 40 == 0 else " ")
        text = "".join(parts).rstrip() + "."
        url = f"https://example-{i % 1000:03d}.test/page/{i:010d}"
        lang = (
            "en"
            if lang_roll[i] < 0.90
            else ("de" if lang_roll[i] < 0.95 else ("fr" if lang_roll[i] < 0.98 else None))
        )
        urls.append(url)
        texts.append(text)
        langs.append(lang)
        tss.append(EPOCH + timedelta(seconds=int(i) * 7 + int(jitter[i])))
        htmls.append(_render_html(url, text, i))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def _render_html(url: str, text: str, i: int) -> bytes:
    """Wrap text in deterministic html. Decorative <b>/<i> spans are inserted
    into the ESCAPED text at fixed offsets — the extractor strips tags before
    unescaping, so extraction returns `text` byte-identically."""
    esc = html_escape(text)
    # insert a decorative tag pair at two deterministic cut points
    if len(esc) > 40:
        a = (i * 37) % (len(esc) // 2)
        b = a + (len(esc) // 3)
        esc = esc[:a] + "<b>" + esc[a:b] + "</b>" + esc[b:]
    title = html_escape(url)
    return (
        f"<html><head><title>{title}</title>"
        f"<style>p{{margin:0 auto}}</style>"
        f"<script>var x={i};</script></head>"
        f"<body><p>{esc}</p></body></html>"
    ).encode("utf-8")


def reference_queries() -> list[tuple[int, str, int]]:
    """The fixed reference query set: [(query_id, query_text, k)].
    Mix per FIXTURES.md §1b: rare terms, the head term, multi-term,
    absent term (empty result), duplicate terms (dedup in scoring)."""
    qs = [
        NEEDLES[0],  # single rare term
        NEEDLES[1],
        NEEDLES[2],
        HEAD_TERM,  # single head term (skew path)
        "the",  # stopword head
        f"{NEEDLES[0]} {HEAD_TERM}",  # rare + head
        f"{NEEDLES[1]} {NEEDLES[2]}",
        "the and of",  # 3-term all-head
        "w00100 w00200",  # mid-frequency pair
        "w01000 w02000 w03000",
        "xyzzyabsent",  # absent term -> empty result
        f"{HEAD_TERM} {HEAD_TERM} {HEAD_TERM}",  # duplicate terms dedup
        "w00050",
        "w00500 the",
        f"w00007 {NEEDLES[2]}",
        "in for with",
        "w10000",  # deep-tail term
        "w00001 w00002 w00003",
        f"The AND {HEAD_TERM.upper()}",  # case-folding path
        "w00300, w00400.",  # punctuation stripping
    ]
    return [(qid, q, 10) for qid, q in enumerate(qs)]


def write_corpus(path: str, n_docs: int, seed: int = SEED) -> str:
    """Write the corpus parquet to `path` (a file path). Returns path.

    Small row groups (8192 docs) keep the file SPLITTABLE: parquet scans
    parallelize at row-group granularity, and a single-row-group file forces
    every reader through one task regardless of cluster size."""
    pq.write_table(generate_documents(n_docs, seed), path, row_group_size=8192)
    return path


def evolve_corpus(
    tbl: pa.Table,
    n_new: int = 200,
    n_update: int = 30,
    n_flip: int = 20,
    seed: int = SEED + 1,
) -> pa.Table:
    """Deterministically evolve a corpus: the CDC fixture (SURVEY.md §5.2 #4).

    * n_new brand-new urls appended (re-crawl discovers new pages)
    * n_update existing urls re-crawled with CHANGED text (update path:
      tombstone old docID + add fresh one)
    * n_flip existing urls re-crawled with lang flipped to 'de' (delete path:
      fails the ShouldIndex analog)
    All changed/new rows get warc_ts strictly greater than every original
    row — they are exactly the rows a cursor scan picks up.
    """
    base_n = tbl.num_rows
    d = {name: tbl[name].to_pylist() for name in tbl.column_names}
    max_ts = max(d["warc_ts"])
    rng = np.random.default_rng(seed)
    upd = rng.choice(base_n, size=n_update + n_flip, replace=False)
    update_idx, flip_idx = upd[:n_update], upd[n_update:]
    t = max_ts
    for j, i in enumerate(sorted(update_idx)):
        t = t + timedelta(seconds=7)
        d["text"][i] = d["text"][i] + f" recrawled updatedcontent w{j % 50:05d}"
        d["html"][i] = _render_html(d["url"][i], d["text"][i], i)
        d["warc_ts"][i] = t
    for i in sorted(flip_idx):
        t = t + timedelta(seconds=7)
        d["lang"][i] = "de"
        d["warc_ts"][i] = t
    fresh = generate_documents(n_new, seed=seed * 7 + 1)
    for i in range(n_new):
        t = t + timedelta(seconds=7)
        url = f"https://example-new.test/page/{base_n + i:010d}"
        d["url"].append(url)
        d["warc_ts"].append(t)
        txt = fresh["text"][i].as_py()
        d["text"].append(txt)
        d["html"].append(_render_html(url, txt, base_n + i))
        d["lang"].append(fresh["lang"][i].as_py())
    return pa.table(
        {
            "url": pa.array(d["url"], pa.string()),
            "warc_ts": pa.array(d["warc_ts"], pa.timestamp("us", tz="UTC")),
            "html": pa.array(d["html"], pa.binary()),
            "text": pa.array(d["text"], pa.string()),
            "lang": pa.array(d["lang"], pa.string()),
        }
    )
