"""Pages-table sources.

The engine's authoritative input shape (BASELINE.json ``input_hint``):

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Two deterministic providers (no external data):

- :func:`pages_from_documents` — derives a pages table from the driver's
  synthetic ``documents.parquet`` (deterministic, and expressible in ANSI SQL
  so DuckDB oracles can reproduce it: ``url = 'https://example.org/doc/' ||
  lpad(doc_id, 12, '0')``).
- :func:`synth_pages` — standalone Zipfian corpus for unit tests: heavy-term
  skew, url recrawl duplicates, empty docs, a few very long docs
  (FIXTURES.md §1 synthesis rules).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def url_for_doc_id(doc_id: int) -> str:
    return f"https://example.org/doc/{doc_id:012d}"


def pages_from_documents(sf_dir: str, include_html: bool = False):
    """Ray Dataset of pages derived from ``{sf_dir}/documents.parquet``.

    Column pruning happens at the read; ``html`` (= utf-8 of text, identity
    extraction invariant) is only materialized when asked for.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        urls = [url_for_doc_id(d) for d in doc_ids]
        cols = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(doc_ids, dtype="int64") * 1_000_000,
                pa.timestamp("us"),
            ),
            "text": batch.column("text"),
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),
        }
        if include_html:
            cols["html"] = pa.array(
                [t.encode("utf-8") for t in batch.column("text").to_pylist()],
                pa.binary(),
            )
        return pa.table(cols)

    return ds.map_batches(to_pages, batch_format="pyarrow")


def synth_pages(
    n: int = 300,
    seed: int = 7,
    vocab: int = 800,
    dup_frac: float = 0.05,
    empty_frac: float = 0.02,
) -> pa.Table:
    """Deterministic synthetic pages table (FIXTURES.md §1).

    Zipfian vocabulary (exercises heavy-term paths), log-normal doc lengths,
    stopwords interleaved (position semantics), url duplicates differing only
    in ``warc_ts`` (dedup path), empty texts, and one very long doc.
    """
    rng = np.random.default_rng(seed)
    words = [f"w{i:04d}" for i in range(vocab)]
    stop = ["the", "of", "and", "to", "a", "in", "is", "that"]
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    urls, tss, texts, langs = [], [], [], []
    for i in range(n):
        url = f"https://synth.test/p/{i:06d}"
        length = int(np.clip(rng.lognormal(3.6, 0.8), 5, 2000))
        if rng.random() < empty_frac:
            body = ""
        else:
            toks = rng.choice(words, size=length, p=probs).tolist()
            # interleave stopwords at ~1/4 of positions
            mask = rng.random(length) < 0.25
            toks = [
                stop[j % len(stop)] if m else t
                for j, (t, m) in enumerate(zip(toks, mask))
            ]
            body = " ".join(toks)
        urls.append(url)
        tss.append(1_500_000_000_000_000 + i * 1_000_000)
        texts.append(body)
        langs.append("en" if rng.random() < 0.9 else "de")
    # one very long doc
    texts[-1] = " ".join(
        rng.choice(words, size=5000, p=probs).tolist()
    )
    # url recrawl duplicates: same url, later warc_ts, different text
    n_dup = int(n * dup_frac)
    for j in range(n_dup):
        urls.append(urls[j])
        tss.append(tss[j] + 999_000_000)
        texts.append(texts[j] + " recrawl extra tokens w0001 w0002")
        langs.append(langs[j])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array([t.encode() for t in texts], pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def dedup_pages_pandas(tbl: pa.Table):
    """The oracle-side url-dedup (keep first by warc_ts) — the same frozen
    rule as :func:`searchengines_ray.index.build.dedup_pages`."""
    df = tbl.to_pandas()
    return (
        df.sort_values(["url", "warc_ts"], kind="mergesort")
        .drop_duplicates("url", keep="first")
        .reset_index(drop=True)
    )


# ------------------------------------------------ HTML text extraction ----

_HTML_SCRIPT_RE = None  # compiled lazily (module import stays light)


def _html_res():
    global _HTML_SCRIPT_RE
    if _HTML_SCRIPT_RE is None:
        import re

        _HTML_SCRIPT_RE = (
            re.compile(r"(?is)<script\b[^>]*>.*?</script>"),
            re.compile(r"(?is)<style\b[^>]*>.*?</style>"),
            re.compile(r"(?s)<!--.*?-->"),
            re.compile(r"<[^>]*>"),
            re.compile(
                r"&(?:#x([0-9a-fA-F]+)|#([0-9]+)|(amp|lt|gt|quot|apos));"
            ),
        )
    return _HTML_SCRIPT_RE


_NAMED_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"',
                   "apos": "'"}


def _entity_sub(m) -> str:
    if m.group(1):
        return chr(int(m.group(1), 16))
    if m.group(2):
        return chr(int(m.group(2)))
    return _NAMED_ENTITIES[m.group(3)]


def extract_text(html: bytes) -> str:
    """Deterministic HTML -> text extraction (the per-row invariant of
    the input contract: extraction must recover the page text
    BYTE-IDENTICALLY).  Frozen ordered chain:

    1. utf-8 decode (errors='replace' — WARC payloads carry junk bytes);
    2. drop <script>/<style> blocks (case-insensitive, non-greedy);
    3. drop comments;
    4. drop every remaining tag (``<[^>]*>``);
    5. unescape entities (numeric hex/dec + the five core named ones)
       in ONE simultaneous regex pass — replacement output is never
       re-scanned, so ``&#38;lt;`` correctly yields the literal
       ``&lt;`` and ``&amp;amp;`` yields ``&amp;`` (a sequential
       decode chain double-decodes whichever form runs first).

    NO whitespace collapsing — byte fidelity is the contract; cleanup
    belongs to the downstream ``normalize_text`` stage.
    """
    script, style, comment, tag, ent = _html_res()
    s = (html or b"").decode("utf-8", errors="replace")
    s = script.sub("", s)
    s = style.sub("", s)
    s = comment.sub("", s)
    s = tag.sub("", s)
    return ent.sub(_entity_sub, s)


def extract_pages(
    ds, html_col: str = "html", out_col: str = "text",
    keep_html: bool = False,
):
    """map_batches stage: add/overwrite ``out_col`` with the extracted
    text of ``html_col``.  Embarrassingly parallel; per-row work is a
    fixed regex chain over the page bytes.

    The raw bytes column is DROPPED by default: html is the heaviest
    column of a crawl table and everything downstream (tokenize, index,
    dedup) consumes only the text — carrying it through the pipeline is
    the single biggest wasted byte-mover at 100 TB.  Pass
    ``keep_html=True`` only when a later stage re-reads the bytes."""
    import pandas as pd

    def ex(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out[out_col] = [extract_text(h) for h in batch[html_col]]
        if not keep_html and html_col != out_col:
            out = out.drop(columns=[html_col])
        return out

    return ds.map_batches(ex, batch_format="pandas")
