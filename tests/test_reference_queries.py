"""Run the REFERENCE's own query files through the full pipeline.

The reference corpus (Lucene ClueWeb09 index) is absent, so rank comparison
against its golden outputs is impossible (SURVEY.md §5.1) — but its query
set is the authoritative parse/execution surface: every query in every
``TEST_DIR/*.qry`` must parse into a well-formed tree and execute under
BM25 and Indri over our corpus with the engine exactly matching the oracle
(most queries simply have zero or few hits on synthetic text — the
zero-hit path is part of the contract)."""

import glob

import pytest

from searchengines_ray.index.build import build_index, doc_id_from_url
from searchengines_ray.models import BM25, Indri
from searchengines_ray.oracle import OracleIndex, run_query
from searchengines_ray.parser import parse_query, parse_query_line
from searchengines_ray.query.engine import SearchEngine
from searchengines_ray.sources.pages import dedup_pages_pandas, synth_pages

QRY_FILES = sorted(glob.glob("/root/reference/TEST_DIR/*.qry"))


def _all_queries():
    out = []
    for path in QRY_FILES:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(parse_query_line(line))
    return out


def test_reference_query_files_found():
    assert len(QRY_FILES) >= 5
    assert len(_all_queries()) >= 50


def test_every_reference_query_parses():
    for qid, text in _all_queries():
        for default_op in ("sum", "and"):
            tree = parse_query(text, default_op)  # None (all-stop) is legal
            if tree is not None:
                assert tree.op in (
                    "term", "syn", "near", "window", "and", "or", "sum",
                    "wand", "wsum",
                )


@pytest.fixture(scope="module")
def engine_and_oracle(tmp_path_factory, ray_session):
    import ray.data

    # corpus containing some English so a few reference terms actually hit
    tbl = synth_pages(n=120, seed=41, vocab=150)
    import pyarrow as pa

    english = [
        "internet phone service providers offer high speed access",
        "the east ridge high school credit report",
        "free annual credit report and phone service",
    ]
    urls = [f"https://en.synth.test/e/{i}" for i in range(len(english))]
    extra = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array([1] * len(english), pa.timestamp("us")),
            "html": pa.array([t.encode() for t in english], pa.binary()),
            "text": pa.array(english),
            "lang": pa.array(["en"] * len(english)),
        }
    )
    tbl = pa.concat_tables([tbl, extra])
    out = str(tmp_path_factory.mktemp("refq"))
    ds = ray.data.from_arrow(tbl.drop_columns(["html"]))
    build_index(ds, out, docs_per_segment=40, dedup=True)
    df = dedup_pages_pandas(tbl)
    docs = [
        {"doc_id": doc_id_from_url(r.url), "url": r.url, "body": r.text}
        for r in df.itertuples()
    ]
    return SearchEngine(out), OracleIndex.build(docs)


def test_reference_queries_engine_matches_oracle(engine_and_oracle):
    eng, oidx = engine_and_oracle
    queries = _all_queries()[:80]
    for model in (BM25(), Indri(mu=900.0, lam=0.4)):
        res = eng.search_batch(
            [(f"{i}", t) for i, (_, t) in enumerate(queries)], model, k=10
        )
        for i, (_, text) in enumerate(queries):
            want = run_query(oidx, text, model, k=10)
            got = res[res.qid == str(i)]
            got_rows = list(
                zip(got.doc_id.tolist(), got.url.tolist(), got.score.tolist())
            )
            assert got_rows == want, (model.name, text)
