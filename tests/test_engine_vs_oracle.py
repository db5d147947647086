"""The primary correctness gate (SURVEY.md §5.2): the distributed Ray
pipeline must be EXACTLY rank- and score-identical to the single-process
oracle — same docids, same urls, bit-equal float scores, same order under
the (score desc, url asc) tie-break."""

import os

import numpy as np
import pyarrow as pa
import pytest

from searchengines_ray.index.build import build_index
from searchengines_ray.models import (
    BM25,
    Indri,
    RankedBoolean,
    UnrankedBoolean,
)
from searchengines_ray.oracle import OracleIndex, run_query
from searchengines_ray.query.engine import SearchEngine
from searchengines_ray.sources.pages import dedup_pages_pandas, synth_pages

QUERIES = [
    "w0001 w0005 w0123",  # bag-of-words BM25 flagship
    "w0002",
    "w0000 w0000 w0017",  # duplicate query term (counts twice in #SUM)
    "#AND(w0003 w0008)",
    "#OR(w0004 w0777)",
    "#SUM(w0009 #AND(w0010 w0011))",
    "#NEAR/1(w0001 w0002)",
    "#NEAR/3(w0005 w0006)",
    "#WINDOW/5(w0007 w0012)",
    "#SYN(w0013 w0014 w0015)",
    "#WAND(0.6 w0016 0.4 w0018)",
    "#WSUM(0.3 w0019 0.7 w0020)",
    "#SUM(#NEAR/2(w0021 w0022) w0023)",
    "#AND(w0024.title w0025)",
    "p.url 000123.url",  # url field
    "the of and",  # all stopwords -> no hits
    "zzzznohit",  # zero-hit
    "#OR(#NEAR/1(w0030 w0031) #WINDOW/4(w0032 w0033))",
    # 3- and 4-arg positional ops: the n-ary batch automata path
    "#NEAR/2(w0000 w0001 w0002)",
    "#NEAR/4(w0003 w0004 w0005 w0006)",
    "#WINDOW/6(w0000 w0002 w0004)",
    "#WINDOW/9(w0001 w0003 w0005 w0007)",
    "#SUM(#NEAR/3(w0008 w0009 w0010) w0011)",
]

MODELS = [
    BM25(),
    BM25(k_1=0.9, b=0.4, k_3=7.0),
    Indri(mu=300.0, lam=0.4),
    Indri(mu=1500.0, lam=0.7),
    RankedBoolean(),
    UnrankedBoolean(),
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    import ray.data

    tbl = synth_pages(n=240, seed=11, vocab=400)
    out = str(tmp_path_factory.mktemp("index"))
    ds = ray.data.from_arrow(tbl.drop_columns(["html"]))
    stats = build_index(
        ds, out, docs_per_segment=40, dedup=True, keep_forward=False
    )
    # oracle over the same deduped rows, same frozen dedup rule
    df = dedup_pages_pandas(tbl)
    docs = [
        {
            "doc_id": __import__(
                "searchengines_ray.index.build", fromlist=["doc_id_from_url"]
            ).doc_id_from_url(r.url),
            "url": r.url,
            "body": r.text,
        }
        for r in df.itertuples()
    ]
    oidx = OracleIndex.build(docs)
    return out, oidx, stats


def test_stats_match(corpus):
    out, oidx, stats = corpus
    assert stats["n_docs"] == oidx.n_docs
    assert stats["doc_count"] == oidx.doc_count
    assert stats["sum_field_len"] == oidx.sum_field_len


@pytest.mark.parametrize("model_i", range(len(MODELS)))
def test_inprocess_engine_matches_oracle(corpus, model_i):
    out, oidx, _ = corpus
    model = MODELS[model_i]
    eng = SearchEngine(out, num_searchers=0)
    res = eng.search_batch([(str(i), q) for i, q in enumerate(QUERIES)], model, k=15)
    for i, q in enumerate(QUERIES):
        want = run_query(oidx, q, model, k=15)
        got = res[res.qid == str(i)]
        got_rows = list(
            zip(got.doc_id.tolist(), got.url.tolist(), got.score.tolist())
        )
        assert got_rows == want, (
            f"model={model.name} query={q!r}\n got={got_rows[:5]}\nwant={want[:5]}"
        )


def test_actor_engine_matches_oracle(corpus, ray_session):
    out, oidx, _ = corpus
    model = BM25()
    eng = SearchEngine(out, num_searchers=3)
    res = eng.search_batch([(str(i), q) for i, q in enumerate(QUERIES)], model, k=15)
    for i, q in enumerate(QUERIES):
        want = run_query(oidx, q, model, k=15)
        got = res[res.qid == str(i)]
        got_rows = list(
            zip(got.doc_id.tolist(), got.url.tolist(), got.score.tolist())
        )
        assert got_rows == want, f"query={q!r}"


def test_actor_engine_composite_indri(corpus, ray_session):
    # composite-Iop derived ctf must be summed ACROSS actors before scoring
    out, oidx, _ = corpus
    model = Indri(mu=700.0, lam=0.5)
    eng = SearchEngine(out, num_searchers=3)
    qs = ["#NEAR/2(w0001 w0003)", "#SYN(w0002 w0004)", "#WINDOW/6(w0001 w0005)"]
    res = eng.search_batch([(str(i), q) for i, q in enumerate(qs)], model, k=20)
    for i, q in enumerate(qs):
        want = run_query(oidx, q, model, k=20)
        got = res[res.qid == str(i)]
        got_rows = list(
            zip(got.doc_id.tolist(), got.url.tolist(), got.score.tolist())
        )
        assert got_rows == want, f"query={q!r}"


def test_resume_skips_existing_segments(corpus, ray_session):
    import ray.data

    out, _, stats = corpus
    tbl = synth_pages(n=240, seed=11, vocab=400)
    ds = ray.data.from_arrow(tbl.drop_columns(["html"]))
    stats2 = build_index(
        ds, out, docs_per_segment=40, dedup=True, keep_forward=False
    )
    assert stats2["n_docs"] == stats["n_docs"]
    assert stats2["n_segments"] == stats["n_segments"]


def test_dfs_phase_without_termstats_table(corpus, tmp_path_factory, ray_session):
    """termstats=False build: global df/ctf come from the query-time dfs
    phase (shard-local dictionary sums) and must be EXACTLY equivalent."""
    import ray.data

    from searchengines_ray.models import Indri

    tbl = synth_pages(n=240, seed=11, vocab=400)
    out = str(tmp_path_factory.mktemp("index_nots"))
    ds = ray.data.from_arrow(tbl.drop_columns(["html"]))
    build_index(
        ds, out, docs_per_segment=40, dedup=True, keep_forward=False,
        termstats=False,
    )
    _, oidx, _ = corpus
    for model in (BM25(), Indri(mu=777.0, lam=0.3)):
        eng = SearchEngine(out, num_searchers=0)
        res = eng.search_batch(
            [(str(i), q) for i, q in enumerate(QUERIES)], model, k=15
        )
        for i, q in enumerate(QUERIES):
            want = run_query(oidx, q, model, k=15)
            got = res[res.qid == str(i)]
            got_rows = list(
                zip(got.doc_id.tolist(), got.url.tolist(), got.score.tolist())
            )
            assert got_rows == want, f"model={model.name} query={q!r}"


def test_wand_exactly_matches_exhaustive(corpus):
    """Block-max WAND must return the EXACT exhaustive top-k (docids, urls,
    bit-equal scores, tie-break order) — it may only skip provably
    sub-threshold docs."""
    out, oidx, _ = corpus
    eng = SearchEngine(out, num_searchers=0)
    bow_queries = [
        ("a", "w0001 w0005 w0123"),
        ("b", "w0002"),
        ("c", "w0000 w0000 w0017"),
        ("d", "w0003 w0008 w0004 w0010 w0016"),
        ("e", "zzzznohit"),
    ]
    for model in (BM25(), BM25(k_1=0.9, b=0.4)):
        for k in (1, 5, 15, 50):
            exact = eng.search_batch(bow_queries, model, k=k)
            wand = eng.search_batch(bow_queries, model, k=k, use_wand=True)
            for qid, _ in bow_queries:
                a = exact[exact.qid == qid]
                w = wand[wand.qid == qid]
                assert a.url.tolist() == w.url.tolist(), (model, k, qid)
                assert a.score.tolist() == w.score.tolist(), (model, k, qid)


def test_partial_resume_rebuilds_only_missing_segment(
    tmp_path_factory, ray_session
):
    """Checkpointed resumability: wipe ONE segment; the rebuild rewrites only
    it (every other segment reports resumed=True via its manifest)."""
    import shutil

    import ray.data

    tbl = synth_pages(n=120, seed=31, vocab=200)
    out = str(tmp_path_factory.mktemp("resume"))
    ds = ray.data.from_arrow(tbl.drop_columns(["html"]))
    from searchengines_ray.index.shard import list_segments

    stats = build_index(ds, out, docs_per_segment=30, dedup=False)
    segments = list_segments(out)
    victim = segments[0]
    shutil.rmtree(f"{out}/segments/{victim}")
    ds2 = ray.data.from_arrow(tbl.drop_columns(["html"]))
    stats2 = build_index(ds2, out, docs_per_segment=30, dedup=False)
    assert list_segments(out) == segments
    assert stats2["n_docs"] == stats["n_docs"]
    import json
    import os

    resumed = 0
    for seg in segments:
        with open(f"{out}/segments/{seg}/MANIFEST.json") as f:
            m = json.load(f)
        assert m["n_docs"] > 0
        resumed += 0 if seg == victim else 1
    assert resumed == len(segments) - 1


def test_wand_auto_routing_matches_exhaustive(corpus):
    """use_wand='auto' must return results identical to exhaustive whether
    it routes a query through WAND (selective) or falls back (dense)."""
    out, oidx, _ = corpus
    eng = SearchEngine(out, num_searchers=0)
    queries = [
        ("dense", "w0000 w0001 w0002"),   # top-Zipf terms: df huge
        ("selective", "w0123 w0200"),      # tail terms
        ("single", "w0250"),
    ]
    exact = eng.search_batch(queries, BM25(), k=10)
    # count which queries actually route through WAND under 'auto'
    import searchengines_ray.query.wand as wand_mod

    calls = []
    orig = wand_mod.bm25_wand_topk

    def counting(bow, *a, **kw):
        calls.append(tuple(t for _, t in bow))
        return orig(bow, *a, **kw)

    wand_mod.bm25_wand_topk = counting
    try:
        auto = eng.search_batch(queries, BM25(), k=10, use_wand="auto")
    finally:
        wand_mod.bm25_wand_topk = orig
    wand_terms = {t for c in calls for t in c}
    # dense bag (top-Zipf terms) must FALL BACK; selective ones route WAND
    assert "w0000" not in wand_terms and "w0001" not in wand_terms
    assert "w0123" in wand_terms and "w0250" in wand_terms
    forced = eng.search_batch(queries, BM25(), k=10, use_wand=True)
    for qid, _ in queries:
        a = exact[exact.qid == qid]
        b = auto[auto.qid == qid]
        c = forced[forced.qid == qid]
        assert a.url.tolist() == b.url.tolist() == c.url.tolist(), qid
        assert a.score.tolist() == b.score.tolist() == c.score.tolist(), qid
    import pytest

    with pytest.raises(ValueError):
        eng.search_batch(queries[:1], BM25(), k=10, use_wand="Auto")


def test_merge_segments_bit_identical(corpus, tmp_path, ray_session):
    """Compacting segments must leave every model's ranked output
    bit-identical (scores float-equal, same order) and preserve global
    stats; only n_segments changes.  Also pins merge resume + repair."""
    import json
    import shutil

    from searchengines_ray.index.compact import (
        merge_plan,
        merge_segments,
        repair_merges,
    )
    from searchengines_ray.index.shard import list_segments

    out, oidx, stats = corpus
    merged_dir = str(tmp_path / "merged")
    shutil.copytree(out, merged_dir)
    before = list_segments(merged_dir)
    assert len(before) == 6  # 240 docs / 40 per segment
    qs = [(str(i), q) for i, q in enumerate(QUERIES)]
    eng0 = SearchEngine(out, num_searchers=0)
    base = [eng0.search_batch(qs, m, k=15) for m in MODELS[:3]]

    stats2 = merge_segments(merged_dir, target_docs=120)
    after = list_segments(merged_dir)
    assert len(after) == 2 and all(s.startswith("seg-m") for s in after)
    assert stats2["n_docs"] == stats["n_docs"]
    assert stats2["doc_count"] == stats["doc_count"]
    assert stats2["sum_field_len"] == stats["sum_field_len"]
    assert stats2["n_segments"] == 2

    eng1 = SearchEngine(merged_dir, num_searchers=0)
    for mi, m in enumerate(MODELS[:3]):
        got = eng1.search_batch(qs, m, k=15)
        want = base[mi]
        assert got.url.tolist() == want.url.tolist()
        assert got.score.tolist() == want.score.tolist()
        assert got.doc_id.tolist() == want.doc_id.tolist()

    # WAND exercises the recomputed block-max metadata
    bow = [(qid, q) for qid, q in qs if not q.startswith("#")]
    w0 = eng0.search_batch(bow, MODELS[0], k=10, use_wand=True)
    w1 = eng1.search_batch(bow, MODELS[0], k=10, use_wand=True)
    assert w0.url.tolist() == w1.url.tolist()
    assert w0.score.tolist() == w1.score.tolist()

    # merged manifests carry lineage; a rerun is a no-op
    seg_root = f"{merged_dir}/segments"
    m0 = json.load(open(f"{seg_root}/{after[0]}/MANIFEST.json"))
    assert len(m0["merged_from"]) == 3
    assert merge_plan(merged_dir, 120) == []

    # crash-window repair: resurrect a source dir, then repair removes it
    ghost = f"{seg_root}/{m0['merged_from'][0]}"
    shutil.copytree(f"{seg_root}/{after[0]}", ghost)
    assert repair_merges(merged_dir) == 1
    assert not __import__("os").path.exists(ghost)


def test_update_index_incremental(tmp_path_factory, ray_session):
    """Incremental add: half-then-half must equal a one-shot full build
    EXACTLY (same stats, bit-equal ranked output incl. global df/ctf via
    the rebuilt termstats), and must reject an analyzer mismatch."""
    import ray.data

    from searchengines_ray.analysis import AnalyzerConfig
    from searchengines_ray.index.build import update_index

    tbl = synth_pages(n=200, seed=17, vocab=300)
    half_a, half_b = tbl.slice(0, 120), tbl.slice(120)

    full_dir = str(tmp_path_factory.mktemp("idx_full"))
    stats_full = build_index(
        ray.data.from_arrow(tbl.drop_columns(["html"])),
        full_dir, docs_per_segment=30, dedup=False,
    )
    inc_dir = str(tmp_path_factory.mktemp("idx_inc"))
    build_index(
        ray.data.from_arrow(half_a.drop_columns(["html"])),
        inc_dir, docs_per_segment=30, dedup=False,
    )
    stats_inc = update_index(
        ray.data.from_arrow(half_b.drop_columns(["html"])),
        inc_dir, docs_per_segment=30,
    )
    assert stats_inc["n_docs"] == stats_full["n_docs"] == tbl.num_rows
    assert stats_inc["doc_count"] == stats_full["doc_count"]
    assert stats_inc["sum_field_len"] == stats_full["sum_field_len"]
    assert stats_inc["n_postings"] == stats_full["n_postings"]

    qs = [(str(i), q) for i, q in enumerate(QUERIES)]
    for m in (MODELS[0], MODELS[2]):
        a = SearchEngine(full_dir, num_searchers=0).search_batch(qs, m, k=15)
        b = SearchEngine(inc_dir, num_searchers=0).search_batch(qs, m, k=15)
        assert a.url.tolist() == b.url.tolist()
        assert a.score.tolist() == b.score.tolist()

    # idempotent: re-adding the same batch is a no-op
    stats_again = update_index(
        ray.data.from_arrow(half_b.drop_columns(["html"])),
        inc_dir, docs_per_segment=30, termstats=False,
    )
    assert stats_again["n_docs"] == tbl.num_rows
    assert stats_again["n_segments"] == stats_inc["n_segments"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="analyzer mismatch"):
        update_index(
            ray.data.from_arrow(half_b.drop_columns(["html"])), inc_dir,
            config=AnalyzerConfig(lowercase=True, stop=False, stem=False),
        )


def test_merge_commit_failure_preserves_sources(
    corpus, tmp_path, ray_session, monkeypatch
):
    """Round-4 ADVICE fix: if the merge's commit rename fails for any
    reason OTHER than a concurrent commit of the same segment, the error
    must propagate and the SOURCE segments must survive (previously the
    OSError was swallowed and the sources deleted -> silent postings
    loss)."""
    import shutil

    import pytest as _pytest

    from searchengines_ray.index import compact
    from searchengines_ray.index.shard import list_segments

    out, _, _ = corpus
    merged_dir = str(tmp_path / "failmerge")
    shutil.copytree(out, merged_dir)
    before = list_segments(merged_dir)
    group = before[:2]

    real_rename = compact.os.rename

    def bad_rename(src, dst):
        if "seg-m" in dst:
            raise OSError(13, "Permission denied (injected)")
        return real_rename(src, dst)

    monkeypatch.setattr(compact.os, "rename", bad_rename)
    with _pytest.raises(OSError):
        compact.merge_group(merged_dir, group)
    monkeypatch.undo()
    after = list_segments(merged_dir)
    assert after == before  # nothing deleted, nothing committed


def test_tombstone_then_purge_lifecycle(tmp_path_factory, ray_session):
    """Deletes: tombstoned serving == full serving with deleted docs
    filtered then re-truncated (scores unchanged — pre-delete stats),
    through both the in-process and WAND paths; purge: the rewritten
    index is bit-identical to a fresh build over the surviving corpus
    (results AND stats)."""
    import ray.data

    from searchengines_ray.index.build import doc_id_from_url
    from searchengines_ray.index.compact import delete_docs, purge_deleted
    from searchengines_ray.index.shard import load_tombstones

    tbl = synth_pages(n=200, seed=41, vocab=250, dup_frac=0.0)
    urls = tbl.column("url").to_pylist()
    all_ids = sorted(doc_id_from_url(u) for u in urls)
    dead = np.asarray(all_ids[::5], dtype=np.int64)  # every 5th doc

    tomb_dir = str(tmp_path_factory.mktemp("idx_tomb"))
    build_index(
        ray.data.from_arrow(tbl.drop_columns(["html"])),
        tomb_dir, docs_per_segment=40, dedup=False,
    )
    qs = [(str(i), q) for i, q in enumerate(QUERIES)]
    full = SearchEngine(tomb_dir, num_searchers=0).search_batch(
        qs, MODELS[0], k=None
    )

    assert delete_docs(tomb_dir, dead) == len(dead)
    assert delete_docs(tomb_dir, dead) == len(dead)  # idempotent re-add
    assert len(load_tombstones(tomb_dir)) == len(dead)
    tomb_eng = SearchEngine(tomb_dir, num_searchers=0)
    got = tomb_eng.search_batch(qs, MODELS[0], k=15)
    dead_set = set(int(d) for d in dead)
    want_rows = []
    for qid in got.qid.unique():  # search_batch emits input order
        sub = full[full.qid == qid]
        sub = sub[~sub.doc_id.isin(dead_set)].head(15)
        want_rows.extend(zip(sub.url.tolist(), sub.score.tolist()))
    assert list(zip(got.url.tolist(), got.score.tolist())) == want_rows

    # block-max WAND honors tombstones (bag-of-words query, forced WAND)
    bag = [("w", "w0001 w0002 w0003 w0004")]
    ex = tomb_eng.search_batch(bag, MODELS[0], k=10, use_wand=False)
    wd = tomb_eng.search_batch(bag, MODELS[0], k=10, use_wand=True)
    assert ex.url.tolist() == wd.url.tolist()
    assert ex.score.tolist() == wd.score.tolist()
    assert not any(d in dead_set for d in wd.doc_id.tolist())

    # actor path loads tombstones at startup
    act = SearchEngine(tomb_dir, num_searchers=2).search_batch(
        qs, MODELS[0], k=15
    )
    assert act.url.tolist() == got.url.tolist()

    # purge: bit-identical to a fresh build over the surviving corpus
    stats_p = purge_deleted(tomb_dir)
    assert len(load_tombstones(tomb_dir)) == 0
    keep_mask = [
        doc_id_from_url(u) not in dead_set for u in urls
    ]
    fresh_dir = str(tmp_path_factory.mktemp("idx_fresh"))
    stats_f = build_index(
        ray.data.from_arrow(
            tbl.drop_columns(["html"]).filter(pa.array(keep_mask))
        ),
        fresh_dir, docs_per_segment=40, dedup=False,
    )
    assert stats_p["n_docs"] == stats_f["n_docs"]
    assert stats_p["doc_count"] == stats_f["doc_count"]
    assert stats_p["sum_field_len"] == stats_f["sum_field_len"]
    assert stats_p["n_postings"] == stats_f["n_postings"]
    for m in (MODELS[0], MODELS[2]):
        a = SearchEngine(tomb_dir, num_searchers=0).search_batch(qs, m, k=15)
        b = SearchEngine(fresh_dir, num_searchers=0).search_batch(qs, m, k=15)
        assert a.url.tolist() == b.url.tolist()
        assert a.score.tolist() == b.score.tolist()


def test_purge_fully_tombstoned_segment(tmp_path_factory, ray_session):
    """Tombstoning EVERY doc of one segment and purging must drop that
    segment entirely (no empty-segment commit): n_segments and stats match
    a fresh build over the survivors, and serving still works."""
    import json

    import pyarrow.parquet as pq
    import ray.data

    from searchengines_ray.index.build import SEGMENT_DIR, doc_id_from_url
    from searchengines_ray.index.compact import delete_docs, purge_deleted
    from searchengines_ray.index.shard import list_segments

    tbl = synth_pages(n=150, seed=47, vocab=200, dup_frac=0.0)
    d = str(tmp_path_factory.mktemp("idx_fullseg"))
    build_index(
        ray.data.from_arrow(tbl.drop_columns(["html"])),
        d, docs_per_segment=30, dedup=False,
    )
    segs = list_segments(d)
    assert len(segs) >= 3
    victim = segs[0]
    dead = (
        pq.read_table(
            os.path.join(d, SEGMENT_DIR, victim, "docmeta.parquet"),
            columns=["doc_id"],
        )
        .column("doc_id")
        .to_numpy()
        .astype(np.int64)
    )
    delete_docs(d, dead)
    stats_p = purge_deleted(d)
    after = list_segments(d)
    assert victim not in after
    assert len(after) == len(segs) - 1  # dropped, not committed empty
    with open(os.path.join(d, "stats.json")) as f:
        assert json.load(f)["n_segments"] == len(after)

    dead_set = set(int(x) for x in dead)
    keep_mask = [
        doc_id_from_url(u) not in dead_set
        for u in tbl.column("url").to_pylist()
    ]
    fresh = str(tmp_path_factory.mktemp("idx_fullseg_fresh"))
    stats_f = build_index(
        ray.data.from_arrow(
            tbl.drop_columns(["html"]).filter(pa.array(keep_mask))
        ),
        fresh, docs_per_segment=30, dedup=False,
    )
    assert stats_p["n_docs"] == stats_f["n_docs"]
    assert stats_p["n_postings"] == stats_f["n_postings"]
    qs = [(str(i), q) for i, q in enumerate(QUERIES[:6])]
    a = SearchEngine(d, num_searchers=0).search_batch(qs, MODELS[0], k=10)
    b = SearchEngine(fresh, num_searchers=0).search_batch(qs, MODELS[0], k=10)
    assert a.url.tolist() == b.url.tolist()
    assert a.score.tolist() == b.score.tolist()


def test_delete_then_readd_undeletes(tmp_path_factory, ray_session):
    """Delete-then-re-add is the document-update idiom: update_index
    clears tombstones covering the appended ids, so the doc serves
    again (even when the re-added segment content-hash-resumes)."""
    import ray.data

    from searchengines_ray.index.build import (
        doc_id_from_url,
        update_index,
    )
    from searchengines_ray.index.compact import delete_docs
    from searchengines_ray.index.shard import load_tombstones

    tbl = synth_pages(n=120, seed=53, vocab=150, dup_frac=0.0)
    d = str(tmp_path_factory.mktemp("idx_readd"))
    build_index(
        ray.data.from_arrow(tbl.drop_columns(["html"])),
        d, docs_per_segment=30, dedup=False,
    )
    qs = [("0", "w0001 w0002")]
    full = SearchEngine(d, num_searchers=0).search_batch(
        qs, MODELS[0], k=5
    )
    victim_url = full.url.iloc[0]
    victim_id = doc_id_from_url(victim_url)
    delete_docs(d, [victim_id])
    after = SearchEngine(d, num_searchers=0).search_batch(
        qs, MODELS[0], k=5
    )
    assert victim_url not in after.url.tolist()

    # re-add the victim's page (identical content -> segment resume)
    idx = tbl.column("url").to_pylist().index(victim_url)
    update_index(
        ray.data.from_arrow(tbl.slice(idx, 1).drop_columns(["html"])),
        d, docs_per_segment=30,
    )
    assert len(load_tombstones(d)) == 0
    back = SearchEngine(d, num_searchers=0).search_batch(
        qs, MODELS[0], k=5
    )
    assert back.url.tolist() == full.url.tolist()
    assert back.score.tolist() == full.score.tolist()
