"""Pin the DuckDB oracle building blocks against their python twins.

These are pure-DuckDB checks (no Ray): the SQL kstem_lite CTE chain, the
polynomial fingerprint/simhash folds, and the minhash shingle padding are
correctness-critical for 10+ driver oracles — a drifted rule would only
surface as a driver-gate hash mismatch, so fail fast here instead.
"""

import random
import string

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from searchengines_ray.analysis import kstem_lite
from searchengines_ray.stages.dedup import SimHasher, ngram_jaccard
from searchengines_ray.stages.text import Fingerprinter


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_sql_stemmer_matches_kstem_lite(con):
    rng = random.Random(99)
    sufs = [
        "", "s", "es", "ies", "ed", "ied", "eed", "ing", "ss", "us", "is",
        "ches", "xes", "zes", "hes", "tted", "nned", "lled", "ssed",
        "ting", "nning", "ying", "oing", "wing", "xing", "e", "ee",
        # round-4/5 derivational families
        "ness", "iness", "ment", "ically", "fully", "ily",
        "bility", "ibility", "ivity", "ality", "icity",
        "ence", "ance", "rrence", "able", "ible", "iable", "uable",
    ]
    words = set()
    # every dictionary exception (and their near-misses with a prefix)
    from searchengines_ray.analysis import KSTEM_EXCEPTIONS

    words.update(KSTEM_EXCEPTIONS)
    words.update("x" + k for k in KSTEM_EXCEPTIONS)
    for _ in range(3000):
        stem = "".join(
            rng.choice(string.ascii_lowercase)
            for _ in range(rng.randint(1, 6))
        )
        if rng.random() < 0.15:
            stem += rng.choice(string.digits)
        words.add(stem + rng.choice(sufs))
    words = sorted(words)
    con.register(
        "stem_in", pd.DataFrame({"doc_id": range(len(words)), "w": words})
    )
    sql = (
        "WITH "
        + entrymod._sql_stem_ctes("stem_in")
        + " SELECT doc_id, term FROM stemmed ORDER BY doc_id"
    )
    got = con.sql(sql).df()
    for i, w in enumerate(words):
        assert got["term"].iloc[i] == kstem_lite(w), w


def test_sql_fingerprint_matches_engine(con):
    texts = [
        "", "one", "one two", "one two three four five",
        "Repeated repeated words words words", "digits 123 mix3d",
        "the and of to stopwords still count here",
    ]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("documents", docs)
    got = con.sql(entrymod.oracle_sql()["fingerprints"]).df()
    fp = Fingerprinter()
    for i, t in enumerate(texts):
        assert int(got["fingerprint"].iloc[i]) == fp.fingerprint(t), t
        assert int(got["content_hash"].iloc[i]) == fp.content_hash(t), t
    con.unregister("documents")


def test_sql_simhash_matches_engine(con):
    texts = [
        "", "hello world", "repeat repeat repeat xyz",
        "Der Hund und die Katze", "a b c d e f",
    ]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("documents", docs)
    # extract the per-doc simhash from the pair oracle's CTE chain
    sql = entrymod.oracle_sql()["simhash_pairs"]
    probe = sql[: sql.index("SELECT a.doc_id AS doc_a")] + (
        "SELECT doc_id, simhash FROM allsh ORDER BY doc_id"
    )
    got = con.sql(probe).df()
    sh = SimHasher()
    for i, t in enumerate(texts):
        assert int(got["simhash"].iloc[i]) == sh.simhash(t), t
    con.unregister("documents")


def test_sql_minhash_padding_matches_engine(con):
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["", "", "one", "one two", "alpha beta gamma delta"],
        }
    )
    con.register("documents", docs)
    got = con.sql(entrymod.oracle_sql()["minhash_pairs"]).df()
    # only the two empty docs pair (padding shingle), jaccard exactly 1.0
    assert got[["doc_a", "doc_b"]].values.tolist() == [[0, 1]]
    assert float(got["jaccard_r"].iloc[0]) == 1.0
    assert ngram_jaccard("", "", 3) == 1.0
    con.unregister("documents")


def test_shingle_pairs_template_anchor():
    # the parameterized source rewrite must never silently no-op
    out = entrymod._shingle_pairs_sql("somesrc")
    assert "FROM somesrc" in out
    with pytest.raises(AssertionError):
        # simulate template drift
        orig = entrymod._SHINGLE_PAIRS
        entrymod._SHINGLE_PAIRS = orig.replace("FROM documents", "FROM docs2")
        try:
            entrymod._shingle_pairs_sql("somesrc")
        finally:
            entrymod._SHINGLE_PAIRS = orig


def test_bpe_oracle_survives_merge_exhaustion(con):
    """When the pair vocabulary exhausts before num_merges rounds, the
    unrolled oracle must carry words through the dead rounds (an empty
    b{t} used to cross-join the fold seed to empty, cascading spl{t..k}
    to empty and reporting n_subwords=0 for every doc)."""
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["ab ab ab", "ab ab"]}
    )
    c = duckdb.connect()
    c.register("documents", docs)
    # round 1 merges (a,b); rounds 2..5 find no pairs
    merges = c.execute(entrymod._bpe_sql(5)).df()
    assert merges["merge_rank"].tolist() == [1]
    assert merges.iloc[0]["lhs"] == "a" and merges.iloc[0]["rhs"] == "b"
    seg = c.execute(entrymod._bpe_apply_sql(5)).df()
    assert seg["n_subwords"].tolist() == [3, 2]
    assert seg["n_words"].tolist() == [3, 2]
