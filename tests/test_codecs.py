"""Posting-codec contract: every codec round-trips bit-exactly, and an
index built under any codec serves IDENTICAL results (the codec is a
storage property, never a semantics property).

The north rule names "delta-encoded docID gaps + varint/PForDelta
blocks" — `vb` is LEB128 varint, `pfor` is NewPFD-style patched
frame-of-reference, `bw` the original byte-width blocks, `ef`
Elias-Fano (Vigna 2013, quasi-succinct indices)."""

import json
import os

import numpy as np
import pytest

from searchengines_ray.index import encode
from searchengines_ray.index.build import build_index, update_index
from searchengines_ray.index.compact import merge_segments
from searchengines_ray.index.shard import list_segments
from searchengines_ray.models import BM25
from searchengines_ray.query.engine import SearchEngine
from searchengines_ray.sources.pages import synth_pages

QUERIES = [
    ("0", "w0001 w0002 w0003"),
    ("1", "#NEAR/3(w0004 w0005)"),
    ("2", "#SYN(w0001 w0007) w0002"),
    ("3", "the w0000"),
]


def _fuzz_arrays():
    rng = np.random.default_rng(20260818)
    out = [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([2**63], dtype=np.uint64),
        np.zeros(129, dtype=np.uint64),
        np.arange(128, dtype=np.uint64),
        np.arange(1, 130, dtype=np.uint64) * np.uint64(2**33),
    ]
    for n in (2, 127, 128, 129, 1000):
        small = rng.integers(0, 100, n).astype(np.uint64)
        out.append(small)
        # deterministic heavy tail: every 13th value is huge (exercises
        # pfor exceptions and multi-byte varints inside small-value runs)
        tail = small.copy()
        tail[::13] = np.uint64(2**45) + np.arange(
            len(tail[::13]), dtype=np.uint64
        )
        out.append(tail)
    return out


@pytest.mark.parametrize("codec", encode.CODECS)
def test_values_roundtrip(codec):
    for arr in _fuzz_arrays():
        buf = encode.encode_values(arr, codec)
        got = encode.decode_values(buf, codec)
        assert got.dtype == np.uint64
        assert np.array_equal(got, arr), codec


@pytest.mark.parametrize("codec", encode.CODECS)
def test_docids_roundtrip(codec):
    for arr in _fuzz_arrays():
        ids = np.cumsum(arr.astype(np.uint64) % np.uint64(2**40) + np.uint64(1))
        buf = encode.encode_doc_ids(ids, codec)
        got = encode.decode_doc_ids(buf, codec)
        assert np.array_equal(got, ids), codec


def test_compressed_codecs_beat_bytewidth_on_small_gaps():
    rng = np.random.default_rng(3)
    ids = np.cumsum(rng.integers(1, 120, 4096)).astype(np.uint64)
    sizes = {
        c: len(encode.encode_doc_ids(ids, c)) for c in encode.CODECS
    }
    assert sizes["vb"] <= sizes["bw"]
    assert sizes["pfor"] <= sizes["vb"]
    # ef's 2 + log2(u/m) bits/value bound beats byte-aligned varints on
    # low-entropy value streams (tfs are overwhelmingly 1-4)
    tfs = np.random.default_rng(7).integers(1, 5, 4096).astype(np.uint64)
    vsizes = {c: len(encode.encode_values(tfs, c)) for c in encode.CODECS}
    assert vsizes["ef"] <= vsizes["vb"]


@pytest.fixture(scope="module")
def codec_indexes(tmp_path_factory, ray_session):
    import ray.data

    tbl = synth_pages(n=160, seed=23, vocab=120, dup_frac=0.0).drop_columns(
        ["html"]
    )
    dirs = {}
    for codec in encode.CODECS:
        out = str(tmp_path_factory.mktemp(f"idx_{codec}"))
        build_index(
            ray.data.from_arrow(tbl),
            out,
            docs_per_segment=40,
            dedup=False,
            termstats=False,
            codec=codec,
        )
        dirs[codec] = out
    return dirs


def test_serving_is_codec_independent(codec_indexes):
    frames = {}
    for codec, d in codec_indexes.items():
        eng = SearchEngine(d, num_searchers=0)
        frames[codec] = eng.search_batch(QUERIES, BM25(), k=12).reset_index(
            drop=True
        )
    base = frames["bw"]
    for codec in ("vb", "pfor", "ef"):
        assert frames[codec].equals(base), codec


def test_codec_stamped_in_manifests(codec_indexes):
    for codec, d in codec_indexes.items():
        with open(os.path.join(d, "stats.json")) as f:
            assert json.load(f)["codec"] == codec
        for seg in list_segments(d):
            with open(
                os.path.join(d, "segments", seg, "MANIFEST.json")
            ) as f:
                assert json.load(f)["codec"] == codec


def test_compaction_preserves_codec_and_results(codec_indexes):
    d = codec_indexes["pfor"]
    eng_before = SearchEngine(d, num_searchers=0)
    before = eng_before.search_batch(QUERIES, BM25(), k=12).reset_index(
        drop=True
    )
    merge_segments(d, target_docs=1000)
    segs = list_segments(d)
    assert len(segs) == 1
    with open(os.path.join(d, "segments", segs[0], "MANIFEST.json")) as f:
        assert json.load(f)["codec"] == "pfor"
    after = SearchEngine(d, num_searchers=0).search_batch(
        QUERIES, BM25(), k=12
    ).reset_index(drop=True)
    assert after.equals(before)


def test_incremental_append_inherits_codec(codec_indexes, ray_session):
    import ray.data

    import pyarrow as pa

    d = codec_indexes["vb"]
    extra = synth_pages(n=60, seed=91, vocab=120, dup_frac=0.0).drop_columns(
        ["html"]
    )
    # synth urls are seed-independent — remap so the appended docs are new
    extra = extra.set_column(
        extra.schema.get_field_index("url"),
        "url",
        pa.array(
            [f"https://synth.test/extra/{i:06d}" for i in range(extra.num_rows)]
        ),
    )
    update_index(ray.data.from_arrow(extra), d, termstats=False)
    codecs = set()
    for seg in list_segments(d):
        with open(os.path.join(d, "segments", seg, "MANIFEST.json")) as f:
            codecs.add(json.load(f)["codec"])
    assert codecs == {"vb"}
