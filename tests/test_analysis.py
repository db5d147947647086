from searchengines_ray.analysis import (
    AnalyzerConfig,
    SIMPLE_ANALYZER,
    derive_title,
    kstem_lite,
    tokenize,
    tokenize_positions,
)


def test_stopwords_occupy_positions():
    # field length includes stopword positions (Idx.java:93-98)
    toks = tokenize_positions("the cat sat on the mat")
    assert len(toks) == 6
    assert toks[0] is None and toks[3] is None and toks[4] is None
    assert toks[1] == "cat"


def test_hyphen_and_punct_split():
    assert tokenize("near-death") == ["near", "death"]
    assert tokenize("U.S.-based, too!") == ["u", "s", "base", "too"]


def test_numbers_kept():
    assert tokenize("route 66") == ["route", "66"]


def test_simple_analyzer_no_stem_no_stop():
    assert tokenize("the running dogs", SIMPLE_ANALYZER) == [
        "the",
        "running",
        "dogs",
    ]


def test_kstem_lite_rules():
    cases = {
        "dogs": "dog",
        "churches": "church",
        "boxes": "box",
        "ponies": "pony",
        "kiss": "kiss",
        "bus": "bus",
        "planned": "plan",
        "hoped": "hope",
        "studied": "study",
        "agreed": "agreed",  # -eed kept
        "running": "run",
        "hoping": "hope",
        "walking": "walk",
        "cat": "cat",  # too short
        "a1b2": "a1b2",  # non-alpha untouched
        # round-5 dictionary exceptions (the KStem head-word mechanism)
        "children": "child",
        "men": "man",  # shorter than the rule-cascade length guard
        "analyses": "analysis",
        "took": "take",
        "mobility": "mobile",  # protective correction over -bility
        "insurance": "insurance",  # protective identity over -ance
        # round-5 derivational families
        "capability": "capable",
        "abilities": "able",  # plural pass feeds the -bility family
        "flexibility": "flexible",
        "sensitivity": "sensitive",
        "formality": "formal",
        "quality": "quality",  # bare -ity never fires (city would -> c)
        "electricity": "electric",
        "existence": "exist",
        "occurrence": "occur",  # undoubled root
        "science": "science",  # length guard spares it
        "distance": "distance",  # root-length guard spares it
        "readable": "read",
        "reliable": "rely",  # i -> y mutation
        "valuable": "value",  # u -> ue restore
        "possible": "possible",  # tighter -ible guard spares it
        "accessible": "access",
    }
    for w, want in cases.items():
        assert kstem_lite(w) == want, (w, kstem_lite(w), want)


def test_stemmer_applied_in_tokenize():
    assert tokenize("running dogs") == ["run", "dog"]


def test_deterministic():
    s = "The Quick-Brown foxes were JUMPING over 2 lazy dogs."
    assert tokenize_positions(s) == tokenize_positions(s)


def test_derive_title():
    assert derive_title("first line\nrest of body") == "first line"
    assert derive_title("") == ""


def test_empty_text():
    assert tokenize_positions("") == []
    assert tokenize("...") == []


def test_arrow_batch_matches_scalar_tokenizer():
    import numpy as np
    import pyarrow as pa

    from searchengines_ray.analysis import (
        DEFAULT_ANALYZER,
        SIMPLE_ANALYZER,
        tokenize_arrow_batch,
        tokenize_positions,
    )

    texts = [
        "The Quick-Brown foxes were JUMPING over 2 lazy dogs.",
        "",
        None,
        "-x- the of and",
        "running DOGS and cats; studied hooves!",
        "a b c " * 50,
    ]
    for cfg in (DEFAULT_ANALYZER, SIMPLE_ANALYZER):
        parent, pos, sid, doclens, vocab = tokenize_arrow_batch(
            pa.array(texts, pa.string()), cfg
        )
        for i, t in enumerate(texts):
            want = tokenize_positions(t or "", cfg)
            assert doclens[i] == len(want), (i, cfg)
            got = [""] * len(want)
            m = parent == i
            for p, s in zip(pos[m], sid[m]):
                got[p] = vocab[s]
            want_filled = ["" if w is None else w for w in want]
            assert got == want_filled, (i, cfg, got, want_filled)
