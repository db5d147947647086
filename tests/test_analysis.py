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
