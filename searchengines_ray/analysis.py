"""Text analysis: tokenization, stopwords, stemming.

This is the single most important byte-level contract in the engine: the exact
same pure functions run at index-build time (inside Ray ``map_batches`` tasks)
and at query-parse time (driver side), and in the single-process test oracle.

Reference semantics (``/root/reference/QryEval/QryParser.java:40-49,428-445``):
lowercase -> English stopword removal -> Krovetz (KSTEM) stemming, via Lucene's
``EnglishAnalyzerConfigurable``.  That class ships in the course Lucene jar and
is not present in the reference repo, and the Lucene index itself is absent, so
byte-fidelity to Lucene is untestable here.  Per SURVEY.md §5.2 / §7.5 we
therefore *pin* our own deterministic analyzer as the frozen contract:

- **Word splitting**: runs of ``[0-9a-z]`` after NFC-agnostic ``str.lower()``.
  This splits hyphenated tokens (``near-death`` -> ``near``, ``death``) exactly
  like the reference's query parser expects
  (``/root/reference/QryEval/QryParser.java:168-171``), and splits possessives.
- **Stopwords**: Lucene's classic 33-word English stop set (the default of
  ``EnglishAnalyzer``).  Removed terms still OCCUPY POSITIONS: field length
  includes stopword positions and #NEAR/#WINDOW distances count them
  (``/root/reference/QryEval/Idx.java:93-98``,
  ``/root/reference/QryEval/TermVector.java:16-20`` — stem index 0 = stopword).
- **Stemmer**: ``kstem_lite`` — a frozen, rule-only Krovetz-style stemmer
  (plural / past-tense / -ing removal with undoubling, no dictionary).
  Deviation from Lucene KStem is documented and accepted; determinism and
  oracle/pipeline self-consistency are the testable properties.

Everything here is pure Python + ``re`` — no Ray, no global mutable state —
so that the functions pickle cheaply into Ray tasks and behave identically
everywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

# Lucene's classic English stop set (EnglishAnalyzer / StandardAnalyzer
# default, 33 words) — the stop list the reference's analyzer uses.
LUCENE_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_WORD_RE = re.compile(r"[0-9a-z]+")

# ASCII-only lowercase (A-Z -> a-z, everything else untouched).  Pinned over
# full Unicode case mapping: the token class is ASCII, and full mappings
# diverge between engines on exotic codepoints (e.g. U+0130 'İ' lowers to
# 'i' + combining dot in Python but a single 'i' variant in Arrow) — the
# ascii rule makes the scalar and vectorized paths byte-identical.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

# The reference's hard-coded field whitelist
# (/root/reference/QryEval/QryParser.java:157-165).
FIELDS = ("body", "title", "url", "keywords", "inlink")
DEFAULT_FIELD = "body"


@dataclass(frozen=True)
class AnalyzerConfig:
    """Pinned analyzer configuration.

    ``stem=False, stop=False`` gives the "simple" analyzer used by the
    SQL-checkable pipeline variants (DuckDB can replicate regex split +
    lowercase, but not the stemmer).
    """

    lowercase: bool = True
    stop: bool = True
    stem: bool = True


DEFAULT_ANALYZER = AnalyzerConfig()
SIMPLE_ANALYZER = AnalyzerConfig(stop=False, stem=False)

_VOWELS = "aeiou"


def _undouble(stem: str) -> str:
    """Undouble a final doubled consonant (planned -> plan), sparing l/s/z."""
    if (
        len(stem) >= 3
        and stem[-1] == stem[-2]
        and stem[-1] not in _VOWELS
        and stem[-1] not in "lsz"
    ):
        return stem[:-1]
    return stem


# Dictionary-exception table (the KStem head-word-dictionary MECHANISM
# from Krovetz 1993 / Lucene KStem, with a deterministic public subset of
# entries instead of Lucene's ~30k-word dictionary): applied before the
# rule cascade, an exact hit short-circuits every rule.  Two entry kinds:
# irregular English forms the suffix rules cannot derive, and protective
# identities for roots the round-5 derivational families would mangle.
# The SQL oracle generates its exception CASE from THIS dict
# (_sql_stem_ctes in __ray_entry__.py) — one source of truth.
KSTEM_EXCEPTIONS: dict[str, str] = {
    # irregular plurals
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "lice": "louse",
    "oxen": "ox", "brethren": "brother", "indices": "index",
    "matrices": "matrix", "vertices": "vertex", "appendices": "appendix",
    "crises": "crisis", "analyses": "analysis", "theses": "thesis",
    "hypotheses": "hypothesis", "phenomena": "phenomenon",
    "criteria": "criterion",
    # irregular past / participle
    "went": "go", "gone": "go", "did": "do", "made": "make", "said": "say",
    "told": "tell", "sold": "sell", "bought": "buy", "brought": "bring",
    "thought": "think", "taught": "teach", "caught": "catch",
    "sought": "seek", "fought": "fight", "found": "find", "held": "hold",
    "kept": "keep", "met": "meet", "paid": "pay", "sent": "send",
    "spent": "spend", "built": "build", "lost": "lose", "meant": "mean",
    "felt": "feel", "slept": "sleep", "stood": "stand",
    "understood": "understand", "wrote": "write", "written": "write",
    "spoke": "speak", "spoken": "speak", "broke": "break",
    "broken": "break", "chose": "choose", "chosen": "choose",
    "drove": "drive", "driven": "drive", "ate": "eat", "eaten": "eat",
    "fell": "fall", "fallen": "fall", "gave": "give", "given": "give",
    "grew": "grow", "grown": "grow", "knew": "know", "known": "know",
    "threw": "throw", "thrown": "throw", "took": "take", "taken": "take",
    "saw": "see", "seen": "see", "ran": "run", "came": "come",
    "began": "begin", "begun": "begin", "sang": "sing", "sung": "sing",
    "drank": "drink", "drunk": "drink", "swam": "swim", "wore": "wear",
    "worn": "wear", "tore": "tear", "torn": "tear", "rode": "ride",
    "ridden": "ride", "rose": "rise", "risen": "rise", "flew": "fly",
    "flown": "fly", "drew": "draw", "drawn": "draw", "heard": "hear",
    # protective identities / corrections for the derivational families
    "insurance": "insurance", "substance": "substance",
    "experience": "experience", "influence": "influence",
    "maintenance": "maintenance", "mobility": "mobile",
    "simplicity": "simple",
}


@lru_cache(maxsize=65536)
def kstem_lite(w: str) -> str:
    """Frozen rule-only Krovetz-style stemmer.

    Order of rules mirrors Krovetz's morphology passes (dictionary
    exceptions -> plural -> past -> present participle -> derivational
    families), with :data:`KSTEM_EXCEPTIONS` standing in for the head-word
    dictionary.  Purely deterministic; shared verbatim by the oracle and
    every Ray stage.
    """
    exc = KSTEM_EXCEPTIONS.get(w)
    if exc is not None:
        return exc
    if len(w) <= 3 or not w.isalpha():
        return w
    # --- plurals ---
    if w.endswith("ies") and len(w) > 4:
        w = w[:-3] + "y"
    elif w.endswith("es") and len(w) > 4 and w[-3] in "sxzh":
        # churches -> church, boxes -> box, kisses -> kiss(es->'' then ss kept)
        w = w[:-2]
    elif w.endswith("s") and not w.endswith(("ss", "us", "is")):
        w = w[:-1]
    if len(w) <= 3:
        return w
    # --- past tense ---
    if w.endswith("ied") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("eed"):
        return w
    if w.endswith("ed") and len(w) > 4:
        stem = w[:-2]
        stem = _undouble(stem)
        # hoped -> hope: restore 'e' when the stem ends consonant-'e' pattern
        # is unrecoverable without a dictionary; frozen rule: restore 'e' when
        # stem ends in a non-vowel preceded by a vowel preceded by a non-vowel
        # and the stem is short (CVC heuristic).
        if (
            len(stem) >= 2
            and stem == w[:-2]  # was not undoubled
            and stem[-1] not in _VOWELS
            and stem[-1] not in "wxy"
            and len(stem) >= 3
            and stem[-2] in _VOWELS
            and stem[-3] not in _VOWELS
            and len(stem) <= 4
        ):
            return stem + "e"
        return stem
    # --- present participle ---
    if w.endswith("ing") and len(w) > 5:
        stem = w[:-3]
        stem2 = _undouble(stem)
        if stem2 != stem:
            return stem2
        if (
            len(stem) >= 3
            and stem[-1] not in _VOWELS
            and stem[-1] not in "wxy"
            and stem[-2] in _VOWELS
            and stem[-3] not in _VOWELS
            and len(stem) <= 4
        ):
            return stem + "e"
        return stem
    # --- derivational endings (Krovetz 1993 / Lucene KStem rule families
    # ness/ment/ly, FIRST-CANDIDATE resolution: KStem accepts a candidate
    # only if its head-word dictionary contains it; with no dictionary we
    # take the rule's first candidate unconditionally.  Only the
    # low-over-stemming members are enabled (-ly alone would map
    # family->famy, so only the suffix-specific -ically/-ily/-fully
    # variants run).  Documented deviation, self-consistent everywhere. ---
    if w.endswith("ness") and len(w) > 5:
        stem = w[:-4]
        if stem.endswith("i"):
            stem = stem[:-1] + "y"
        return stem
    if w.endswith("ment") and len(w) > 7:
        return w[:-4]
    if w.endswith("ically") and len(w) > 7:
        return w[:-4]
    if w.endswith("fully") and len(w) > 6:
        return w[:-2]
    if w.endswith("ily") and len(w) > 6:
        # len > 6 spares roots whose 'il' is not the y->i mutation
        # ("family", "easily" stay; "happily" -> "happy")
        return w[:-3] + "y"
    # --- round-5 families: -ity (bility/ivity/ality/icity sub-rules only
    # — bare -ity would map city->c), -ence/-ance, -able/-ible.  Same
    # first-candidate resolution and the same low-over-stemming stance as
    # the -ly family above; KSTEM_EXCEPTIONS patches the known casualties
    # (mobility, simplicity, insurance, ...). ---
    if w.endswith("bility") and len(w) > 6:
        # capability -> capable, flexibility -> flexible, ability -> able
        return w[:-6] + "ble"
    if w.endswith("ivity") and len(w) > 7:
        return w[:-3] + "e"  # sensitivity -> sensitive
    if w.endswith("ality") and len(w) > 7:
        return w[:-3]  # formality -> formal ("quality"/"reality" spared)
    if w.endswith("icity") and len(w) > 7:
        return w[:-3]  # electricity -> electric
    if (w.endswith("ence") or w.endswith("ance")) and len(w) >= 9:
        # existence -> exist, acceptance -> accept; the root-length >= 5
        # guard (len >= 9) spares distance/audience/sentence/science;
        # undouble handles occurrence -> occur
        return _undouble(w[:-4])
    if (
        (w.endswith("able") and len(w) > 7)
        or (w.endswith("ible") and len(w) > 8)
    ):
        # readable -> read, accessible -> access; the tighter -ible guard
        # spares possible/sensible/terrible
        stem = w[:-4]
        if stem.endswith("i"):
            return stem[:-1] + "y"  # reliable -> rely
        if stem.endswith("u"):
            return stem + "e"  # valuable -> value
        return stem
    return w


def tokenize_positions(
    text: str, config: AnalyzerConfig = DEFAULT_ANALYZER
) -> list[str | None]:
    """Tokenize ``text`` into a position-preserving term list.

    Returns one slot per raw word token; stopword slots hold ``None`` (they
    occupy a position — field length and #NEAR distances include them, matching
    ``/root/reference/QryEval/Idx.java:93-98``).  Surviving slots hold the
    (optionally stemmed) term.
    """
    if not text:
        return []
    if config.lowercase:
        text = text.translate(_ASCII_LOWER)
    words = _WORD_RE.findall(text)  # ordinal positions == list index
    stop = LUCENE_STOPWORDS if config.stop else ()
    if config.stem:
        ks = kstem_lite
        return [None if w in stop else ks(w) for w in words]
    return [None if w in stop else w for w in words]


def tokenize(text: str, config: AnalyzerConfig = DEFAULT_ANALYZER) -> list[str]:
    """Tokenize dropping stopword slots — the reference's ``tokenizeString``
    (``/root/reference/QryEval/QryParser.java:428-445``): used for query terms.
    """
    return [t for t in tokenize_positions(text, config) if t is not None]


def tokenize_arrow_batch(texts, config: AnalyzerConfig = DEFAULT_ANALYZER):
    """Vectorized :func:`tokenize_positions` over an Arrow string column.

    The hot path of the index build: splitting/lowercasing run as Arrow C++
    kernels; Python only touches the per-batch UNIQUE vocabulary (stemming +
    stopword mapping), so per-token object churn disappears.  Semantics are
    pinned to be IDENTICAL to tokenize_positions (same regex class, stopwords
    occupy positions, '' split artifacts are not positions).

    Returns ``(parent, pos, sid, doclens, vocab)``:
      parent  int64[n_tok]  doc row index per surviving (non-stop) token
      pos     int32[n_tok]  ordinal position (stopword slots counted)
      sid     int64[n_tok]  stemmed-term id into ``vocab``
      doclens int64[n_docs] positions per doc INCLUDING stopword slots
      vocab   list[str]     stemmed terms indexed by sid
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    if n == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int32),
            np.empty(0, np.int64),
            np.zeros(0, np.int64),
            [],
        )
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.ascii_lower(texts) if config.lowercase else texts
    toks = pc.split_pattern_regex(low, pattern="[^0-9a-z]+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.fill_null(pc.not_equal(flat, ""), False).to_numpy(
        zero_copy_only=False
    )
    uniq = pc.unique(flat)
    vids = pc.index_in(flat, value_set=uniq)
    vids = pc.fill_null(vids, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    parent = parent[nonempty]
    vids = vids[nonempty]
    doclens = np.bincount(parent, minlength=n).astype(np.int64)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(doclens, out=starts[1:])
    pos = (np.arange(len(parent), dtype=np.int64) - starts[parent]).astype(
        np.int32
    )
    # vocabulary-level stop/stem mapping (tiny relative to the token stream)
    vocab_raw = uniq.to_pylist()
    stem_vocab: list[str] = []
    stem_index: dict[str, int] = {}
    map_arr = np.empty(len(vocab_raw), dtype=np.int64)
    stop = LUCENE_STOPWORDS if config.stop else ()
    stem = config.stem
    for vi, w in enumerate(vocab_raw):
        if not w or w in stop:
            map_arr[vi] = -1
            continue
        t = kstem_lite(w) if stem else w
        j = stem_index.get(t)
        if j is None:
            j = stem_index[t] = len(stem_vocab)
            stem_vocab.append(t)
        map_arr[vi] = j
    sids = map_arr[vids]
    keep = sids >= 0
    return parent[keep], pos[keep], sids[keep], doclens, stem_vocab


def derive_title(text: str) -> str:
    """Derived ``title`` field: first line of the extracted text (frozen rule,
    SURVEY.md §1.5)."""
    if not text:
        return ""
    return text.split("\n", 1)[0]


def url_field_text(url: str) -> str:
    """Derived ``url`` field: the url itself; tokenization splits it on
    non-alphanumerics (scheme/host/path become terms)."""
    return url or ""
