"""Reference-compatible file formats (SURVEY.md §2.1 S1-S9).

Readers/writers for the reference's text formats: param files, query files,
qrels, intents, trec rankings, trec output (incl. the zero-hit dummyRecord
row), expansion-query files, SVMlight feature vectors.

Float formatting note: the reference writes Java ``Double.toString`` values
(shortest round-trip decimal).  Python's ``repr(float)`` is also shortest
round-trip but the two algorithms disagree on a small set of values; we pin
Python ``repr`` and document the deviation (semantic equality preserved —
values round-trip to the identical double).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import pandas as pd


def fmt_double(x: float) -> str:
    """Java Double.toString-alike: shortest round-trip; integral values get a
    trailing .0 (Java prints 5.0, Python repr(5.0) == '5.0' too)."""
    return repr(float(x))


# ---------------------------------------------------------------- S1: params


def read_params(path: str) -> dict[str, str]:
    """``key=value`` lines (``QryEval.java:1515-1552``)."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            k, _, v = line.partition("=")
            out[k.strip()] = v.strip()
    return out


def validate_params(params: dict[str, str], required=()) -> None:
    missing = [k for k in required if k not in params]
    if missing:
        raise ValueError(f"Missing required parameters: {missing}")


# ------------------------------------------------------------- S3: query file


def read_query_file(path: str) -> list[tuple[str, str]]:
    """Lines ``qid:querytext`` in file order (``QryEval.java:1377-1386``)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            qid, _, text = line.partition(":")
            out.append((qid.strip(), text.strip()))
    return out


# --------------------------------------------------------------- S4: intents


def read_intents(path: str) -> "OrderedDict[str, list[str]]":
    """Lines ``qid.intent:text``; 1-based intent list per qid, padded with ""
    (``QryEval.java:306-338``).  Returned lists use index 0 as padding to
    mirror the reference's 1-based indexing."""
    out: OrderedDict[str, list[str]] = OrderedDict()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            head, _, text = line.partition(":")
            qid, _, intent = head.partition(".")
            n = int(intent)
            lst = out.setdefault(qid, [""])
            while len(lst) <= n:
                lst.append("")
            lst[n] = text.strip()
    return out


# ----------------------------------------------------------------- S6: qrels


def read_qrels(path: str) -> "OrderedDict[str, list[tuple[int, str]]]":
    """``qid 0 externalDocid rel``; rel == -2 coerced to 0
    (``QryEval.java:520-529``).  Returns qid -> [(rel, external_id)] in file
    order."""
    out: OrderedDict[str, list[tuple[int, str]]] = OrderedDict()
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            qid, _, extid, rel = parts[0], parts[1], parts[2], int(parts[3])
            if rel == -2:
                rel = 0
            out.setdefault(qid, []).append((rel, extid))
    return out


# ------------------------------------------------------ S5: trec ranking read


def read_trec_ranking(
    path: str,
) -> "OrderedDict[str, list[tuple[str, float]]]":
    """``qid Q0 extid rank score runid`` -> qid -> [(extid, score)] in rank
    order; diversity inputs use ``qid.intent`` keys which are preserved
    verbatim (``QryEval.java:247-305,1333-1368``)."""
    out: OrderedDict[str, list[tuple[str, float]]] = OrderedDict()
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            qid, extid, score = parts[0], parts[2], float(parts[4])
            out.setdefault(qid, []).append((extid, score))
    return out


# ----------------------------------------------------------- S7: trec writer


def trec_lines(
    qid: str, ranking: list[tuple[str, float]], run_id: str = "?"
) -> list[str]:
    """``qid Q0 externalDocid rank score runid``; zero-hit queries emit the
    dummyRecord row (``QryEval.java:1442-1467``)."""
    if not ranking:
        return [f"{qid} Q0 dummyRecord 1 0 {run_id}"]
    return [
        f"{qid} Q0 {extid} {rank} {fmt_double(score)} {run_id}"
        for rank, (extid, score) in enumerate(ranking, 1)
    ]


def write_trec(
    results: "OrderedDict[str, list[tuple[str, float]]]",
    path: str,
    run_id: str = "?",
    append: bool = False,
) -> None:
    with open(path, "a" if append else "w") as f:
        for qid, ranking in results.items():
            for line in trec_lines(qid, ranking, run_id):
                f.write(line + "\n")


def results_df_to_trec(df: pd.DataFrame, path: str, all_qids=None) -> None:
    """Write a SearchEngine results DataFrame (qid, url, score, rank) as a
    trec file; ``all_qids`` supplies zero-hit qids needing dummy rows."""
    grouped: OrderedDict[str, list[tuple[str, float]]] = OrderedDict()
    for qid in all_qids if all_qids is not None else df["qid"].unique():
        sub = df[df["qid"] == qid].sort_values("rank")
        grouped[qid] = list(zip(sub["url"], sub["score"]))
    write_trec(grouped, path)


# ----------------------------------------- S8: expansion-query (.qryOut) file


def expansion_query_line(qid: str, terms: list[tuple[str, float]]) -> str:
    """``qid: #WAND (w_n t_n ... w_1 t_1 )`` — note REVERSED (ascending
    score) emission order (``QryEval.java:1188-1201``).  ``terms`` is the
    score-descending expansion list."""
    parts = []
    for term, score in reversed(terms):
        parts.append(fmt_double(score))
        parts.append(term)
    return f"{qid}: #WAND (" + " ".join(parts) + " )"


# ----------------------------------------------- S9: SVMlight feature vectors


def feature_vector_line(
    rel: int,
    qid: str,
    features: dict[int, Optional[float]],
    external_id: str,
    for_svm: bool,
    last_feature: int = 21,
    disabled: frozenset = frozenset(),
) -> str:
    """``rel qid:QID i:v ... # extid``; SVM mode omits null features, RankLib
    mode writes ``i:0`` (``FeatureVectorFileLine.java:21-63``)."""
    parts = [f"{rel} qid:{qid} "]
    for i in range(1, last_feature):
        if i in disabled:
            continue
        v = features.get(i)
        if for_svm:
            if v is not None:
                parts.append(f"{i}:{fmt_double(v)} ")
        else:
            parts.append(f"{i}:{fmt_double(v) if v is not None else '0'} ")
    parts.append(f"# {external_id}")
    return "".join(parts)


def read_feature_vectors(path: str) -> list[tuple[int, str, dict, str]]:
    """Parse an SVMlight/RankLib feature file back to
    ``(rel, qid, {feature_id: value}, external_id)`` rows — the inverse of
    :func:`feature_vector_line`, closing the write -> external trainer ->
    read loop the reference drives through files
    (``FeatureVectorFileLine.java:21-63``, ``QryEval.java:977-1023``)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            body, _, extid = line.partition("#")
            toks = body.split()
            if not toks[1].startswith("qid:"):
                raise ValueError(f"malformed feature line: {line!r}")
            feats = {}
            for t in toks[2:]:
                i, _, v = t.partition(":")
                feats[int(i)] = float(v)
            out.append((int(toks[0]), toks[1][4:], feats, extid.strip()))
    return out


def jsonl_roundtrip(ds, out_dir: str):
    """Write a Dataset as line-delimited JSON shards and read it back —
    the JSONL ingest path every crawl/LLM-corpus pipeline starts from
    (one file per block, so a 100-TB export stays partitioned and a
    failed run resumes per shard).  Returns the re-read Dataset; the
    caller pins fidelity by hashing content on both sides (escape
    round-trips — newlines, quotes, unicode — are exactly what this
    surface can silently corrupt)."""
    import shutil

    import ray.data

    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_json(out_dir)
    return ray.data.read_json(out_dir)


def csv_roundtrip(ds, out_dir: str, column_types: Optional[dict] = None):
    """Write a Dataset as CSV shards and read it back through the Arrow
    CSV reader with ``newlines_in_values`` enabled (quoted embedded
    newlines are legal CSV and the default reader rejects them) and
    explicit ``column_types`` so an all-digits text shard cannot be
    silently re-inferred as integers."""
    import shutil

    import pyarrow as pa
    from pyarrow import csv as pacsv

    import ray.data

    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_csv(out_dir)
    if column_types is None:
        column_types = {"doc_id": pa.int64(), "text": pa.string()}
    return ray.data.read_csv(
        out_dir,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(column_types=column_types),
    )
