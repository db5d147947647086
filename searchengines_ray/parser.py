"""Structured query language parser.

Re-implements the reference's prefix query language
(``/root/reference/QryEval/QryParser.java:282-360``) as a pure-Python parser
producing a small AST (no class hierarchy with iterators — evaluation lives in
:mod:`searchengines_ray.query.exec` and :mod:`searchengines_ray.oracle`).

Pinned semantics (verified against the reference source):

- Operators (case-insensitive): ``#SUM #WAND #WSUM #OR #SYN #AND #NEAR/n
  #WINDOW/n`` (``QryParser.java:91-127``).
- ``term.field`` suffix; unknown field -> syntax error; default field ``body``
  (``QryParser.java:141-165``).
- A bare token that parses as a float is ALWAYS consumed as a weight (even
  under unweighted operators, where it is simply dropped) and the weight is
  *sticky*: it applies to every subsequent arg until replaced
  (``QryParser.java:317-357``).  A term token that tokenizes into k terms
  appends the current weight k times under weighted operators.
- A stopword-removed term appends nothing (its weight is not appended either).
- Optimizer (``QryParser.java:230-272``): depth-first; drop empty operators;
  collapse single-arg non-SCORE operators (weighted parents: the weight of a
  removed/collapsed arg is removed with it — the reference's ``removeArg``
  drops only the arg, which would trip its own alignment assert; we keep
  weights aligned, a documented deviation for a case the reference cannot
  itself evaluate).
- Default-operator wrapping (``QryEval.java:1140-1156``): BM25 -> ``#SUM``,
  Indri / Boolean -> ``#AND``, applied to raw (non-``#``-prefixed) queries.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional

from .analysis import AnalyzerConfig, DEFAULT_ANALYZER, FIELDS, tokenize


class QuerySyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class Node:
    """AST node. op in {'term','syn','near','window','and','or','sum','wand',
    'wsum'}.  Iop nodes ('term','syn','near','window') produce inverted lists;
    the rest are score operators."""

    op: str
    args: tuple = ()
    term: Optional[str] = None
    field: Optional[str] = None
    dist: Optional[int] = None
    weights: tuple = dc_field(default=())

    def is_iop(self) -> bool:
        return self.op in ("term", "syn", "near", "window")

    def __str__(self) -> str:  # debugging aid
        if self.op == "term":
            return f"{self.term}.{self.field}"
        name = f"#{self.op.upper()}" + (f"/{self.dist}" if self.dist else "")
        if self.weights:
            inner = " ".join(
                f"{w:g} {a}" for w, a in zip(self.weights, self.args)
            )
        else:
            inner = " ".join(str(a) for a in self.args)
        return f"{name}({inner})"


WEIGHTED_OPS = ("wand", "wsum")
SOP_OPS = ("and", "or", "sum", "wand", "wsum")
IOP_COMPOSITE_OPS = ("syn", "near", "window")


def _find_balancing_paren(s: str) -> int:
    depth = 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _pop_subquery(s: str) -> tuple[str, str]:
    i = _find_balancing_paren(s)
    if i < 0:
        raise QuerySyntaxError(f"Unbalanced subquery: {s!r}")
    return s[: i + 1], s[i + 1 :]


def _pop_term(s: str) -> tuple[str, str]:
    parts = s.split(None, 1)
    return parts[0], (parts[1] if len(parts) > 1 else "")


def _create_terms(token: str, config: AnalyzerConfig) -> list[Node]:
    """``term.field`` handling + analysis; may yield 0..k nodes
    (``QryParser.java:141-179``)."""
    delim = token.find(".")
    if delim < 0:
        field, term = "body", token
    else:
        field, term = token[delim + 1 :].lower(), token[:delim]
    if field not in FIELDS:
        raise QuerySyntaxError(f"Unknown field in {token!r}")
    return [Node("term", term=t, field=field) for t in tokenize(term, config)]


def _make_operator(name: str) -> tuple[str, Optional[int]]:
    low = name.lower()
    parts = low.split("/", 1)
    op = parts[0]
    if op in ("#sum", "#wand", "#wsum", "#or", "#syn", "#and"):
        return op[1:], None
    if op in ("#near", "#window"):
        if len(parts) != 2:
            raise QuerySyntaxError(f"{name}: missing /n distance")
        return op[1:], int(parts[1])
    raise QuerySyntaxError(f"Unknown query operator {name!r}")


def _parse_string(s: str, config: AnalyzerConfig) -> Node:
    s = s.strip()
    if (
        s.count("(") == 0
        or s.count("(") != s.count(")")
        or _find_balancing_paren(s) != len(s) - 1
    ):
        raise QuerySyntaxError("Missing, unbalanced, or misplaced parentheses")
    head, rest = s.split("(", 1)
    op, dist = _make_operator(head.strip())
    body = rest[: rest.rindex(")")].strip()

    args: list[Node] = []
    weights: list[float] = []
    weight: Optional[float] = None
    weighted = op in WEIGHTED_OPS
    while body:
        new_args: list[Node] = []
        if body[0] == "#":
            popped, body = _pop_subquery(body)
            new_args = [_parse_string(popped, config)]
        else:
            popped, body = _pop_term(body)
            try:
                weight = float(popped)  # sticky weight (QryParser.java:317-357)
                new_args = []
            except ValueError:
                new_args = _create_terms(popped, config)
        body = body.strip()
        for a in new_args:
            if weighted:
                if weight is None:
                    raise QuerySyntaxError(
                        f"#{op.upper()} argument without a weight"
                    )
                weights.append(weight)
            args.append(a)
    return Node(op, tuple(args), dist=dist, weights=tuple(weights))


def optimize(q: Optional[Node]) -> Optional[Node]:
    """Drop empty operators, collapse single-arg non-term operators
    (``QryParser.java:230-272``)."""
    if q is None or q.op == "term":
        return q
    new_args: list[Node] = []
    new_weights: list[float] = []
    for i, a in enumerate(q.args):
        oa = optimize(a)
        if oa is not None:
            new_args.append(oa)
            if q.weights:
                new_weights.append(q.weights[i])
    if not new_args:
        return None
    if len(new_args) == 1:
        return new_args[0]
    return Node(
        q.op, tuple(new_args), dist=q.dist, weights=tuple(new_weights)
    )


def parse_query(
    query: str,
    model_default_op: str = "sum",
    config: AnalyzerConfig = DEFAULT_ANALYZER,
) -> Optional[Node]:
    """Parse one query string (already stripped of ``qid:``).

    Raw queries are wrapped in the model default operator first
    (``QryEval.java:1140-1156``): BM25 -> ``#SUM``, Indri/Boolean -> ``#AND``.
    Returns ``None`` when optimization empties the query (all stopwords).
    """
    q = query.strip()
    if not q.startswith("#") or _find_balancing_paren(q) != len(q) - 1:
        q = f"#{model_default_op}({q})"
    return optimize(_parse_string(q, config))


def parse_query_line(line: str) -> tuple[str, str]:
    """Split a ``qid:querytext`` line (``QryEval.java:1377-1386``)."""
    qid, _, text = line.partition(":")
    if not _:
        raise QuerySyntaxError(f"Missing ':' in query line {line!r}")
    return qid.strip(), text.strip()
