import pytest

from searchengines_ray.parser import (
    Node,
    QuerySyntaxError,
    parse_query,
    parse_query_line,
)


def test_bag_of_words_wrapped_in_default_op():
    q = parse_query("horse hooves", "sum")
    assert q.op == "sum"
    assert [a.term for a in q.args] == ["horse", "hoof"] or [
        a.term for a in q.args
    ] == ["horse", "hooves"[:-1]]  # stemmer applied
    assert all(a.field == "body" for a in q.args)


def test_structured_query_with_fields():
    q = parse_query("#AND( east.title ridge.title high school )", "sum")
    assert q.op == "and"
    assert [(a.term, a.field) for a in q.args] == [
        ("east", "title"),
        ("ridge", "title"),
        ("high", "body"),
        ("school", "body"),
    ]


def test_near_window_distance():
    q = parse_query("#NEAR/3(apple pie)", "sum")
    assert q.op == "near" and q.dist == 3
    q = parse_query("#WINDOW/8(a1 b2)", "sum")
    assert q.op == "window" and q.dist == 8


def test_unknown_operator_and_field():
    with pytest.raises(QuerySyntaxError):
        parse_query("#FOO(a b)", "sum")
    with pytest.raises(QuerySyntaxError):
        parse_query("#AND(apple.banana pie)", "sum")


def test_weights_sticky_and_aligned():
    # sticky weight: 0.5 applies to b too (QryParser.java:317-357)
    q = parse_query("#WAND(0.5 apple banana)", "sum")
    assert q.op == "wand"
    assert q.weights == (0.5, 0.5)
    q = parse_query("#WSUM(0.3 apple 0.7 banana)", "sum")
    assert q.weights == (0.3, 0.7)


def test_hyphen_term_duplicates_weight():
    q = parse_query("#WAND(0.4 near-death 0.6 experience)", "sum")
    assert [a.term for a in q.args] == ["near", "death", "experience"]
    assert q.weights == (0.4, 0.4, 0.6)


def test_stopword_drops_weight():
    q = parse_query("#WAND(0.9 the 0.1 apple)", "sum")
    # "the" removed -> single arg -> optimizer collapses to the term
    assert q.op == "term" and q.term == "apple"


def test_all_stopword_query_optimized_away():
    assert parse_query("#NEAR/1(of the)", "sum") is None
    assert parse_query("the of", "sum") is None


def test_single_arg_collapse():
    q = parse_query("#AND(#AND(apple))", "sum")
    assert q.op == "term" and q.term == "apple"


def test_nested_subquery():
    q = parse_query("#SUM(#NEAR/2(apple pie) crust)", "sum")
    assert q.op == "sum"
    assert q.args[0].op == "near" and q.args[1].op == "term"


def test_numeric_token_is_weight_even_in_unweighted_op():
    # bare numbers always parse as weights and vanish in unweighted ops
    q = parse_query("#AND(1999 movie)", "sum")
    assert q.op == "term" and q.term == "movie"


def test_query_line():
    assert parse_query_line("51:horse hooves") == ("51", "horse hooves")
    with pytest.raises(QuerySyntaxError):
        parse_query_line("no colon here")
