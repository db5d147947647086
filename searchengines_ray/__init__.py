"""searchengines_ray — a Ray-Data-native inverted-index build + query engine.

A from-scratch reimplementation of the capabilities of the reference engine
(`patrickhuang112/SearchEngines`, CMU 11-642 QryEval) on Ray Data:

- distributed SPIMI index build over Parquet web pages
  (:mod:`searchengines_ray.index.build`),
- BM25 / Indri / Boolean retrieval with the structured query language
  ``#AND #OR #SUM #WAND #WSUM #SYN #NEAR/n #WINDOW/n`` and ``term.field``
  (:mod:`searchengines_ray.parser`, :mod:`searchengines_ray.query`),
- pseudo-relevance feedback, learning-to-rank features, diversification
  (:mod:`searchengines_ray.pipelines`),
- large-scale training-data operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding), similarity search, text analysis, multimodal
  stubs (:mod:`searchengines_ray.stages`).

Nothing here calls ``ray.init()``; sessions are owned by the caller
(tests' conftest, ``bench.py``, CLIs).
"""

__version__ = "0.1.0"


def _configure_data_context() -> None:
    """Process-wide Ray Data defaults (no session is created here).

    Push-based shuffle halves the per-shuffle barrier cost of every
    groupby/sort (measured 13-16 s -> 7.7-9.6 s on the 3-shuffle MinHash
    dedup at sf0.1) by pipelining the map and reduce phases; semantics
    are identical to the default sort-based shuffle.
    """
    import os

    if os.environ.get("SERAY_PUSH_SHUFFLE", "1") == "0":
        return
    try:
        import ray.data

        ray.data.DataContext.get_current().use_push_based_shuffle = True
    except Exception:  # pragma: no cover - ray absent / API drift
        pass


_configure_data_context()
