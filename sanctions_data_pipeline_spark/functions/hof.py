"""Higher-order-function helpers.

``let`` gives Column expressions a let-binding: Spark evaluates a HOF
lambda's *body* once per element, and Catalyst's CollapseProject inlines
single-reference aliases across projections — so an expensive
subexpression referenced inside a ``transform(sequence(...), ...)``
lambda is silently recomputed for every loop element (measured 26 ms/row
on the MinHash banding path: the shingle build re-ran bands x n_hashes
times). Binding it to a lambda variable pins one evaluation per row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once, reference it many times in ``body``.

    Implemented as ``transform(array(value), v -> body(v))[0]`` — the
    array literal forces a single evaluation; the lambda variable is a
    bound attribute, immune to projection-collapse re-inlining.
    """
    return F.transform(F.array(value), body)[0]
