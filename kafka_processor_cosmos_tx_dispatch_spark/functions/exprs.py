"""Expression-level utilities.

`bind` is a let-binding for Column expressions. Catalyst's
CollapseProject freely inlines a projected expression into every
downstream reference — fine for cheap columns, catastrophic for an
expensive array pipeline referenced from a Generate (explode) output,
where inlining re-evaluates the pipeline once per EXPLODED row instead
of once per input row (observed 50×+ blowups on shingle pipelines).

Wrapping the value in a single-element array and accessing it through a
higher-order-function lambda variable forces exactly-once evaluation:
lambda variables are materialized by the HOF evaluator and no optimizer
rule rewrites through a lambda body.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(value: Column, fn: Callable[[Column], Column]) -> Column:
    """let value = <expr> in fn(value) — `value` is evaluated once even
    if `fn` references it many times, and stays evaluated-once under
    explode/CollapseProject."""
    return F.element_at(F.transform(F.array(value), fn), 1)
