"""Bounded-memory frequency sketches.

The reference has no sketch surface (its topology is stateless routing,
TopologyProducer.kt:84-202); these are the summary structures a 100 TB
pipeline needs when the key domain is too large to aggregate exactly in
one pass. Sibling of the in-plan Count-Min / HLL queries
(queries.q_sketch_countmin, q_sketch_merge_hll) — this module holds the
operators that need per-partition imperative state (Arrow-batched, never
row-at-a-time).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def misra_gries_candidates(
    df: DataFrame, key_col: str, k: int = 2048
) -> DataFrame:
    """Per-partition Misra–Gries heavy-hitter CANDIDATES: the distinct
    union of every partition's k-counter survivor set.

    Guarantee (the reason this is safe to use as a pruning pass): a
    partition's MG summary retains every key whose partition-local count
    exceeds n_p/(k+1); by pigeonhole any key with GLOBAL count
    > Σn_p/(k+1) = n/(k+1) must exceed that local bound in at least one
    partition — so the union is a SUPERSET of all keys above frequency
    n/(k+1). Downstream exact counting of just the candidate set then
    yields an EXACT heavy-hitter answer (sketch-guided pruning, not an
    approximate one): see queries.q_heavy_hitters_mg.

    Shape: one mapInPandas pass holding ≤k counters per partition
    (batched MG merge: add the Arrow batch's value_counts, then if over
    k keys subtract the (k+1)-th largest count from all and drop ≤0 —
    the Agarwal et al. 2013 mergeable-summaries step, same guarantee as
    element-wise MG), emitting ≤k candidate keys per partition. The
    only shuffle is the final distinct over ≤ partitions·k keys —
    cardinality-bounded regardless of input size.
    """
    field = df.schema[key_col]
    out_schema = f"{key_col} {field.dataType.simpleString()}"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for val, cnt in pdf[key_col].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
            if len(counters) > k:
                # subtract the (k+1)-th largest count from everything:
                # one sorted pass, equivalent to (many) MG decrements
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - cut for key, c in counters.items() if c > cut
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(summarize, out_schema).distinct()
