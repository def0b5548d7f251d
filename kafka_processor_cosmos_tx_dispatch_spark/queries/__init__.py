"""The named-query registry: every operator surface of the engine, each as
a (PySpark plan, DuckDB oracle SQL) pair for the correctness harness.

Numeric determinism contract (so order-insensitive value hashes match the
oracle bit-for-bit):

- Sums/averages over double columns go through DECIMAL casts sized to the
  data (inputs are generated with 2 decimal places), making the aggregation
  EXACT and order-independent in both engines; the final value is cast to
  DOUBLE once. Both engines round-trip the same IEEE754 double.
- Averages are computed as CAST(sum AS DOUBLE)/CAST(count AS DOUBLE) — one
  IEEE division in both engines.
- No transcendental functions in hashed outputs (libm vs JVM last-ULP).
- Every LIMIT/top-k has a unique tiebreaker column.
- Timestamps are cast to DATE in outputs (Spark session is UTC).
- Integer-typed function results are cast to the same width on both sides.

Scale notes are in each query's docstring: what shuffles, what broadcasts,
and why the plan survives 100 TB.
"""

from . import _core
from . import dispatch as _m_dispatch  # noqa: E402 — registration order
from . import tpch as _m_tpch  # noqa: E402 — registration order
from . import agg as _m_agg  # noqa: E402 — registration order
from . import scalar as _m_scalar  # noqa: E402 — registration order
from . import join as _m_join  # noqa: E402 — registration order
from . import window as _m_window  # noqa: E402 — registration order
from . import subquery as _m_subquery  # noqa: E402 — registration order
from . import flatten as _m_flatten  # noqa: E402 — registration order
from . import dedup as _m_dedup  # noqa: E402 — registration order
from . import sample as _m_sample  # noqa: E402 — registration order
from . import graph as _m_graph  # noqa: E402 — registration order
from . import sim as _m_sim  # noqa: E402 — registration order
from . import text as _m_text  # noqa: E402 — registration order
from . import streaming as _m_streaming  # noqa: E402 — registration order
from . import multimodal as _m_multimodal  # noqa: E402 — registration order
from . import scan as _m_scan  # noqa: E402 — registration order

import sys as _sys

# The monolith exposed every helper, constant and query function as a
# module attribute; tests and tools import them directly. Re-merge all
# split namespaces into the package so `queries.<anything>` keeps
# resolving (same objects — family modules import the toolkit from
# _core, so collisions are identities).
_pkg = _sys.modules[__name__]
for _mod in (_core, _m_dispatch, _m_tpch, _m_agg, _m_scalar, _m_join, _m_window, _m_subquery, _m_flatten, _m_dedup, _m_sample, _m_graph, _m_sim, _m_text, _m_streaming, _m_multimodal, _m_scan):
    for _k, _v in vars(_mod).items():
        if not _k.startswith('__'):
            setattr(_pkg, _k, _v)

# Call-time cross-family references (monolith legacy, verified the
# only two): the referring function's globals are its family module,
# so inject the referenced query there. Decoration-time references
# (_ORACLE['...'] shares) are instead guaranteed by the family import
# order above (bucket first-appearance order of the monolith).
_m_scalar.q_scd2_history = _m_window.q_scd2_history
_m_sample.text_bigram_lm_score = _m_text.text_bigram_lm_score
