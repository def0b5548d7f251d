"""Vector column functions for similarity search over array<float>
embedding columns.

Everything is built-in higher-order functions (zip_with / aggregate /
transform) — JVM-side, no UDF, scales with codegen.

Determinism contract: dot products use FIXED-POINT accumulation — each
pairwise product (exact in double: two float24 mantissas fit in 53 bits)
is scaled by 2^20 and floored to BIGINT before summing. Integer sums are
order-independent, so Spark and the DuckDB oracle produce bit-identical
similarities regardless of evaluation order — float += would differ in the
last ULP between engines/partitionings. Precision loss is ~1e-6 per term,
irrelevant for ranking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FIXED_SCALE = 1 << 20  # 2^20


def dot_fixed(a: Column, b: Column) -> Column:
    """Σ floor(a[i]*b[i]*2^20) as BIGINT (exact, order-free)."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(float(FIXED_SCALE))
        ).cast("long"),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def norm_sq_fixed(a: Column) -> Column:
    return dot_fixed(a, a)


def cosine_fixed(dot_f: Column, norm_a_f: Column, norm_b_f: Column) -> Column:
    """Cosine from fixed-point pieces: identical IEEE ops on identical
    integers in both engines."""
    s = float(FIXED_SCALE)
    return (dot_f.cast("double") / s) / F.sqrt(
        (norm_a_f.cast("double") / s) * (norm_b_f.cast("double") / s)
    )


QUANT_SCALE = 1 << 10  # 2^10


def quantized(vec: Column) -> Column:
    """array<float> → array<long>: floor(x * 2^10) per component.

    Quantize-once-then-integer-dot is the all-pairs workhorse: integer
    dots are exact and order-free in EVERY engine and in numpy int64
    matmul, so blocked BLAS-style execution (operators/similarity.py)
    stays bit-identical to the SQL oracle. With |x| ≤ ~32 and 64 dims,
    dots stay ≤ ~2^31 and norm products ≤ ~2^62 — inside both int64 and
    double-exact range."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * F.lit(float(QUANT_SCALE))).cast("long"),
    )


def dot_int(a: Column, b: Column) -> Column:
    """Integer dot of two array<long> columns (exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# LSH hyperplanes (deterministic, integer-derived — reproducible in SQL)
# ---------------------------------------------------------------------------

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 1 << 31


def lcg_plane_component(plane: int, dim_index: Column, dims: int) -> Column:
    """Pseudo-random hyperplane component in [-0.5, 0.5): pure integer LCG
    of (plane*dims + d), exactly reproducible in ANSI SQL."""
    x = (F.lit(LCG_A).cast("long") * (F.lit(plane * dims) + dim_index) + F.lit(LCG_C)) % F.lit(
        LCG_M
    )
    return x.cast("double") / F.lit(float(LCG_M)) - F.lit(0.5)


def lsh_bucket(vec: Column, dims: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id: bit p = (vec · plane_p) >= 0.

    The projection uses the same fixed-point floor-sum as dot_fixed so the
    sign decision is bit-identical in the oracle.
    """
    def term_fn(p: int):
        # NOTE: a plain `lambda i, p=p:` would have TWO parameters, which
        # PySpark's higher-order functions interpret as an (element, index)
        # lambda — binding the loop variable via closure keeps it unary.
        def term(i: Column) -> Column:
            return F.floor(
                F.element_at(vec, i).cast("double")
                * lcg_plane_component(p, i - 1, dims)
                * F.lit(float(FIXED_SCALE))
            ).cast("long")

        return term

    bucket = F.lit(0)
    for p in range(n_planes):
        prods = F.transform(F.sequence(F.lit(1), F.lit(dims)), term_fn(p))
        proj = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket
