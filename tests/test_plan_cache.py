"""PlanCache ownership semantics (operators/cache.py).

Pins the r14-verdict fix: a cache-HIT re-invocation must not grow
``_frames`` — the JVM CacheManager dedupes the new persist() calls into
the blocks already owned by the original (miss) invocation, so tracking
the duplicate Python handles only bloats the list and makes evict()
re-unpersist the same entries.
"""

from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.operators.cache import PlanCache


def _anchor(spark, n=10):
    return spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_miss_then_hit_keeps_frames_flat(spark):
    pc = PlanCache()

    # First invocation: miss — registers its persisted frames.
    pc.begin(_anchor(spark), key=("cfg", 1))
    for _ in range(4):
        pc.register(_anchor(spark).persist())
    assert len(pc._frames) == 4

    # Same-input re-invocations: hit — register() is a pass-through
    # no-op, the list must stay flat however many times we re-run.
    for _ in range(3):
        pc.begin(_anchor(spark), key=("cfg", 1))
        for _ in range(4):
            df = _anchor(spark).persist()
            assert pc.register(df) is df  # still a pass-through
    assert len(pc._frames) == 4


def test_changed_key_evicts_and_reregisters(spark):
    pc = PlanCache()
    pc.begin(_anchor(spark), key=1)
    pc.register(_anchor(spark).persist())
    assert len(pc._frames) == 1

    pc.begin(_anchor(spark), key=2)  # same plan, different config
    assert len(pc._frames) == 0  # previous run evicted
    pc.register(_anchor(spark).persist())
    pc.register(_anchor(spark).persist())
    assert len(pc._frames) == 2


def test_changed_plan_evicts(spark):
    pc = PlanCache()
    pc.begin(_anchor(spark, 10), key=None)
    pc.register(_anchor(spark, 10).persist())
    pc.begin(_anchor(spark, 20), key=None)  # different input relation
    assert len(pc._frames) == 0
    pc.register(_anchor(spark, 20).persist())
    assert len(pc._frames) == 1

    # And a subsequent hit on the NEW anchor stays flat again.
    pc.begin(_anchor(spark, 20), key=None)
    pc.register(_anchor(spark, 20).persist())
    assert len(pc._frames) == 1


def test_evict_resets_hit_state(spark):
    pc = PlanCache()
    pc.begin(_anchor(spark), key=None)
    pc.register(_anchor(spark).persist())
    pc.begin(_anchor(spark), key=None)  # hit
    assert pc.evict() == 1
    # After evict, the next begin is a miss and register tracks again.
    pc.begin(_anchor(spark), key=None)
    pc.register(_anchor(spark).persist())
    assert len(pc._frames) == 1
