"""The dispatch engine: rule evaluation → multicast routing → topic column.

Re-expresses the reference topology (/root/reference/src/main/kotlin/com/
okp4/processor/cosmos/TopologyProducer.kt:84-231) as one declarative
DataFrame plan:

    reference                           here
    ---------                           ----
    mapValues tx-deserialization        caller provides tx struct / error col
    mapValues evaluate-tx (:97,205-231) with_matches(): one array<int> column
    flatMapValues flatten (:100-105)    explode(matches)
    split()+branches (:106-201)         a 'topic' string column
    per-branch serialization            value_for_topic() projections

Semantics pinned by the reference tests (TopologyTest.kt:88-94):
  * multicast — a record matching k rules yields k output rows;
  * rule order = config order, tags are list indices (:214);
  * no match ⇒ sentinel UNFILTERED(-2) ⇒ DLQ with a JSON envelope
    {"txJson": ..., "txBytes": base64, "message": null} (:32-41, 186-195);
  * decode failure ⇒ sentinel ERROR(-1) ⇒ error topic with the ORIGINAL
    input bytes (:122), and only if an error topic is configured (:124) —
    otherwise those records are dropped;
  * per-record predicate evaluation error ⇒ non-match, never a failure
    (:221-223).

Scale notes: rules are a handful of driver-side literals compiled INTO the
plan (no join, no shuffle, no Python in the hot path when predicates
compile natively); evaluation + explode + routing is a single narrow
stage — the whole dispatch path is shuffle-free, exactly like the
reference's stateless topology, and survives any scale-up.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import jsonpath as jp
from ..functions.exprs import bind
from ..rules import ERROR, UNFILTERED, DispatchRule

DEFAULT_DLQ_TOPIC = "dlq"


def rule_predicate(
    rule: DispatchRule,
    json_col: Column | None = None,
    struct_col: Column | None = None,
    struct_type: T.DataType | None = None,
) -> Column:
    """Compile one rule's JsonPath to a boolean Column, fastest tier first.

    1. typed struct column → native Catalyst expression (codegen);
    2. JSON string + definite path → get_json_object (JVM-side);
    3. anything else → Arrow-batched Pandas UDF with the full evaluator.

    A predicate that doesn't parse at all compiles to constant False
    (never matches) with a warning — reference parity: rule evaluation
    errors are swallowed as non-matches, never failures
    (TopologyProducer.kt:221-223), so one bad rule must not take down
    the topology.
    """
    compiled = _predicate_jvm(rule, json_col, struct_col, struct_type)
    if compiled is not None:
        return compiled
    if json_col is None:
        raise ValueError(
            f"rule {rule.name!r} needs a json_col or a typed struct_col"
        )
    return jp.jsonpath_match_pandas_udf(rule.predicate)(json_col)


def _predicate_jvm(
    rule: DispatchRule,
    json_col: Column | None,
    struct_col: Column | None,
    struct_type: T.DataType | None,
) -> Column | None:
    """Tiers 1-2 only (plus the never-match compile for unparseable
    predicates); None means the rule needs the tier-3 Python evaluator —
    the caller decides whether to fall back per-rule
    (rule_predicate) or batch every tier-3 rule into one fused UDF
    (with_matches)."""
    try:
        jp.parse(rule.predicate)
    except jp.JsonPathError as e:
        import warnings

        warnings.warn(
            f"rule {rule.name!r}: unparseable predicate "
            f"{rule.predicate!r} ({e}) — compiled to never-match",
            stacklevel=2,
        )
        return F.lit(False)
    if struct_col is not None and struct_type is not None:
        compiled = jp.compile_struct_predicate(struct_col, struct_type, rule.predicate)
        if compiled is not None:
            return compiled
    if json_col is not None:
        compiled = jp.compile_json_string_predicate(json_col, rule.predicate)
        if compiled is not None:
            return compiled
    if json_col is None and (struct_col is None or struct_type is None):
        raise ValueError(
            f"rule {rule.name!r} needs a json_col or a typed struct_col"
        )
    return None


def python_tier_paths(
    rules: list[DispatchRule],
    json_col: str = "tx_json",
    struct_type: T.StructType | None = None,
) -> list[str]:
    """Predicates (in rule order) that `with_matches` would route to the
    Python tier given the same views — the contract for precomputing a
    `tier3_col` upstream (e.g. fused into the decode UDF, where the
    parsed object already exists and the per-record json.loads can be
    skipped)."""
    jc = F.col(json_col)
    sc = F.col("__s") if struct_type is not None else None
    return [
        r.predicate
        for r in rules
        if _predicate_jvm(r, jc, sc, struct_type) is None
    ]


def with_matches(
    df: DataFrame,
    rules: list[DispatchRule],
    json_col: str | None = None,
    struct_col: str | None = None,
    error_col: str | None = None,
    out_col: str = "matches",
    tier3_col: str | None = None,
) -> DataFrame:
    """Add ``matches: array<int>`` — indices of matching rules in rule order.

    ``[-1]`` for decode failures (error_col non-null), ``[-2]`` when no rule
    matches (≅ getEvaluatedTxList, TopologyProducer.kt:205-231). All rules
    are evaluated once per record against one shared JSON/struct view —
    the reference's evaluate-once/route-by-tag shape; Catalyst's
    subexpression elimination keeps it single-pass.

    ``tier3_col``: name of an existing ``array<boolean>`` column holding
    the PRECOMPUTED Python-tier results, one per `python_tier_paths()`
    entry in rule order (produced upstream, e.g. by
    ``decode_tx_records(match_paths=...)`` where the decoded object is
    already in hand). When set, no matcher UDF is planned and the column
    is consumed (dropped from the output).
    """
    jc = F.col(json_col) if json_col else None
    sc = F.col(struct_col) if struct_col else None
    st = df.schema[struct_col].dataType if struct_col else None

    preds: list[Column | None] = [
        _predicate_jvm(r, jc, sc, st) for r in rules
    ]
    py_idx = [i for i, p in enumerate(preds) if p is None]
    if py_idx and tier3_col is not None:
        for pos, i in enumerate(py_idx):
            # coalesce: a null element (malformed precomputed array)
            # must read as non-match, never null-propagate into `tagged`
            preds[i] = F.coalesce(
                F.element_at(F.col(tier3_col), pos + 1), F.lit(False)
            )
    elif py_idx:
        if jc is None:
            raise ValueError(
                f"rule {rules[py_idx[0]].name!r} needs a json_col or a "
                "typed struct_col"
            )
        # Every tier-3 rule rides ONE fused UDF (one json.loads per
        # record for the whole bank, one Arrow column back). The fused
        # array is MATERIALIZED as its own column rather than inlined
        # into each element_at: inlining leaves m copies of the same
        # PythonUDF expression and relies on Catalyst's UDF extraction
        # to dedup them — guaranteed single evaluation beats
        # optimizer-version-dependent behavior.
        many = jp.jsonpath_match_many_pandas_udf(
            [rules[i].predicate for i in py_idx]
        )(jc)
        tier3_col = f"__tier3_{out_col}"
        df = df.withColumn(tier3_col, many)
        for pos, i in enumerate(py_idx):
            preds[i] = F.element_at(F.col(tier3_col), pos + 1)
    tagged = F.array(
        *[F.when(p, F.lit(i)).otherwise(F.lit(None)) for i, p in enumerate(preds)]
    )
    hits = F.filter(tagged, lambda x: x.isNotNull())
    no_match = F.array(F.lit(UNFILTERED))
    # bind(): `hits` (the full rule-bank evaluation) appears twice in the
    # WHEN/OTHERWISE below; without the let-binding Catalyst duplicates
    # the whole predicate array — including any get_json_object calls —
    # textually into both branches (and into any filter later inferred
    # from this column).
    matched = bind(
        hits, lambda h: F.when(F.size(h) > 0, h).otherwise(no_match)
    )
    if error_col is not None:
        matched = F.when(
            F.col(error_col).isNotNull(), F.array(F.lit(ERROR))
        ).otherwise(matched)
    out = df.withColumn(out_col, matched.cast(T.ArrayType(T.IntegerType())))
    if tier3_col is not None:
        # consumed plumbing — caller-provided or the internally
        # materialized fused array (tier3_col was reassigned above)
        out = out.drop(tier3_col)
    return out


def topic_map(
    rules: list[DispatchRule],
    dlq_topic: str = DEFAULT_DLQ_TOPIC,
    error_topic: str | None = None,
) -> Column:
    """rule_idx → destination topic as a literal map (broadcast by value)."""
    pairs: list[Column] = []
    for i, r in enumerate(rules):
        pairs += [F.lit(i), F.lit(r.topic)]
    pairs += [F.lit(UNFILTERED), F.lit(dlq_topic)]
    if error_topic is not None:
        pairs += [F.lit(ERROR), F.lit(error_topic)]
    return F.create_map(*pairs)


def dispatch(
    df: DataFrame,
    rules: list[DispatchRule],
    json_col: str | None = None,
    struct_col: str | None = None,
    error_col: str | None = None,
    dlq_topic: str = DEFAULT_DLQ_TOPIC,
    error_topic: str | None = None,
    tier3_col: str | None = None,
) -> DataFrame:
    """Full routing: one output row per (record, destination).

    Adds ``rule_idx`` (int; -1 error, -2 unfiltered), ``rule_name`` (null
    for sentinels) and ``topic``. Records that fail decode are DROPPED when
    no error topic is configured (TopologyProducer.kt:124-131).
    ``tier3_col``: see `with_matches` — precomputed Python-tier results.
    """
    out = with_matches(
        df, rules, json_col, struct_col, error_col, tier3_col=tier3_col
    )
    # explode_outer, deliberately: `matches` is never empty (the UNFILTERED
    # sentinel guarantees ≥1 element) so outer vs inner explode is
    # semantically identical — but the non-outer Generate makes Catalyst
    # infer a `size(matches) > 0` filter and push it below the Generate,
    # re-evaluating the entire rule bank once more per input row (measured
    # ~2× on the dispatch bench).
    out = out.withColumn("rule_idx", F.explode_outer("matches")).drop("matches")
    if error_topic is None:
        out = out.filter(F.col("rule_idx") != F.lit(ERROR))
    name_pairs: list[Column] = []
    for i, r in enumerate(rules):
        name_pairs += [F.lit(i), F.lit(r.name)]
    out = out.withColumn(
        "rule_name", F.element_at(F.create_map(*name_pairs), F.col("rule_idx"))
    )
    out = out.withColumn(
        "topic", F.element_at(topic_map(rules, dlq_topic, error_topic), F.col("rule_idx"))
    )
    return out


def dlq_envelope(
    tx_json: Column, raw_bytes: Column | None = None, message: Column | None = None
) -> Column:
    """The DLQ JSON envelope, field-for-field with the reference's Jackson
    serialization of ``DLQ(txJson, txBytes, message)`` (TopologyProducer.kt:
    32-41, 186-195): camelCase keys, bytes base64-encoded, explicit nulls.
    """
    fields = [
        tx_json.alias("txJson"),
        (F.base64(raw_bytes) if raw_bytes is not None else F.lit(None).cast("string")).alias(
            "txBytes"
        ),
        (message if message is not None else F.lit(None).cast("string")).alias("message"),
    ]
    return F.to_json(F.struct(*fields), {"ignoreNullFields": "false"})


def value_for_topic(
    dispatched: DataFrame,
    rules: list[DispatchRule],
    payload_col: str,
    raw_col: str | None = None,
    json_col: str | None = None,
    dlq_topic: str = DEFAULT_DLQ_TOPIC,
    reserialize: bool = False,
) -> DataFrame:
    """Project the per-destination output value, mirroring the branches:

    rule topics → the (re-serialized) payload (TopologyProducer.kt:155-159);
    DLQ → the JSON envelope as a string (:186-195);
    error topic → the original input bytes (:122).

    ``reserialize=False`` (default) passes the original input bytes to
    rule topics (and into the DLQ envelope's txBytes) — byte-identical
    to the reference for canonical wire encodings, and free.
    ``reserialize=True`` reproduces the reference's exact semantics
    (`tx.toByteArray()` on the REBUILT Tx — rule branches kt:155-159 AND
    the DLQ envelope's txBytes kt:186-195): the payload is re-encoded
    through protowire.reencode_tx, normalizing non-canonical-but-legal
    inputs exactly where protobuf-java's parse→serialize does (Any
    payloads stay verbatim, see reencode_tx). Costs one Arrow-batched
    Python pass; the UDF is total (undecodable bytes pass through
    unchanged) because when() does NOT stop Python UDF evaluation on
    non-matching rows — error-branch rows flow through the batch too,
    and their value comes from the raw-bytes branch anyway.

    Output column ``value`` is binary (DLQ string UTF-8 encoded) so one
    Kafka sink handles all destinations.
    """
    payload = F.col(payload_col)
    raw = F.col(raw_col) if raw_col else payload
    txj = F.col(json_col) if json_col else F.lit(None).cast("string")
    if reserialize:
        from pyspark.sql.functions import pandas_udf

        from ..functions.protowire import DecodeError, reencode_tx

        def _one(b) -> bytes | None:
            if b is None:
                return None
            try:
                return reencode_tx(bytes(b))
            except DecodeError:
                return bytes(b)  # error-branch rows: value unused there

        @pandas_udf("binary")
        def _reenc(col: pd.Series) -> pd.Series:
            return col.map(_one)

        rule_value = _reenc(raw.cast("binary"))
        dlq_bytes = rule_value  # reference: DLQ carries tx.toByteArray()
    else:
        rule_value = payload.cast("binary")
        dlq_bytes = raw
    value = (
        F.when(F.col("rule_idx") >= 0, rule_value)
        .when(F.col("rule_idx") == F.lit(ERROR), raw.cast("binary"))
        .otherwise(F.encode(dlq_envelope(txj, dlq_bytes), "UTF-8"))
    )
    return dispatched.withColumn("value", value)


def dispatch_metrics() -> list[Column]:
    """The observability analog of the reference's three peek taps
    (decode-failure / per-rule routing / unfiltered logs,
    TopologyProducer.kt:114-121, 152-154, 183-185): counters computed
    inline by the observe() framework — collected as accumulators during
    the normal pass, zero extra jobs, zero extra scans.
    """
    return [
        F.count(F.lit(1)).alias("n_output_rows"),
        F.count_if(F.col("rule_idx") >= 0).alias("n_rule_matches"),
        F.count_if(F.col("rule_idx") == F.lit(UNFILTERED)).alias("n_unfiltered"),
        F.count_if(F.col("rule_idx") == F.lit(ERROR)).alias("n_decode_errors"),
    ]


def with_observed_metrics(dispatched: DataFrame, name: str = "dispatch_metrics"):
    """Batch: returns (df, Observation) — read ``observation.get`` after an
    action. The reference logs per-record; at 100 TB per-record logging is
    the anti-pattern, so the engine surfaces the same information as
    per-pass aggregate metrics."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return dispatched.observe(obs, *dispatch_metrics()), obs


def with_streaming_metrics(dispatched: DataFrame, name: str = "dispatch_metrics") -> DataFrame:
    """Streaming: named observation; per-batch values arrive in every
    StreamingQueryProgress.observedMetrics[name] (hook a
    StreamingQueryListener to ship them to a metrics sink)."""
    return dispatched.observe(name, *dispatch_metrics())
