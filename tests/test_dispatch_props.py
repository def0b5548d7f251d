"""Property-based dispatch invariants (hypothesis): for random rule
banks and random records, the engine must uphold the reference's
contract (TopologyProducer.kt:97-231, TopologyTest.kt:88-94):

  * every decodable record produces exactly max(1, #matching rules)
    output rows — multicast per match, one DLQ row when nothing matches;
  * a record's matched topics are exactly the topics of the rules whose
    predicate matches per the Python JsonPath evaluator (the semantics
    oracle);
  * rule tags are rule-bank indices in config order.

One Spark job per example would be minutes of overhead, so examples are
BATCHED: hypothesis generates the corpus, one dispatch run covers all
records, and the per-record assertions replay the evaluator.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_processor_cosmos_tx_dispatch_spark.functions import jsonpath as jp
from kafka_processor_cosmos_tx_dispatch_spark.operators import dispatch as dsp
from kafka_processor_cosmos_tx_dispatch_spark.rules import DispatchRule

TYPES = ["purchase", "click", "error", "view"]

RULE_POOL = [
    "$[?(@.event_type == 'purchase')]",
    "$[?(@.value >= 50)]",
    "$[?(@.event_type == 'error' && @.value >= 100)]",
    "$[?(@.event_type in ['click', 'view'])]",
    "$[?(@.value < 10 || @.event_type == 'purchase')]",
    "$.missing",
    "$[?(@.tags[0] == 'a')]",
    "$[?(@.tags[0:2][?(@ == 'b')])]" ,  # unsupported shapes fall back safely
]

RECORD = st.fixed_dictionaries(
    {
        "event_type": st.sampled_from(TYPES),
        "value": st.integers(min_value=0, max_value=200),
    },
    optional={"tags": st.lists(st.sampled_from(["a", "b", "c"]), max_size=3)},
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rule_idxs=st.lists(
        st.integers(min_value=0, max_value=len(RULE_POOL) - 1),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    records=st.lists(RECORD, min_size=1, max_size=25),
)
def test_dispatch_matches_evaluator(spark, rule_idxs, records):
    rules = [
        DispatchRule(f"r{i}", f"topic-{i}", RULE_POOL[p])
        for i, p in enumerate(rule_idxs)
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(r)) for i, r in enumerate(records)],
        "rec_id long, tx_json string",
    )
    out = dsp.dispatch(df, rules, json_col="tx_json")
    got: dict[int, list] = {}
    for row in out.select("rec_id", "rule_idx", "topic").collect():
        got.setdefault(row["rec_id"], []).append((row["rule_idx"], row["topic"]))

    for i, rec in enumerate(records):
        txt = json.dumps(rec)
        want_topics = [
            (j, r.topic) for j, r in enumerate(rules) if jp.match(txt, r.predicate)
        ]
        if not want_topics:
            want_topics = [(-2, "dlq")]
        assert sorted(got[i]) == sorted(want_topics), (rec, rules)
