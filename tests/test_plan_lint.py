"""Repo-wide physical-plan lint: every registered query's plan is scanned
for scale red flags, so a regression anywhere in the surface (a join that
degrades to cartesian, a Python eval node sneaking into a JVM path)
fails CI — the whole-surface generalization of the hand-pinned asserts
in test_scale_plans.py.

Red flags:
- CartesianProduct — an unconditioned cross join of two scaling sides.
- BatchEvalPython / ArrowEvalPython — row/batch Python eval in a plan
  that should be whole-stage codegen (deliberate Python operators are
  whitelisted below).
- BroadcastNestedLoopJoin — non-equi fallback join; allowed only where
  one side is a bounded 1-row/handful aggregate (whitelisted).
"""

import pytest

from kafka_processor_cosmos_tx_dispatch_spark import queries as Q

# Queries whose CALL already executes jobs (streaming run-to-completion,
# checkpointed iteration) — their plans are exercised by the oracle gate;
# re-running them here would double the suite's runtime for no new signal.
EAGER = {
    "dedup_connected_components",
    "q_bucketed_join_agg",  # warehouse writes on call
    "graph_pagerank",
    "graph_pagerank_dangling",
    "sim_kmeans_clusters",  # centroid collects between Lloyd rounds
    "sample_cluster_balanced",  # same (built on kmeans_assign)
    "q_gap_fill_locf",
    "q_sketch_countmin",
    "sample_temperature_weights",
    "streaming_incremental_merge",
    "text_tfidf_topterms",
    "text_token_rarity",
}

# Deliberate Python-eval operators: Arrow-batched by design.
PYTHON_OK = {
    "dispatch_dlq_envelope",  # tier-3 Pandas-UDF JsonPath fallback path
    "multimodal_features",  # mapInPandas feature extraction (stub codecs)
    "multimodal_frame_sample",
    "multimodal_audio_energy",
    "q_udaf_grouped_cents",  # grouped-agg pandas UDF (the point of the query)
    "text_udtf_bigrams",  # Python UDTF via LATERAL
    "sim_embedding_near_dup",  # block-tiled dgemm under mapInPandas
    "dedup_hybrid_verify",
    "dedup_verify_editdist",
}

# Bounded-side nested-loop joins: the broadcast side is a 1-row (or
# few-row) aggregate, which is the intended plan for scalar joins.
BNLJ_OK = {
    "q22_idle_balances",  # scalar avg subquery broadcast
    "q_subquery_scalar",
    "q_histogram_equiheight",  # 1-row cut-point table
    "text_vocab_coverage",  # bounded vocab, joined non-equi-free
    "q_data_profile",
    "text_pack_sequences",  # offset table
    "sample_stratified",
    "sample_hash_split",
    "q_join_range_nonequi",  # broadcast non-equi vs bounded dim (by design)
    "q_join_bloom_prefilter",  # 1-row bloom word-array broadcast into the scan
    "sim_topk_bruteforce",  # bounded query set broadcast vs corpus
    "sim_embedding_near_dup",  # bounded block-pair KEY table broadcast
    "q_sketch_merge_hll",  # 1-row merged-sketch estimate
    "q_join_cross",  # deliberate cross join of two bounded dims
}

# The one deliberate cartesian: a bounded dim × bounded dim cross join.
CROSS_OK = {"q_join_cross"}


def _names():
    return [n for n in Q.queries() if not n.startswith("streaming_") and n not in EAGER]


@pytest.mark.parametrize("name", _names())
def test_plan_has_no_scale_red_flags(spark, sf_dir, name):
    df = Q.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in PYTHON_OK:
        assert "BatchEvalPython" not in plan, f"{name}: row-Python eval"
        assert "ArrowEvalPython" not in plan, f"{name}: Python eval"
        assert "MapInPandas" not in plan, f"{name}: unexpected mapInPandas"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"
