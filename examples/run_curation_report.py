"""The curation REPORT: the observability/evaluation queries a data
team reviews before (and after) shipping a corpus snapshot, composed
from the registered operator surface:

    dup-cluster size histogram      -> how much dedup will remove
    cross-source duplication matrix -> which feeds mirror each other
    near-dup pair explanations      -> what KIND of duplicates these are
    language-ID confusion matrix    -> where the lang classifier is blind
    CCNet perplexity buckets        -> fluency distribution per language
    Benford first-digit audit       -> numeric-integrity screen
    ANN recall@5                    -> is the LSH index good enough
    exact-overlap decontamination   -> benchmark leakage check
    gopher repetition bitmask       -> which repetition rule fires where
    trained-quality holdout ROC     -> does the learned filter generalize
    PQ training gain                -> is an index rebuild worth it
    dedup funnel                    -> doc/token yield per dedup stage

Run:

    python examples/run_curation_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_processor_cosmos_tx_dispatch_spark import queries as Q
from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark

REPORT = [
    ("duplicate cluster sizes", "dedup_cluster_histogram"),
    ("cross-source duplication", "dedup_source_matrix"),
    ("near-dup pair anatomy", "dedup_pair_explain"),
    ("lang-id confusion", "text_langid_eval"),
    ("fluency buckets", "sample_perplexity_buckets"),
    ("Benford digit audit", "q_benford_audit"),
    ("ANN recall@5", "sim_recall_at_k"),
    ("benchmark contamination", "text_decontaminate_exact"),
    # r13: the trained-model dashboards
    ("gopher repetition rules", "text_gopher_repetition"),
    ("trained quality ROC (holdout)", "text_quality_train_holdout"),
    ("PQ codebook training gain", "sim_pq_train_gain"),
    ("dedup funnel yields", "dedup_funnel_report"),
    # r14: winnowing reaches a drop decision; PQ trains on a sample
    ("winnow-verified survivors", "dedup_drop_winnow"),
    ("sample-trained PQ occupancy", "sim_pq_train_sampled"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-report")
    qs = Q.queries()
    for title, name in REPORT:
        print(f"\n== {title} ({name}) ==")
        df = qs[name](spark, sf_dir)
        df.show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
