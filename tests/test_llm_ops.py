"""LLM-pipeline operator tests: dedup families, similarity search, text
analysis, multimodal plumbing — semantic properties beyond the oracle
hash-match (which tools/check_oracle.py covers)."""

import pytest
from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.operators import (
    dedup,
    multimodal,
    similarity,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  quick   Brown fox jumps over the lazy dog"),  # exact dup mod ws/case
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog"),  # byte-identical to 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups(self, docs):
        groups = dedup.exact_dup_groups(docs).collect()
        sizes = sorted(r["n_docs"] for r in groups)
        assert sizes == [1, 1, 3]
        big = next(r for r in groups if r["n_docs"] == 3)
        assert big["keeper"] == 1 and big["doc_ids"] == [1, 2, 5]

    def test_drop_keeps_min_id(self, docs):
        kept = dedup.drop_exact_duplicates(docs)
        assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
        assert kept.columns == docs.columns  # schema preserved


class TestMinHash:
    def test_signature_shape_and_determinism(self, docs):
        sig = dedup.minhash_signatures(docs, k=8)
        rows = {r["doc_id"]: r for r in sig.collect()}
        assert len(rows) == 5
        # identical docs → identical signatures
        assert tuple(rows[1])[1:] == tuple(rows[5])[1:]
        # near-dup shares most of the signature
        same = sum(rows[1][f"h{i}"] == rows[3][f"h{i}"] for i in range(8))
        assert same >= 4

    def test_lsh_finds_exact_and_near_dups(self, docs):
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_lsh_pairs(docs, k=12, bands=3).collect()
        }
        assert (1, 5) in pairs and (1, 2) in pairs
        assert not any(4 in p for p in pairs)


class TestSimHash:
    def test_near_pairs(self, docs):
        sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        assert sig[1] == sig[5] == sig[2]  # same tokens → same simhash
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup.simhash_near_pairs(docs, max_hamming=10).collect()
        }
        assert pairs[(1, 5)] == 0
        assert not any(4 in p for p in pairs)


class TestNgramJaccard:
    def test_thresholds(self, docs):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert pairs[(1, 5)] == 1.0
        assert 0.5 <= pairs[(1, 3)] < 1.0
        assert not any(4 in p for p in pairs)


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_brute_force_topk(self, emb):
        out = similarity.brute_force_topk(
            emb.filter(F.col("vec_id") < 3), emb, k=4
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {0, 1, 2}
        for q, rows in by_q.items():
            assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4]
            sims = [r["cos_sim"] for r in sorted(rows, key=lambda r: r["rank"])]
            assert sims == sorted(sims, reverse=True)
            assert all(r["neighbor_id"] != q for r in rows)
            assert all(-1.001 <= r["cos_sim"] <= 1.001 for r in rows)

    def test_lsh_subset_of_bruteforce_candidates(self, emb):
        """Bucketed ANN only returns same-bucket neighbors, and its top-1
        sim never exceeds the exact top-1."""
        exact = {
            r["query_id"]: r["cos_sim"]
            for r in similarity.brute_force_topk(
                emb.filter(F.col("vec_id") < 5), emb, k=1
            ).collect()
        }
        approx = {
            r["query_id"]: r["cos_sim"]
            for r in similarity.lsh_bucketed_topk(
                emb.filter(F.col("vec_id") < 5), emb, k=1
            ).collect()
        }
        for q, sim in approx.items():
            assert sim <= exact[q] + 1e-12

    def test_kmeans_bank_tier_matches_literal_tier(self, emb):
        """The broadcast-data-bank assignment (large k×dims) must be
        bit-identical to the compiled-literal assignment — same integer
        squared-L2, same lowest-id tiebreak — on every row, for both the
        in-loop updates and the final labels."""
        sub = emb.filter(F.col("vec_id") < 300)
        lit = similarity.kmeans_assign(sub, k=8, rounds=2, literal_cells_max=10**9)
        bank = similarity.kmeans_assign(sub, k=8, rounds=2, literal_cells_max=0)
        assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, bank.collect()))

    def test_power_iteration_matches_numpy_trajectory(self, emb):
        """The quantized direction after r rounds must align (cos >
        0.999) with float numpy running the SAME r power-iteration
        rounds from the same ones start — pins the SEMANTIC claim (it
        really computes v ← XᵀXv), which the cross-engine oracle alone
        can't (both engines could agree on a wrong formula). Alignment
        with the true eigenvector is NOT asserted: the synthetic
        embeddings have a near-flat spectrum (λ₁/λ₂ ≈ 1.02), so any
        fixed round count is far from converged on this data — the
        operator contract is the iterate, convergence is the caller's
        spectral-gap-dependent dial."""
        import numpy as np

        sub = emb.filter(F.col("vec_id") < 200)
        rounds = 3
        out = similarity.power_iteration_top_component(
            sub, rounds=rounds
        ).collect()
        v = np.array(
            [r["component"] for r in sorted(out, key=lambda r: r["d"])],
            dtype=float,
        )
        x = np.array(
            [
                np.floor(np.asarray(r["embedding"], dtype=float) * 1024.0)
                for r in sub.select("embedding").collect()
            ]
        )
        ref = np.ones(x.shape[1])
        for _ in range(rounds):
            ref = x.T @ (x @ ref)
            ref = ref / np.max(np.abs(ref))
        cos = abs(v @ ref) / (np.linalg.norm(v) * np.linalg.norm(ref))
        assert cos > 0.999
        assert int(np.max(np.abs(v))) == 1024  # quantized to ±scale

    def test_semantic_dedup_matches_bruteforce(self, emb):
        """Every emitted drop must be reproducible by brute force from
        the operator's own cluster assignment: n_dups = the exact count
        of lower-id clustermates at cos ≥ τ, dup_of = the lowest such id,
        and no qualifying vector may be missing from the drop list."""
        import numpy as np

        sub = emb.filter(F.col("vec_id") < 200)
        tau = 0.35
        drops = {
            r["vec_id"]: (r["dup_of"], r["n_dups"])
            for r in similarity.semantic_dedup_drops(
                sub, k=8, rounds=2, threshold=tau
            ).collect()
        }
        assign = similarity.kmeans_assign(
            sub, k=8, rounds=2, with_vec=True
        ).collect()
        by_cluster: dict[int, list] = {}
        for r in assign:
            by_cluster.setdefault(r["cluster"], []).append(
                (r["vec_id"], np.asarray(r["qv"], dtype=float))
            )
        expect = {}
        for members in by_cluster.values():
            members.sort()
            for i, (vid, v) in enumerate(members):
                near = [
                    kid
                    for kid, kv in members[:i]
                    if float(v @ kv)
                    / float(np.sqrt((v @ v) * (kv @ kv)))
                    >= tau
                ]
                if near:
                    expect[vid] = (min(near), len(near))
        assert drops == expect
        assert expect  # fixture must actually exercise the drop path

    def test_kmeans_bank_tier_is_lazy(self, emb, spark):
        """r10 verdict #3: the Lloyd loop must keep model state IN-PLAN
        (1-row bank broadcasts between rounds, the sim_power_iteration
        shape) — building the assignment DataFrame may run only the
        1-row dims probe, never a per-round centroid collect."""
        store = spark._jsparkSession.sharedState().statusStore()
        before = store.executionsList().size()
        df = similarity.kmeans_assign(
            emb.filter(F.col("vec_id") < 100), k=8, rounds=3
        )
        after = store.executionsList().size()
        # exactly the dims probe — 3 Lloyd rounds add ZERO executions
        assert after - before <= 1, (
            f"kmeans_assign ran {after - before} jobs at build time — "
            "the Lloyd loop collected driver state again"
        )
        assert df.count() == 100  # still computes when asked

    def test_kmeans_bank_tier_plan_is_k_independent(self, emb):
        """At curation-scale k the plan must NOT carry the centroid bank
        as literals: the bank rides a broadcast join, so plan size is
        O(1) in k and analysis/codegen cannot blow up (r5 verdict #2)."""
        sub = emb.filter(F.col("vec_id") < 50)
        plan_k64 = similarity.kmeans_assign(
            sub, k=64, rounds=0, literal_cells_max=0
        )._jdf.queryExecution().optimizedPlan().toString()
        plan_k8 = similarity.kmeans_assign(
            sub, k=8, rounds=0, literal_cells_max=0
        )._jdf.queryExecution().optimizedPlan().toString()
        assert abs(len(plan_k64) - len(plan_k8)) < 500
        assert "Join" in plan_k64

    def test_kmeans_bank_tier_rounds_bound_enforced(self, emb):
        """ADVICE r11: the ≤4-round lazy-tier contract is enforced, not
        docstring convention — plan text doubles per round, so rounds=10
        through the bank tier would be exponential blowup. The literal
        tier (explicit opt-in) accepts high rounds."""
        import pytest

        sub = emb.filter(F.col("vec_id") < 50)
        with pytest.raises(ValueError, match="rounds=5 exceeds"):
            similarity.kmeans_assign(sub, k=8, rounds=5)
        # boundary round count builds fine (lazy — no execution here)
        similarity.kmeans_assign(
            sub, k=8, rounds=similarity.KMEANS_BANK_ROUNDS_MAX
        )
        # eager literal tier remains the documented high-round path
        similarity.kmeans_assign(
            sub, k=2, rounds=5, literal_cells_max=10**9
        )


class TestMultimodal:
    def test_feature_extraction_batches(self, docs):
        feats = multimodal.extract_features(multimodal.with_binary_payload(docs))
        rows = {r["doc_id"]: r for r in feats.collect()}
        assert len(rows) == 5
        r1 = rows[1]
        text = "the quick brown fox jumps over the lazy dog"
        assert r1["byte_len"] == len(text.encode())
        import hashlib

        assert r1["content_md5"] == hashlib.md5(text.encode()).hexdigest()
        assert r1["first_byte"] == ord("t")
        assert r1["fake_width"] == len(text) % 640

    def test_real_decode_is_stubbed(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")

    def test_payload_schema(self, docs):
        b = multimodal.with_binary_payload(docs)
        assert dict(b.dtypes)["payload"] == "binary"
        assert dict(b.dtypes)["meta"].startswith("struct<mime:string")


class TestTextFunctions:
    def test_lang_id_picks_stopword_language(self, spark):
        from kafka_processor_cosmos_tx_dispatch_spark.functions import text as TX

        df = spark.createDataFrame(
            [
                (1, "the cat is in the house and it was big"),
                (2, "el perro es de la casa y los gatos"),
                (3, "der hund ist von der stadt und das haus"),
                (4, "xyzzy plugh frobozz"),
            ],
            "id long, text string",
        )
        out = {
            r["id"]: r["lang"]
            for r in df.select(
                "id", TX.lang_id(TX.tokens(F.col("text"))).alias("lang")
            ).collect()
        }
        assert out == {1: "en", 2: "es", 3: "de", 4: "und"}

    def test_shingles_guard_short_docs(self, spark):
        from kafka_processor_cosmos_tx_dispatch_spark.functions import text as TX

        df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], "id long, text string")
        out = {
            r["id"]: r["sh"]
            for r in df.select(
                "id", TX.word_shingles(TX.tokens(F.col("text")), 3).alias("sh")
            ).collect()
        }
        assert out[1] == []
        assert out[2] == ["a b c", "b c d"]


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation handles multi-hop chains (label must travel
    the full diameter), cliques, and disjoint pairs."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    """A 120-node chain: the accelerated (pointer-jump) loop must find
    the true minimum despite diameter >> a naive round budget, within
    max_iterations=25 (2^25 ≫ 120 via doubling)."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(121)}


def test_connected_components_twolevel_matches_iterative(spark):
    """Two-level (partition-local union-find + linker-graph loop) must
    produce identical clusters to the pure iterative operator — on a
    seeded random graph, both single-partition (linker empty) and with
    edges_per_partition forced tiny so the cross-partition linker path
    does the merging."""
    import random

    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        connected_components,
        connected_components_twolevel,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = {
        r["doc_id"]: r["component"] for r in connected_components(pairs).collect()
    }
    one_part = {
        r["doc_id"]: r["component"]
        for r in connected_components_twolevel(pairs).collect()
    }
    assert one_part == want
    # 250 edges / 16 per partition → ~16 partitions: every merge crosses
    # partitions, so the linker graph + global loop carry the result
    multi_part = {
        r["doc_id"]: r["component"]
        for r in connected_components_twolevel(
            pairs, edges_per_partition=16
        ).collect()
    }
    assert multi_part == want


def test_connected_components_twolevel_empty(spark):
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        connected_components_twolevel,
    )

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components_twolevel(pairs).count() == 0


def test_pack_sequences_matches_bruteforce(spark):
    """Distributed-scan packing == naive python prefix-sum packing,
    including across bucket boundaries (range_size smaller than the doc
    count so multiple buckets are exercised)."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.sampling import (
        pack_sequences,
    )

    sizes = [(i, 7 + (i * 13) % 90) for i in range(200)]
    df = spark.createDataFrame(sizes, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["bin"], r["bin_pos"])
        for r in pack_sequences(df, "n_tokens", budget=100, range_size=16).collect()
    }
    cum, want, per_bin = 0, {}, {}
    for i, n in sizes:
        b = cum // 100
        per_bin[b] = per_bin.get(b, 0) + 1
        want[i] = (b, per_bin[b])
        cum += n
    assert got == want


def test_hash_split_is_stable_and_partitioned(spark):
    """Every doc gets exactly one split; assignment is identical across
    invocations (no rand())."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.sampling import hash_split

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert a == b and len(a) == 500
    assert set(a.values()) == {"train", "val", "test"}


def test_triangle_count_known_graph(spark):
    """K4 (every node in C(3,2)=3 triangles, 4 total) plus a disjoint
    path (no triangles) — exact per-node counts, path nodes absent."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(10, 11), (11, 12), (12, 13)]
    edges = spark.createDataFrame(k4 + path, "s1 long, s2 long")
    out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pq_adc_matches_numpy_reconstruction(spark, sf_dir):
    """PQ's adc_dist must equal the exact integer L2 between the query
    vector and the RECONSTRUCTION of the neighbor from its own codes —
    recomputed independently in numpy from pq_encode's output and the
    codebook formula. Pins that encode and ADC share one codebook and
    that the table lookup indexes the right subspace."""
    import numpy as np

    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sub = emb.filter(F.col("vec_id") < 60)
    out = pq_topk(sub.filter(F.col("vec_id") < 5), sub, k_out=3).collect()
    codes = {
        r["vec_id"]: [r[f"code_{m}"] for m in range(4)]
        for r in pq_encode(sub).collect()
    }
    vecs = {
        r["vec_id"]: np.floor(np.asarray(r["embedding"], dtype=float) * 1024.0)
        for r in sub.collect()
    }
    book = np.array(pq_codebook(64), dtype=float)  # (64, 16) entries
    assert out
    for r in out:
        recon = np.concatenate(
            [book[m * 16 + codes[r["neighbor_id"]][m]] for m in range(4)]
        )
        expect = int(((vecs[r["query_id"]] - recon) ** 2).sum())
        assert r["adc_dist"] == expect, (r, expect)


def test_triangle_count_matches_bruteforce_random(spark):
    """Randomized pin: on seeded Erdős–Rényi graphs the degree-oriented
    count must equal the itertools brute force exactly (per node)."""
    import itertools
    import random

    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        triangle_count,
    )

    rng = random.Random(42)
    for trial in range(3):
        n = 18
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.3
        ]
        adj = {frozenset(e) for e in edges}
        expect: dict[int, int] = {}
        for u, v, w in itertools.combinations(range(n), 3):
            if (
                frozenset((u, v)) in adj
                and frozenset((v, w)) in adj
                and frozenset((u, w)) in adj
            ):
                for x in (u, v, w):
                    expect[x] = expect.get(x, 0) + 1
        got = {
            r["node"]: r["n_triangles"]
            for r in triangle_count(
                spark.createDataFrame(edges, "s1 long, s2 long")
            ).collect()
        }
        assert got == expect, f"trial {trial}"


def test_bpe_chained_replace_equals_canonical_application():
    """text_bpe_encode's equivalence envelope, pinned: applying the
    ordered merge table via single-pass global replaces over the
    DELIMITER-WRAPPED symbol stream equals canonical BPE application
    (left-to-right, non-overlapping, one merge fully applied before
    the next) for the corpus vocabulary AND adversarial shared-prefix
    words like 'other' — where an UNdelimited space-separated stream
    diverges ('th e' matches inside 'th er</w>'; the first shipped
    formulation had exactly that bug, caught by this test). The one
    residual divergence is an immediately-adjacent repeat of the same
    pair (demonstrated below on 'erer') — fine for a deterministic
    tokenizer, documented in the query docstring."""
    import duckdb

    from kafka_processor_cosmos_tx_dispatch_spark.queries import _BPE_MERGES

    def canonical(word):
        syms = list(word) + ["</w>"]
        for a, b in _BPE_MERGES:
            pa = a.split(" ")
            out, i = [], 0
            while i < len(syms):
                if i + len(pa) <= len(syms) and syms[i : i + len(pa)] == pa:
                    out.append(b)
                    i += len(pa)
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def chained(word):
        s = "|" + "|".join(list(word)) + "|</w>|"
        for a, b in _BPE_MERGES:
            s = s.replace("|" + a.replace(" ", "|") + "|", f"|{b}|")
        return s.split("|")[1:-1]

    con = duckdb.connect()
    vocab = {
        w
        for (w,) in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
        if w
    }
    con.close()
    vocab |= {"there", "other", "scanner", "joiner"}
    for w in sorted(vocab):
        assert canonical(w) == chained(w), w
    # the documented residual divergence: the same pair occurring at
    # immediately adjacent positions ("erer" -> (e,r)(e,r),
    # "ananas" -> (a,n)(a,n)) merges only the first occurrence per
    # pass in the chained form
    assert canonical("erer") == ["er", "er</w>"]
    assert chained("erer") == ["er", "e", "r", "</w>"]
    assert canonical("ananas") == ["an", "an", "a", "s", "</w>"]
    assert chained("ananas") == ["an", "a", "n", "a", "s", "</w>"]


def test_bigram_lm_survives_single_token_docs(spark):
    """r7 review finding, pinned: sequence(1, size-1) on a one-token doc
    is the DESCENDING [1, 0] array, so the unguarded bigram builder
    evaluated element_at(a, 0) and died under ANSI while the oracle
    returned no row. The CASE guard must make such docs (and empty
    text) silently absent, same as the oracle."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as q
    import pandas as pd

    fn = q._QUERIES["text_bigram_lm_score"]
    # run the registered query body against a substituted documents
    # table: monkeypatch load_table for this call via a temp view is
    # invasive — instead rebuild the same plan on a tiny frame by
    # reusing the registered function with a scratch sf_dir layout
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="bigram_edge_")
    docs = spark.createDataFrame(
        [
            (1, "singleword", "en", "s", 10),
            (2, "two tokens here make bigrams fine", "en", "s", 33),
            (3, "", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    out = fn(spark, d)
    got = {r["doc_id"]: r["n_bigrams"] for r in out.collect()}
    assert 1 not in got and 3 not in got
    assert got[2] == 5


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """The design point of ngram_containment_pairs: a short doc embedded
    verbatim in a much longer one has containment 1.0 but low Jaccard —
    the symmetric measure must NOT pair them at 0.9 while the
    containment measure must."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1
    assert cont[0]["doc_a"] == 1 and cont[0]["containment"] == 1.0
    assert ngram_jaccard_pairs(docs, threshold=0.9).count() == 0


def test_maxsim_hand_case(spark):
    """MaxSim on a hand-checkable corpus: two docs (labels), two query
    tokens; score = sum over tokens of the best cosine within the doc's
    vector group. Unit vectors on axes make the cosines 0/1 exactly."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        maxsim_multivector,
    )

    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0], 1),  # doc 1 has both axis-0 and axis-1
            (11, [0.0, 1.0, 0.0], 1),
            (20, [0.0, 0.0, 1.0], 2),  # doc 2 only axis-2
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["doc"]: r["maxsim"] for r in maxsim_multivector(q, corpus).collect()}
    # doc 1: best cos per token = 1.0 + 1.0; doc 2: 0.0 + 0.0
    assert got[1] == 2.0
    assert got[2] == 0.0


def test_range_search_threshold_boundary(spark):
    """Radius search returns exactly the neighbors at-or-above the
    threshold — including the equality boundary (cos of identical
    direction = 1.0 >= 1.0) — and never the query itself."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        range_search,
    )

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [2.0, 0.0]),   # same direction as query 0 → cos 1.0
            (2, [1.0, 1.0]),   # cos ≈ 0.707
            (3, [-1.0, 0.0]),  # cos -1
        ],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter("vec_id = 0")
    got = {
        r["neighbor_id"]: r["cos_sim"]
        for r in range_search(q, corpus, threshold=0.7).collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == 1.0
    assert 0 not in got


def test_bfs_hops_hand_graph(spark):
    """Level-synchronous BFS on a hand graph: path 1-2-3-4-5 with a
    shortcut 1-4; min-distance must win (node 4 is 1 hop via the
    shortcut, not 3), and nodes beyond the round bound are absent."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (5, 6), (6, 7)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"] for r in bfs_hops(edges, sources, rounds=2).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_labeled_per_seed_distances(spark):
    """Labeled BFS must keep per-SEED distances independent: on the
    path 1-2-3-4 with seeds {1, 4}, plain bfs_hops would report
    min-over-set (node 2 at dist 1), but the labeled form must report
    dist(1→2)=1 AND dist(4→2)=2 as separate rows — that independence
    is exactly what the closeness sums need."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        bfs_hops_labeled,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in bfs_hops_labeled(edges, seeds, rounds=2).collect()
    }
    assert got == {
        (1, 1): 0, (1, 2): 1, (1, 3): 2,
        (4, 4): 0, (4, 3): 1, (4, 2): 2,
    }


def test_pca_top2_matches_integer_reference_and_is_orthogonal(spark, sf_dir):
    """pca_top2_components vs a pure-Python integer re-implementation of
    the same algorithm (bit-exact), plus the semantic claim: the two
    quantized directions must be near-orthogonal (|cos| < 0.15 — the
    deflation's whole point) and component1 must equal the registered
    single-component power iteration."""
    import math

    from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r["d"]: (r["component1"], r["component2"])
        for r in similarity.pca_top2_components(emb, rounds=2).collect()
    }
    X = [
        [int(math.floor(x * 1024.0)) for x in r["embedding"]]
        for r in emb.collect()
    ]

    def pi(rows, rounds=2, scale=1024):
        dims = len(rows[0])
        v = [1] * dims
        for _ in range(rounds):
            s = [0] * dims
            for x in rows:
                xv = sum(a * b for a, b in zip(x, v))
                for d in range(dims):
                    s[d] += x[d] * xv
            m = max(abs(t) for t in s)
            v = [(-1 if t < 0 else 1) * (abs(t) * scale // m) for t in s]
        return v

    v1 = pi(X)
    ssq = sum(t * t for t in v1)
    X2 = []
    for x in X:
        xv = sum(a * b for a, b in zip(x, v1))
        raw = [x[d] * ssq - xv * v1[d] for d in range(len(x))]
        X2.append([-((-y) >> 27) if y < 0 else y >> 27 for y in raw])
    v2 = pi(X2)
    assert got == {d: (v1[d], v2[d]) for d in range(len(v1))}
    dot = sum(a * b for a, b in zip(v1, v2))
    n1 = math.sqrt(sum(a * a for a in v1))
    n2 = math.sqrt(sum(b * b for b in v2))
    assert abs(dot / (n1 * n2)) < 0.15
    c1_reg = {
        r["d"]: r["component"]
        for r in similarity.power_iteration_top_component(
            emb, rounds=2
        ).collect()
    }
    assert c1_reg == {d: v1[d] for d in range(len(v1))}


def test_bfs_labeled_min_over_seeds_equals_set_bfs(spark):
    """Identity pinning the two BFS forms against each other: the
    min-over-seeds of the labeled distances must equal the source-SET
    distances of plain bfs_hops on the same graph/rounds (set-BFS is
    the union of per-seed BFS by definition of min-hops)."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        bfs_hops,
        bfs_hops_labeled,
    )

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23) for i in range(23)] + [(2, 19), (5, 11)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (7,), (14,)], "node long")
    set_d = {
        r["node"]: r["dist"]
        for r in bfs_hops(edges, seeds, rounds=3).collect()
    }
    lab = {}
    for r in bfs_hops_labeled(edges, seeds, rounds=3).collect():
        lab[r["node"]] = min(lab.get(r["node"], 99), r["dist"])
    assert lab == set_d


def test_misra_gries_superset_guarantee_under_eviction(spark):
    """Force eviction (k=3 counters, 8 distinct keys per partition) and
    pin the MG contract: every key with global count > n/(k+1) survives
    in the candidate union. Key 'hot' is 40% of the stream; the uniform
    tail churns the counters."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.sketches import (
        misra_gries_candidates,
    )

    rows = []
    for i in range(1000):
        rows.append(("hot",) if i % 5 < 2 else (f"cold{i % 8}",))
    df = spark.createDataFrame(rows, "k string").repartition(4)
    cands = {
        r["k"] for r in misra_gries_candidates(df, "k", k=3).collect()
    }
    assert "hot" in cands
    # candidate set is partition-bounded: ≤ partitions * k
    assert len(cands) <= 4 * 3


def test_cusum_closed_form_equals_recursion(spark):
    """The relational CUSUM uses the identity
    s_i = R_i − min_{j≤i} R_j  ==  s_i = max(0, s_{i−1} + (x_i − t))
    — pin it against the direct recursion on a hypothesis-style sweep
    of adversarial integer series (all-below-target, all-above, sign
    flips, zeros)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    series = [
        [5, 5, 5, 5],
        [0, 0, 9, 9, 0, 0],
        [10, -3, 4, -20, 8, 8, 8],
        [1],
        [3, 3, 2, 9, 1, 7, 0, 0, 12, 4],
    ]
    for xs in series:
        t = sum(xs) // len(xs)
        # direct recursion
        want, s = [], 0
        for x in xs:
            s = max(0, s + (x - t))
            want.append(s)
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "i long, x long"
        )
        w = W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
        r = df.withColumn("run", F.sum(F.col("x") - F.lit(t)).over(w))
        got = [
            row["cusum"]
            for row in r.select(
                "i",
                (
                    F.col("run") - F.least(F.min("run").over(w), F.lit(0))
                ).alias("cusum"),
            )
            .orderBy("i")
            .collect()
        ]
        assert got == want, (xs, got, want)


def test_mixture_schedule_prefix_proportionality(spark, sf_dir):
    """The stride-schedule guarantee: over any prefix, each language's
    share tracks its weight within ~1 stride (the property multinomial
    sampling has only in expectation). Checked at two prefixes."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as q

    rows = (
        q._QUERIES["sample_mixture_schedule"](spark, sf_dir)
        .orderBy("position")
        .collect()
    )
    weights = {"en": 4, "de": 2, "fr": 2, "es": 1, "zh": 1}
    total_w = sum(weights.values())
    for k in (30, 60):
        prefix = [r["lang"] for r in rows[:k]]
        for lang, w in weights.items():
            want = k * w / total_w
            got = prefix.count(lang)
            assert abs(got - want) <= 2.0, (k, lang, got, want)


def test_fuzzy_join_symdel_exact_recall(spark, sf_dir):
    """The symmetric-delete guarantee: every deterministically corrupted
    name (one char deleted) must re-find its source customer at
    distance 1 — deletion neighborhoods intersect whenever dist <= 1,
    so recall at this distance is exact, not probabilistic."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as q

    rows = q._QUERIES["q_fuzzy_join_symdel"](spark, sf_dir).collect()
    matches = {(r["dirty_id"], r["c_custkey"]) for r in rows}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    expected_ids = [
        r["c_custkey"]
        for r in cust.filter(F.col("c_custkey") % 3 == 0).collect()
    ]
    assert expected_ids, "fixture empty"
    for cid in expected_ids:
        assert (cid, cid) in matches, f"corruption of {cid} not recalled"


def test_skyline_handles_ties_and_duplicates(spark):
    """Dominance edge cases pinned against brute force: equal-x ties
    (smaller y dominates), equal-y ties (smaller x dominates), exact
    duplicate points (do NOT dominate each other — survive with
    n_dups), and interior points (dominated on both axes)."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.skyline import (
        skyline_2d,
    )

    rows = [
        (1, 1.0, 5),   # frontier
        (2, 1.0, 7),   # dominated: same x, bigger y
        (3, 2.0, 3),   # frontier
        (4, 3.0, 3),   # dominated: same y, bigger x
        (5, 2.0, 3),   # duplicate of 3 → same frontier point
        (6, 5.0, 4),   # interior, dominated by (2.0, 3)
        (7, 4.0, 1),   # frontier
    ]
    df = spark.createDataFrame(rows, "pid long, x double, y int")

    def brute(pts):
        out = []
        for pid, x, y in pts:
            if not any(
                (qx <= x and qy <= y and (qx < x or qy < y))
                for _, qx, qy in pts
            ):
                out.append((x, y))
        return set(out)

    got = {
        (r["x"], r["y"], r["pid"], r["n_dups"])
        for r in skyline_2d(df.repartition(3), "x", "y", "pid").collect()
    }
    assert {(x, y) for x, y, *_ in got} == brute(rows)
    assert (2.0, 3, 3, 2) in got  # duplicate survives, min-id rep, count 2


def test_skyline_random_sets_match_bruteforce(spark):
    """Property sweep: on deterministic pseudo-random point sets (with
    forced duplicates and axis ties), the distributed skyline must
    equal brute force regardless of partitioning."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.skyline import (
        skyline_2d,
    )

    def lcg(seed):
        x = seed
        while True:
            x = (1103515245 * x + 12345) % (1 << 31)
            yield x

    for seed, n, nparts in ((7, 60, 5), (23, 120, 3), (99, 40, 13)):
        g = lcg(seed)
        pts = [
            (i, float(next(g) % 17), int(next(g) % 11)) for i in range(n)
        ]
        df = spark.createDataFrame(pts, "pid long, x double, y int")
        frontier = {
            (x, y)
            for _, x, y in pts
            if not any(
                qx <= x and qy <= y and (qx < x or qy < y)
                for _, qx, qy in pts
            )
        }
        got = {
            (r["x"], r["y"])
            for r in skyline_2d(
                df.repartition(nparts), "x", "y", "pid"
            ).collect()
        }
        assert got == frontier, (seed, got ^ frontier)


def test_exact_substring_pairs_hand_corpus(spark):
    """Pin the ExactSubstr contract on a hand corpus: (a) a verbatim
    8-token run IS detected with the exact overlap length, (b) a 7-token
    shared run is NOT a pair, (c) a shingle above the doc-frequency cap
    anchors nothing, and (d) two separate shared runs report the LONGEST
    as overlap_tokens with both counted in n_anchors."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        exact_substring_pairs,
    )

    run10 = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"  # 10 tokens
    run7 = "s1 s2 s3 s4 s5 s6 s7"  # below min_tokens=8
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"  # in ALL docs -> df over cap
    run8 = "u1 u2 u3 u4 u5 u6 u7 u8"  # second shared run for (d)
    docs = spark.createDataFrame(
        [
            (0, f"{boiler} alpha {run10} beta {run8}"),
            (1, f"gamma {run10} delta {boiler} epsilon {run8}"),
            (2, f"{run7} zeta {boiler} eta unique2 words2 here2"),
            (3, f"theta {run7} {boiler} iota unique3 words3 also3"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in exact_substring_pairs(
            docs, min_tokens=8, max_shingle_df=3
        ).collect()
    }
    # (b)+(c): docs 2,3 share only run7 (<8 tokens) and boiler (df=4>cap)
    assert set(got) == {(0, 1)}
    r = got[(0, 1)]
    # (a)+(d): longest run is the 10-token one; anchors = 3 shingles of
    # run10 (positions 1..3 of a 10-token run) + 1 shingle of run8
    assert r["overlap_tokens"] == 10
    assert r["n_anchors"] == 4


def test_bpe_train_matches_reference_trainer(spark):
    """Pin text_bpe_train's learned merge table against a from-scratch
    reference BPE trainer (Sennrich-style get_stats/merge loop with the
    engine's deterministic tiebreak: count DESC, pair-string ASC) on a
    toy corpus inside the adjacent-repeat equivalence envelope the
    operator documents."""
    import os
    import tempfile
    from collections import Counter

    import kafka_processor_cosmos_tx_dispatch_spark.queries as q

    corpus = [
        "the cat sat on the mat",
        "the cats eat fresh fish",
        "that hat on the mat is flat",
        "the theme of the thesis",
    ]

    def ref_bpe(texts: list[str], iters: int):
        wf = Counter(w for t in texts for w in t.split(" ") if w)
        vocab = {w: list(w) + ["</w>"] for w in wf}
        merges = []
        for _ in range(iters):
            stats: Counter = Counter()
            for w, f in wf.items():
                s = vocab[w]
                for i in range(len(s) - 1):
                    stats[f"{s[i]} {s[i + 1]}"] += f
            pair, cnt = min(
                stats.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merges.append((pair, cnt))
            a, b = pair.split(" ")
            for w in vocab:
                s, out, i = vocab[w], [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                vocab[w] = out
        return merges

    expected = ref_bpe(corpus, 4)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)],
            "doc_id long, text string",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        got = [
            (r["merge_pair"], r["cnt"])
            for r in q.queries()["text_bpe_train"](spark, d)
            .orderBy("it")
            .collect()
        ]
    assert got == expected


def test_exact_substring_spans_merge_and_coverage(spark):
    """Pin the span-merge contract: two overlapping verbatim runs in one
    document merge into ONE interval; a disjoint run stays separate;
    coverage counts merged tokens exactly once (all-integer milli)."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        exact_substring_spans,
    )

    r1 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"  # 10 tokens
    r2 = "b1 b2 b3 b4 b5 b6 b7 b8"  # 8 tokens
    # doc 0: r1 at pos 0..9 and r2 at pos 12..19 (gap of 2 -> 2 spans);
    # doc 1 shares r1; doc 2 shares r2
    docs = spark.createDataFrame(
        [
            (0, f"{r1} x0 y0 {r2}"),  # 20 tokens
            (1, f"p1 p2 {r1} q1 q2 q3 q4 q5 q6 q7 q8"),  # 20 tokens
            (2, f"{r2} z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"),  # 20 toks
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in exact_substring_spans(
            docs, min_tokens=8, max_shingle_df=8
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    # doc 0: spans [0,9] (10 toks, from r1) and [12,19] (8 toks, r2)
    assert got[0]["n_spans"] == 2
    assert got[0]["covered_tokens"] == 18
    assert got[0]["n_tokens"] == 20
    assert got[0]["coverage_milli"] == 900
    # docs 1 and 2: one span each
    assert got[1]["n_spans"] == 1 and got[1]["covered_tokens"] == 10
    assert got[2]["n_spans"] == 1 and got[2]["covered_tokens"] == 8


def test_mutual_knn_margin_matches_numpy(spark):
    """Mutual top-1 set and margin scores vs a numpy brute-force mining
    of the same fixed-point cosines (k=2 so the top-k sums exercise the
    pivot), including a hub vector that must be margin-demoted."""
    import numpy as np

    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        mutual_knn_margin,
    )

    rng = np.random.default_rng(7)
    A = rng.normal(size=(6, 8)).astype("float32")
    B = rng.normal(size=(6, 8)).astype("float32")
    B[5] = 0.05 * rng.normal(size=8).astype("float32")  # near-zero hub-ish
    rows_a = [(i, [float(x) for x in A[i]]) for i in range(6)]
    rows_b = [(10 + i, [float(x) for x in B[i]]) for i in range(6)]
    schema = "vec_id long, embedding array<float>"
    k = 2

    def fixed_cos(u, v):
        s = float(1 << 20)
        d = sum(int(np.floor(float(x) * float(y) * s)) for x, y in zip(u, v))
        nu = sum(int(np.floor(float(x) * float(x) * s)) for x in u)
        nv = sum(int(np.floor(float(y) * float(y) * s)) for y in v)
        return (d / s) / np.sqrt((nu / s) * (nv / s))

    cos = np.array(
        [[fixed_cos(A[i], B[j]) for j in range(6)] for i in range(6)]
    )
    want = {}
    for i in range(6):
        j = int(np.lexsort((np.arange(6), -cos[i]))[0])
        if int(np.lexsort((np.arange(6), -cos[:, j]))[0]) != i:
            continue
        s_a = sum(sorted(cos[i], reverse=True)[:k])
        s_b = sum(sorted(cos[:, j], reverse=True)[:k])
        want[(i, 10 + j)] = 2 * k * cos[i, j] / (s_a + s_b)

    got = {
        (r["vec_a"], r["vec_b"]): r["margin"]
        for r in mutual_knn_margin(
            spark.createDataFrame(rows_a, schema),
            spark.createDataFrame(rows_b, schema),
            k=k,
        ).collect()
    }
    assert set(got) == set(want)
    for pair in want:
        assert abs(got[pair] - want[pair]) < 1e-9, pair


def test_mmr_rerank_matches_greedy_reference(spark):
    """MMR selection vs a plain-Python greedy reference on the same
    fixed-point cosines: positions, picks and scores must agree, and the
    diversity penalty must actually change the order vs pure relevance
    (the test corpus plants two near-identical top candidates)."""
    import numpy as np

    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        mmr_rerank,
    )

    # Engineered geometry (3-D): v1 is an exact near-dup of v0, v2 is
    # relevant on the other side of the query, v3 is slightly less
    # relevant but diverse. Pure relevance ranks the dup 2nd; MMR must
    # demote it below v2 AND v3 (penalty ≈ 1 vs their ≈ 0.79/0.87).
    base = {
        0: [0.95, 0.31, 0.0],
        1: [0.95, 0.31, 0.001],  # near-dup of v0
        2: [0.94, -0.34, 0.0],
        3: [0.92, 0.0, -0.392],
        4: [0.30, 0.80, 0.50],  # low-relevance fillers
        5: [0.25, -0.70, 0.60],
    }
    q = [1.0, 0.0, 0.0]
    rows = [(100, q)] + [(i, v) for i, v in base.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lam, kc, ks = 0.75, 6, 4

    def fixed_cos(u, v):
        s = float(1 << 20)
        d = sum(int(np.floor(float(x) * float(y) * s)) for x, y in zip(u, v))
        nu = sum(int(np.floor(float(x) * float(x) * s)) for x in u)
        nv = sum(int(np.floor(float(y) * float(y) * s)) for y in v)
        return (d / s) / np.sqrt((nu / s) * (nv / s))

    rel = {i: fixed_cos(q, base[i]) for i in base}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:kc]
    sim = {
        (i, j): fixed_cos(base[i], base[j])
        for i in cand
        for j in cand
        if i != j
    }
    selected, want = [], {}
    for pos in range(1, ks + 1):
        pool = [c for c in cand if c not in selected]
        if pos == 1:
            scores = {c: lam * rel[c] for c in pool}
        else:
            scores = {
                c: lam * rel[c]
                - (1 - lam) * max(sim[(c, s)] for s in selected)
                for c in pool
            }
        pick = min(scores, key=lambda c: (-scores[c], c))
        selected.append(pick)
        want[pos] = (pick, scores[pick])

    got = {
        r["position"]: (r["neighbor_id"], r["score"])
        for r in mmr_rerank(
            df.filter(F.col("vec_id") == 100),
            df.filter(F.col("vec_id") < 100),
            k_candidates=kc,
            k_select=ks,
            lam=lam,
        ).collect()
    }
    assert set(got) == set(want)
    for pos in want:
        assert got[pos][0] == want[pos][0], pos
        assert abs(got[pos][1] - want[pos][1]) < 1e-9, pos
    # diversity must actually reorder: the MMR pick sequence differs
    # from the pure-relevance top-ks (the planted near-dup gets demoted
    # below a less-relevant-but-diverse candidate)
    picks = [got[p][0] for p in sorted(got)]
    assert picks != cand[:ks]


def test_perplexity_buckets_partition_properties(spark, sf_dir):
    """Per language: NTILE(3) bucket sizes differ by ≤1, every head
    score ≥ every tail score, and kept == (bucket != tail)."""
    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        sample_perplexity_buckets,
    )

    rows = sample_perplexity_buckets(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
        assert r["kept"] == (1 if r["bucket"] in ("head", "middle") else 0)
    for lang, rs in by_lang.items():
        sizes = {b: sum(1 for r in rs if r["bucket"] == b)
                 for b in ("head", "middle", "tail")}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        heads = [r["avg_fp"] for r in rs if r["bucket"] == "head"]
        tails = [r["avg_fp"] for r in rs if r["bucket"] == "tail"]
        if heads and tails:
            assert min(heads) >= max(tails), lang


def test_kcenter_coreset_matches_greedy_reference(spark):
    """k-center picks and coverage scores vs a plain-Python greedy on
    the same fixed-point cosines, plus the diversity property: the
    second pick must be the LEAST similar vector to the seed, not its
    nearest neighbor."""
    import numpy as np

    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        kcenter_coreset,
    )

    rng = np.random.default_rng(3)
    X = rng.normal(size=(12, 6)).astype("float32")
    X[1] = X[0] + 0.01 * rng.normal(size=6).astype("float32")  # near-dup of seed
    rows = [(i, [float(x) for x in X[i]]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = 5

    def fixed_cos(u, v):
        s = float(1 << 20)
        d = sum(int(np.floor(float(x) * float(y) * s)) for x, y in zip(u, v))
        nu = sum(int(np.floor(float(x) * float(x) * s)) for x in u)
        nv = sum(int(np.floor(float(y) * float(y) * s)) for y in v)
        return (d / s) / np.sqrt((nu / s) * (nv / s))

    pen = {i: -2.0 for i in range(12)}
    taken, want = set(), {}
    for pos in range(1, k + 1):
        pick = min(
            (i for i in range(12) if i not in taken),
            key=lambda i: (pen[i], i),
        )
        want[pos] = (pick, None if pen[pick] == -2.0 else pen[pick])
        taken.add(pick)
        for i in range(12):
            pen[i] = max(pen[i], fixed_cos(X[i], X[pick]))

    got = {
        r["position"]: (r["vec_id"], r["cover_cos"])
        for r in kcenter_coreset(df, k=k).collect()
    }
    assert set(got) == set(want)
    for pos in want:
        assert got[pos][0] == want[pos][0], pos
        if want[pos][1] is None:
            assert got[pos][1] is None
        else:
            assert abs(got[pos][1] - want[pos][1]) < 1e-9, pos
    # seed is min-id (0); its planted near-dup (1) must NOT be pick 2
    assert got[1][0] == 0
    assert got[2][0] != 1


def test_scene_cuts_flags_planted_transition(spark):
    """A payload built from two runs of constant bytes must yield
    exactly one cut — at the frame where the runs meet — with exact
    integer deltas and is_cut false on frame 0."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.multimodal import (
        frame_features,
        with_binary_payload,
    )
    from kafka_processor_cosmos_tx_dispatch_spark.queries import _SCENE_CUT_TH

    text = "a" * 64 + "z" * 64  # feat jumps by 32*(ord(z)-ord(a)) = 800
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    feats = frame_features(with_binary_payload(df), frame=32).collect()
    assert [r["feat"] for r in sorted(feats, key=lambda r: r["frame_idx"])] == [
        32 * ord("a"),
        32 * ord("a"),
        32 * ord("z"),
        32 * ord("z"),
    ]
    deltas = [0, 0, 800, 0]
    cuts = [abs(d) > _SCENE_CUT_TH for d in deltas]
    assert cuts == [False, False, True, False]


def test_epoch_repeats_mean_is_exact_rational(spark, sf_dir):
    """Per language, total copies must equal the exact rational epoch
    mass: n·(p DIV q) + number of ranks with (r−1) mod q < p mod q —
    i.e. |copies·q − n·p| < q — and the sub-1.0 language (es) must be a
    strict subsample (fewer rows out than in)."""
    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        _EPOCHS,
        sample_epoch_repeats,
    )

    out = sample_epoch_repeats(spark, sf_dir).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import load_table

    n_by_lang = {
        r["lang"]: r["count"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .collect()
    }
    for lang, (p, q) in _EPOCHS.items():
        n = n_by_lang[lang]
        assert abs(got.get(lang, 0) * q - n * p) < q, (lang, got.get(lang), n)
    assert got["es"] < n_by_lang["es"]


def test_split_by_cluster_never_straddles_near_dups(spark, sf_dir):
    """Every near-dup pair must land in the SAME split (the property a
    per-doc hash split violates), and all three splits must be
    nonempty at the test sf."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        _LSH_MAX_BUCKET,
        _MINHASH_BANDS,
        _MINHASH_K,
        sample_split_by_cluster,
    )
    from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import load_table

    split = {
        r["doc_id"]: r["split"]
        for r in sample_split_by_cluster(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    ).collect()
    assert pairs, "test corpus should contain near-dup pairs"
    for r in pairs:
        assert split[r["doc_a"]] == split[r["doc_b"]], (r["doc_a"], r["doc_b"])
    assert {"train", "val", "test"} <= set(split.values())


def test_vad_spans_merge_adjacent_active_windows(spark, sf_dir):
    """Engineered payload: silence (spaces, mean square 1024) and
    speech ('z', 14884) windows around the 9850 threshold — adjacent
    active windows must merge into one span, and a lone active window
    must be dropped by the ≥2 rule."""
    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        multimodal_audio_vad_spans,
    )

    # windows: [sil][act][act][sil][act] (64 bytes each)
    text = " " * 64 + "z" * 128 + " " * 64 + "z" * 64
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="vad_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = multimodal_audio_vad_spans(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["span_start"], r["span_end"], r["n_windows"]) == (1, 2, 2)


def test_audio_windows_empty_payload_emits_no_rows(spark):
    """Empty payload: ceil(0/64)-1 = -1 and Spark's sequence(0,-1) is
    DESCENDING ([0,-1] — two phantom zero-length windows) while
    DuckDB's generate_series(0,-1) is empty. The guard must keep empty
    clips out of every windowed-audio query (r10 advice: an empty doc
    appeared in snr_gate output as silent_windows=2/kept=0 while the
    oracle emitted nothing)."""
    import tempfile

    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        multimodal_audio_snr_gate,
        multimodal_audio_vad_spans,
        pipeline_media_curate,
    )

    df = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),
            (2, "z" * 128, "en", "s", 128),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tempfile.mkdtemp(prefix="emptyaudio_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    snr = multimodal_audio_snr_gate(spark, d).collect()
    assert [r["doc_id"] for r in snr] == [2]
    vad = multimodal_audio_vad_spans(spark, d).collect()
    assert all(r["doc_id"] != 1 for r in vad)
    curated = pipeline_media_curate(spark, d).collect()
    assert all(r["doc_id"] != 1 for r in curated)


def test_assortativity_matches_numpy_pearson(spark, sf_dir):
    """Newman r from the engine vs numpy's Pearson over the same
    (out-degree, in-degree) edge series."""
    import numpy as np

    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        graph_assortativity,
    )
    from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import load_table
    from pyspark.sql import functions as FF

    r = graph_assortativity(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            FF.col("o_custkey").alias("src"),
            (FF.lit(10000000) + FF.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .collect()
    )
    outd, ind = {}, {}
    for e in edges:
        outd[e["src"]] = outd.get(e["src"], 0) + 1
        ind[e["dst"]] = ind.get(e["dst"], 0) + 1
    x = np.array([outd[e["src"]] for e in edges], dtype=float)
    y = np.array([ind[e["dst"]] for e in edges], dtype=float)
    want = np.corrcoef(x, y)[0, 1]
    assert r["n_edges"] == len(edges)
    assert abs(r["r_assort"] - want) < 1e-9


def test_ohlc_matches_pandas_resample(spark, sf_dir):
    """Batch OHLC vs a pandas groupby-first/last/max/min over the same
    hour buckets (ts, event_id ordering)."""
    import pandas as pd

    from kafka_processor_cosmos_tx_dispatch_spark.queries import q_timeseries_ohlc
    from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import load_table

    got = {
        (r["bucket_epoch"], r["event_type"]): (
            r["n"], r["open"], r["high"], r["low"], r["close"]
        )
        for r in q_timeseries_ohlc(spark, sf_dir).collect()
    }
    pdf = load_table(spark, sf_dir, "events").select(
        "ts", "event_id", "event_type", "value"
    ).toPandas()
    pdf["bucket"] = pdf["ts"].dt.floor("h").astype("int64") // 10**9
    pdf = pdf.sort_values(["ts", "event_id"])
    want = {}
    for (b, t), g in pdf.groupby(["bucket", "event_type"]):
        want[(b, t)] = (
            len(g),
            g["value"].iloc[0],
            g["value"].max(),
            g["value"].min(),
            g["value"].iloc[-1],
        )
    assert got == want


def test_rfm_tiles_are_balanced_quartiles(spark, sf_dir):
    """Each RFM dimension's NTILE(4) sizes differ by ≤1 and segment
    codes agree with the tile columns."""
    from kafka_processor_cosmos_tx_dispatch_spark.queries import q_rfm_segmentation

    rows = q_rfm_segmentation(spark, sf_dir).collect()
    for col in ("r", "f", "m"):
        sizes = {}
        for row in rows:
            sizes[row[col]] = sizes.get(row[col], 0) + 1
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)
    for row in rows:
        assert row["segment"] == f"R{row['r']}F{row['f']}M{row['m']}"


def test_mixture_eval_deviation_bounded_by_weight_sum(spark, sf_dir):
    """Stride scheduling guarantees per-prefix deviation ≤ Σw (in the
    ×Σw integer scale: ≤ Σw·w per language, loosely ≤ Σw² overall) —
    assert the practical bound deviation_x_tot ≤ Σw · weight + Σw."""
    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        _MIX_WEIGHTS,
        sample_mixture_eval,
    )

    tot = sum(_MIX_WEIGHTS.values())
    for r in sample_mixture_eval(spark, sf_dir).collect():
        w = _MIX_WEIGHTS.get(r["lang"], 0)
        assert r["deviation_x_tot"] <= tot * (w + 1), r


class TestWeightedReservoir:
    def test_matches_pure_python_ticket_race(self, spark):
        """The bottom-k by best md5 ticket must equal a from-scratch
        Python implementation of the same integer-weight PPS race —
        pins both the ticket hash layout (id ':' j) and the bottom-k
        semantics."""
        import hashlib

        from kafka_processor_cosmos_tx_dispatch_spark.operators.sampling import (
            weighted_reservoir,
        )

        rows = [(i, (i % 5)) for i in range(200)]  # weights 0..4
        df = spark.createDataFrame(rows, "doc_id long, weight int")
        got = {
            (r["doc_id"], r["priority"])
            for r in weighted_reservoir(df, "weight", k=25).collect()
        }

        def pri(i, w):
            return min(
                hashlib.md5(f"{i}:{j}".encode()).hexdigest()
                for j in range(1, w + 1)
            )

        want = sorted(
            ((pri(i, w), i) for i, w in rows if w >= 1),
        )[:25]
        assert got == {(i, p) for p, i in want}

    def test_weight_zero_never_samples_and_sample_is_stable(self, spark):
        """Adding rows never changes surviving rows' priorities: the
        k=all sample of a subset is a sub-multiset of the superset's
        priorities (the semilattice/stability property)."""
        from kafka_processor_cosmos_tx_dispatch_spark.operators.sampling import (
            weighted_reservoir,
        )

        small = spark.createDataFrame(
            [(i, 2) for i in range(50)], "doc_id long, weight int"
        )
        big = spark.createDataFrame(
            [(i, 2) for i in range(100)], "doc_id long, weight int"
        )
        ps = {
            r["doc_id"]: r["priority"]
            for r in weighted_reservoir(small, "weight", k=1000).collect()
        }
        pb = {
            r["doc_id"]: r["priority"]
            for r in weighted_reservoir(big, "weight", k=1000).collect()
        }
        assert all(pb[i] == p for i, p in ps.items())
        zero = spark.createDataFrame(
            [(1, 0), (2, 1)], "doc_id long, weight int"
        )
        assert [
            r["doc_id"]
            for r in weighted_reservoir(zero, "weight", k=10).collect()
        ] == [2]


class TestHammingTopk:
    def test_matches_pure_python_sign_pack(self, spark):
        """Packing + popcount-XOR distance vs a from-scratch Python
        reference on vectors exercising sign boundaries (exact zero is
        a SET bit: >= 0)."""
        from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
            hamming_topk,
        )

        import random

        rng = random.Random(7)
        vecs = []
        for i in range(30):
            v = [rng.uniform(-1, 1) for _ in range(64)]
            v[i % 64] = 0.0  # exact zero: must pack as bit set
            vecs.append((i, v))
        df = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>"
        )

        import struct

        def pack(v):
            # float32 round-trip first: Spark stores array<float>
            v = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
            return [
                sum(1 << d for d in range(32) if v[w0 + d] >= 0)
                for w0 in (0, 32)
            ]

        packed = {i: pack(v) for i, v in vecs}

        def hd(a, b):
            return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

        got = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["hamming"])
            for r in hamming_topk(
                df.where("vec_id < 3"), df, k=4
            ).collect()
        }
        for q in range(3):
            cands = sorted(
                (hd(packed[q], packed[c]), c)
                for c in packed
                if c != q
            )[:4]
            for rank, (d, c) in enumerate(cands, start=1):
                assert got[(q, rank)] == (c, d), (q, rank)


class TestCdcChunks:
    def test_chunks_reconstruct_documents_and_respect_min_size(
        self, spark, sf_dir
    ):
        """Chunk spans tile each document exactly (concat of chunk
        substrings == text) and every kept cut is >= 8 past the
        previous raw cut, so no chunk except a doc's FINAL one is
        shorter than 8 chars. Reimplements the span derivation in
        Python from the same raw boundary rule."""
        import hashlib

        docs = {
            1: "the quick brown fox jumps over the lazy dog " * 6,
            2: "the quick brown fox jumps over the lazy dog " * 6,
            3: "short",
            4: "aaaabbbbccccddddeeeeffffgggghhhhiiiijjjjkkkk",
        }

        def cuts_of(text):
            raw = [
                i + 7
                for i in range(1, max(len(text) - 7, 0) + 1)
                if hashlib.md5(text[i - 1 : i + 7].encode()).hexdigest()[:2]
                < "08"
            ]
            kept, prev = [], -7
            for c in raw:
                if c - prev >= 8:
                    kept.append(c)
                prev = c  # LAG semantics: compare against previous RAW cut
            if len(text) > 0 and (not kept or kept[-1] != len(text)):
                kept.append(len(text))
            return kept

        from kafka_processor_cosmos_tx_dispatch_spark.queries import (
            text_cdc_chunks,
        )
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(i, t, "en", "s", len(t)) for i, t in docs.items()],
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            ).write.parquet(f"{td}/documents.parquet")
            got = {
                r["fp"]: (r["n_occ"], r["n_docs"], r["chunk_len"])
                for r in text_cdc_chunks(spark, td).collect()
            }

        from collections import Counter

        chunk_occ = Counter()
        chunk_docs = {}
        chunk_len = {}
        for i, t in docs.items():
            cs = cuts_of(t)
            prev = 0
            rebuilt = ""
            for c in cs:
                chunk = t[prev:c]
                rebuilt += chunk
                fp = hashlib.md5(chunk.encode()).hexdigest()
                chunk_occ[fp] += 1
                chunk_docs.setdefault(fp, set()).add(i)
                chunk_len[fp] = min(
                    chunk_len.get(fp, 10**9), len(chunk)
                )
                prev = c
            assert rebuilt == t  # spans tile the document
        want = {
            fp: (n, len(chunk_docs[fp]), chunk_len[fp])
            for fp, n in chunk_occ.items()
            if n > 1
        }
        assert got == dict(
            sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:50]
        )


class TestRakeKeywords:
    def test_degree_freq_on_crafted_phrases(self, spark):
        """Hand-computed RAKE degree/freq: 'deep learning models' (len-3
        phrase) and 'deep learning' (len-2) give deep/learning degree
        3+2=5 freq 2, models degree 3 freq 1."""
        import tempfile

        from kafka_processor_cosmos_tx_dispatch_spark.queries import (
            text_rake_keywords,
        )

        text = "deep learning models in the deep learning, era"
        # tokens: deep learning models in(sw) the(sw) deep learning,(punct) era
        # phrases: [deep learning models] [deep] ... wait: 'learning,'
        # has a comma -> boundary, so phrases are
        # [deep learning models], [deep], [era]... recompute below.
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(1, text, "en", "s", len(text))],
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            ).write.parquet(f"{td}/documents.parquet")
            got = {
                r["word"]: (r["degree"], r["freq"], r["score"])
                for r in text_rake_keywords(spark, td).collect()
            }
        # phrases: [deep learning models] (in, the are stopwords),
        # [deep] ('learning,' contains punctuation -> boundary), [era]
        assert got["models"] == (3, 1, 3.0)
        assert got["deep"] == (3 + 1, 2, 2.0)
        assert got["learning"] == (3, 1, 3.0)
        assert got["era"] == (1, 1, 1.0)


class TestCdcContainmentPairs:
    def test_containment_on_crafted_near_dups(self, spark):
        """A doc fully contained in a larger one (quote/contamination
        shape) must surface with containment 1.0 even though Jaccard
        would be low; unrelated docs must not pair; a boilerplate chunk
        shared by MANY docs is df-capped out of candidate generation."""
        from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
            cdc_chunks,
            cdc_containment_pairs,
        )

        base = (
            "the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight "
        ) * 4
        big = base + ("unique continuation text here " * 10)
        docs = [
            (1, base),
            (2, big),  # contains all of doc 1's text
            (3, "completely different content with no shared runs " * 8),
        ]
        # df-cap check: one shared boilerplate sentence across 12 docs
        boiler = "subscribe to our newsletter for updates today now "
        docs += [(100 + i, boiler + f"unique tail {i} " * 20) for i in range(12)]
        df = spark.createDataFrame(docs, "doc_id long, text string")

        pairs = {
            (r["doc_a"], r["doc_b"]): r
            for r in cdc_containment_pairs(df, max_df=10).collect()
        }
        assert (1, 2) in pairs
        r = pairs[(1, 2)]
        # doc 1's chunks are cut at identical offsets inside doc 2 up to
        # the junction chunk, so containment is high; n_a chunks mostly
        # shared
        assert r["containment"] >= 0.5
        assert not any(3 in p for p in pairs)
        # the boilerplate-only overlap (df = 12 > 10) must NOT create
        # the ~66 boilerplate pairs
        assert not any(a >= 100 and b >= 100 for a, b in pairs)

        # chunk determinism: same text -> same fingerprints, offsets
        # independent of the surrounding doc set
        c1 = sorted(
            r["fp"] for r in cdc_chunks(df.filter("doc_id = 1")).collect()
        )
        c1_again = sorted(
            r["fp"]
            for r in cdc_chunks(
                spark.createDataFrame([(9, base)], "doc_id long, text string")
            ).collect()
        )
        assert c1 == c1_again


def test_random_walks_follow_edges_deterministically(spark, sf_dir):
    """Every walk step (u -> v) must be a real edge, and the chosen v
    must equal the hash-rank rule recomputed in Python from the same
    adjacency — pins the md5 pick, the rank convention (dst-sorted,
    1-based), and the alternation structure of the bipartite graph."""
    import hashlib

    from kafka_processor_cosmos_tx_dispatch_spark.queries import (
        _WALK_STEPS,
        graph_random_walks,
    )
    from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    adj = {}
    for r in cs:
        c, s = r[0], 10000000 + r[1]
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)

    walks = {}
    for r in graph_random_walks(spark, sf_dir).collect():
        walks.setdefault(r["seed"], {})[r["step"]] = r["node"]

    assert walks and all(len(w) == _WALK_STEPS + 1 for w in walks.values())
    for seed, w in walks.items():
        assert w[0] == seed
        for step in range(1, _WALK_STEPS + 1):
            u, v = w[step - 1], w[step]
            nbrs = sorted(adj[u])
            h = int(hashlib.md5(f"{u}:{step}".encode()).hexdigest()[:8], 16)
            assert v == nbrs[h % len(nbrs)], (seed, step)


def test_paragraph_dedup_hand_corpus(spark):
    """Pin the paragraph-dedup contract on a hand corpus (size=4 so the
    chunks are readable): (a) a passage repeated across docs survives
    only in its FIRST (doc_id, chunk_idx) occurrence, (b) a passage
    repeated WITHIN one doc keeps only the earlier chunk, (c) a doc
    whose every passage already appeared comes back n_kept=0 with empty
    text_dedup, and (d) reassembly preserves chunk order."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        paragraph_dedup,
    )

    boiler = "b1 b2 b3 b4"  # chunk-aligned repeated paragraph
    docs = spark.createDataFrame(
        [
            (0, f"{boiler} a1 a2 a3 a4"),  # boiler@0, uniq
            (1, f"c1 c2 c3 c4 {boiler}"),  # uniq, boiler@1 (dropped)
            (2, f"{boiler}"),  # all-dup doc -> n_kept=0
            (3, f"d1 d2 d3 d4 d1 d2 d3 d4 e1"),  # within-doc repeat
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs, size=4).collect()}
    assert got[0]["n_chunks"] == 2 and got[0]["n_kept"] == 2
    assert got[0]["text_dedup"] == "b1 b2 b3 b4 a1 a2 a3 a4"
    # (a): doc 1 loses its copy of the boiler paragraph
    assert got[1]["n_kept"] == 1
    assert got[1]["text_dedup"] == "c1 c2 c3 c4"
    # (c): doc 2 is entirely boilerplate
    assert got[2]["n_kept"] == 0 and got[2]["text_dedup"] == ""
    # (b)+(d): within-doc repeat keeps the first copy, order preserved
    assert got[3]["n_chunks"] == 3 and got[3]["n_kept"] == 2
    assert got[3]["text_dedup"] == "d1 d2 d3 d4 e1"


def test_paragraph_dedup_survivor_uniqueness(spark, sf_dir):
    """Corpus-level invariant on real testdata: every distinct passage
    fingerprint survives exactly once, and Σ n_kept = #distinct
    passages."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        paragraph_dedup,
    )
    from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = paragraph_dedup(docs, size=32)
    total_kept = out.agg(F.sum("n_kept")).first()[0]
    # recompute distinct passages independently of the operator
    from kafka_processor_cosmos_tx_dispatch_spark.functions import text as TX

    t = TX.tokens(F.col("text"))
    n_ch = (F.greatest(F.size(t) - 32, F.lit(0)) + 31).cast("long") / 32
    chunks = docs.select(
        F.col("doc_id"), t.alias("t"), F.explode(
            F.sequence(F.lit(0), n_ch.cast("long"))
        ).alias("i")
    ).select(
        F.md5(
            F.concat_ws(" ", F.slice(F.col("t"), F.col("i") * 32 + 1, 32))
        ).alias("f")
    )
    assert total_kept == chunks.distinct().count()


def test_dsir_weights_target_ordering(spark):
    """Pin the DSIR contract on a hand corpus: (a) a doc whose bigrams
    all appear in the target subset outscores (per-feature) a doc whose
    bigrams never do, (b) per-bucket ratios are bounded by the
    fixed-point scale (target ⊆ raw), and (c) a single-token doc carries
    no feature and drops."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.sampling import (
        dsir_weights,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "good clean prose here", "en"),      # target
            (1, "good clean prose here", "fr"),      # = target bigrams
            (2, "zz1 zz2 zz3 zz4", "fr"),            # disjoint from target
            (3, "solo", "fr"),                        # no bigram
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r
        for r in dsir_weights(docs, target=F.col("lang") == "en").collect()
    }
    assert 3 not in got  # (c)
    assert got[1]["n_feats"] == got[2]["n_feats"] == 3
    # (a): doc 1's bigrams each appear once in target and twice raw ->
    # lr = 2*S DIV 3 per bucket; doc 2's never in target -> lr = S DIV 2
    s = 1 << 20
    assert got[1]["dsir_fp"] == 3 * (2 * s // 3)
    assert got[2]["dsir_fp"] == 3 * (s // 2)
    assert got[1]["dsir_fp"] > got[2]["dsir_fp"]
    # (b): no per-doc score exceeds n_feats * scale
    for r in got.values():
        assert r["dsir_fp"] <= r["n_feats"] * s


class TestKmeansAssignCells:
    """kmeans_assign_cells — the APPLY half of train-on-sample (r14):
    assignment against an externally-supplied trained codebook."""

    def test_hand_codebook_exact_assignment(self, spark):
        # two 2-dim centroids; quantization is floor(x*1024)
        vecs = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [0.4, 0.6])],
            "vec_id long, embedding array<double>",
        )
        cells = spark.createDataFrame(
            [(0, 0, 0), (0, 1, 0), (7, 0, 1024), (7, 1, 1024)],
            "cluster int, d int, cval long",
        )
        rows = {
            r["vec_id"]: r
            for r in similarity.kmeans_assign_cells(vecs, cells).collect()
        }
        assert rows[1]["cluster"] == 0 and rows[1]["dist_sq"] == 0
        assert rows[2]["cluster"] == 7 and rows[2]["dist_sq"] == 0
        # (409, 614): d(c0)² = 409² + 614² = 544277;
        # d(c7)² = 615² + 410² = 546325 → cluster 0 wins
        assert rows[3]["cluster"] == 0
        assert rows[3]["dist_sq"] == 409**2 + 614**2

    def test_tiebreak_lowest_cluster(self, spark):
        vecs = spark.createDataFrame(
            [(1, [0.5])], "vec_id long, embedding array<double>"
        )
        cells = spark.createDataFrame(
            [(3, 0, 0), (5, 0, 1024)],
            "cluster int, d int, cval long",
        )
        # 512 is equidistant (512² both) → lowest cluster id wins
        r = similarity.kmeans_assign_cells(vecs, cells).collect()[0]
        assert r["cluster"] == 3
        assert r["dist_sq"] == 512**2

    def test_missing_clusters_never_win(self, spark):
        vecs = spark.createDataFrame(
            [(1, [10.0])], "vec_id long, embedding array<double>"
        )
        cells = spark.createDataFrame(
            [(2, 0, 0)], "cluster int, d int, cval long"
        )
        r = similarity.kmeans_assign_cells(vecs, cells).collect()[0]
        assert r["cluster"] == 2  # the only trained cluster

    def test_empty_cells_raises_not_null(self, spark):
        """ADVICE r14: an ALL-absent codebook is a caller bug — it must
        raise at execution time, not silently assign null clusters."""
        import pytest

        vecs = spark.createDataFrame(
            [(1, [10.0])], "vec_id long, embedding array<double>"
        )
        empty = spark.createDataFrame(
            [], "cluster int, d int, cval long"
        )
        with pytest.raises(Exception, match="empty cells relation"):
            similarity.kmeans_assign_cells(vecs, empty).collect()


def test_pq_train_sampled_training_is_sample_bound(spark, sf_dir):
    """The scale claim of sim_pq_train_sampled (r13 verdict #4, shape
    collapsed per r14 verdict #4): Lloyd rounds run over the PERSISTED
    fixed-size sample (InMemoryTableScan in the plan), and the corpus
    is touched by exactly ONE scan — the grouped apply pass posexplodes
    each vector into its 4 subspace slices and assigns all of them
    against one broadcast composite bank — independent of training
    rounds. sim_pq_train by contrast scans the corpus
    rounds×subspaces+ times."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as Q

    df = Q.queries()["sim_pq_train_sampled"](spark, sf_dir)
    # collectLeaves() of the MAIN plan treats every cached relation as
    # a leaf (InMemoryTableScan) and does not descend into it, so the
    # FileSourceScan leaves are exactly the corpus scans the main plan
    # pays — immune to the plan-TEXT duplication of cached children
    p = df._jdf.queryExecution().executedPlan()
    if p.nodeName() == "AdaptiveSparkPlan":
        p = p.initialPlan()  # AQE wraps the whole tree in one node
    leaves = p.collectLeaves()
    names = [leaves.apply(i).nodeName() for i in range(leaves.size())]
    n_cache = sum(1 for n in names if "InMemoryTableScan" in n)
    n_file = sum(1 for n in names if "Scan parquet" in n)
    assert n_cache > 0, f"no cache reads in {names}"  # trained state cached
    assert n_file == 1, (
        f"{n_file} corpus scans in the main plan ({names}) — expected "
        "exactly the one grouped apply pass"
    )


def test_dedup_funnel_has_winnow_stage_and_is_monotone(spark, sf_dir):
    """The funnel dashboard covers all four candidate generators (r14
    verdict #3): raw → exact → near(LSH) → winnow(verified) →
    paragraph, and is monotone — every stage only ever removes docs
    and tokens, so a non-increasing (n_docs, n_tokens) sequence over
    the document-level stages is a structural invariant, not a data
    property."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as q

    rows = {
        r["stage"]: r
        for r in q.queries()["dedup_funnel_report"](spark, sf_dir).collect()
    }
    assert list(sorted(rows)) == [
        "a_raw", "b_exact", "c_near", "d_winnow", "e_paragraph"
    ]
    order = ["a_raw", "b_exact", "c_near", "d_winnow"]
    for prev, cur in zip(order, order[1:]):
        assert rows[cur]["n_docs"] <= rows[prev]["n_docs"], (prev, cur)
        assert rows[cur]["n_tokens"] <= rows[prev]["n_tokens"], (prev, cur)
    # paragraph counts docs with ≥1 kept passage among winnow survivors
    assert rows["e_paragraph"]["n_docs"] <= rows["d_winnow"]["n_docs"]
    assert rows["e_paragraph"]["n_tokens"] <= rows["d_winnow"]["n_tokens"]


class TestKmeansGrouped:
    """kmeans_assign_grouped / kmeans_assign_cells_grouped — the
    one-plan multi-codebook shape (r14 verdict #4). The contract is
    PARITY: group-by-group results identical to running the ungrouped
    operator once per group."""

    def _gdf(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        # 3 groups over the same ids with genuinely different vectors
        return df.select(
            "vec_id",
            F.posexplode(
                F.array(
                    F.col("embedding"),
                    F.reverse("embedding"),
                    F.slice(
                        F.concat(F.col("embedding"), F.col("embedding")),
                        5,
                        16,
                    ),
                )
            ).alias("g", "emb16"),
        )

    def test_train_parity_per_group(self, spark):
        gdf = self._gdf(spark)
        got = {
            (r["g"], r["vec_id"]): (r["cluster"], r["dist_sq"])
            for r in similarity.kmeans_assign_grouped(
                gdf, n_groups=3, vec_col="emb16", k=4, rounds=2
            ).collect()
        }
        assert len(got) == 180
        for g in range(3):
            sub = gdf.filter(F.col("g") == g).select(
                "vec_id", F.col("emb16").alias("embedding")
            )
            ref = {
                r["vec_id"]: (r["cluster"], r["dist_sq"])
                for r in similarity.kmeans_assign(
                    sub, k=4, rounds=2
                ).collect()
            }
            for vid, val in ref.items():
                assert got[(g, vid)] == val, (g, vid)

    def test_apply_parity_and_sparse_codebooks(self, spark):
        gdf = self._gdf(spark)
        cells = spark.createDataFrame(
            [
                (g, c, d, (g * 131 + c * 17 + d * 3) % 900 - 450)
                for g in range(3)
                for c in range(4)
                for d in range(16)
            ],
            "g int, cluster int, d int, cval long",
        )
        got = {
            (r["g"], r["vec_id"]): (r["cluster"], r["dist_sq"])
            for r in similarity.kmeans_assign_cells_grouped(
                gdf, cells, k=4, vec_col="emb16"
            ).collect()
        }
        for g in range(3):
            sub = gdf.filter(F.col("g") == g).select(
                "vec_id", F.col("emb16").alias("embedding")
            )
            ref = {
                r["vec_id"]: (r["cluster"], r["dist_sq"])
                for r in similarity.kmeans_assign_cells(
                    sub,
                    cells.filter(F.col("g") == g).select(
                        "cluster", "d", "cval"
                    ),
                ).collect()
            }
            for vid, val in ref.items():
                assert got[(g, vid)] == val, (g, vid)
        # a cluster absent from ONE group's codebook never wins there
        sparse = cells.filter(
            ~((F.col("g") == 1) & (F.col("cluster") == 0))
        )
        g1 = (
            similarity.kmeans_assign_cells_grouped(
                gdf, sparse, k=4, vec_col="emb16"
            )
            .filter("g = 1")
            .select("cluster")
            .distinct()
            .collect()
        )
        assert all(r["cluster"] != 0 for r in g1)

    def test_group_with_no_cells_raises(self, spark):
        import pytest

        gdf = self._gdf(spark)
        only_g0 = spark.createDataFrame(
            [(0, c, d, 7) for c in range(4) for d in range(16)],
            "g int, cluster int, d int, cval long",
        )
        with pytest.raises(Exception, match="no trained cells"):
            similarity.kmeans_assign_cells_grouped(
                gdf, only_g0, k=4, vec_col="emb16"
            ).collect()
