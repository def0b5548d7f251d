"""'text'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DataFrame,
    F,
    SparkSession,
    W,
    _BM25_TERMS,
    _BPE_MERGES,
    _BPE_TRAIN_ITERS,
    _CDC_CHUNKS_SQL,
    _D_NORM,
    _D_SHINGLES,
    _D_TOKS,
    _QM_BIGRAMS_SQL,
    _QM_WEIGHT_SQL,
    _SW,
    _bigram_lm,
    _bm25_term_sql,
    _bpe_oracle_replace_chain,
    _bpe_train_oracle,
    load_table,
    register,
)


@register(
    "text_lang_id",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_D_TOKS} AS t FROM documents),
    scores AS (SELECT doc_id, lang,
        len(list_intersect(t, {_SW['en']})) AS s_en,
        len(list_intersect(t, {_SW['es']})) AS s_es,
        len(list_intersect(t, {_SW['de']})) AS s_de,
        len(list_intersect(t, {_SW['fr']})) AS s_fr
      FROM toks)
    SELECT doc_id, lang AS lang_label,
      CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
           WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
           WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
           WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
           ELSE 'fr' END AS lang_pred,
      CAST(s_en AS INTEGER) AS s_en, CAST(s_es AS INTEGER) AS s_es,
      CAST(s_de AS INTEGER) AS s_de, CAST(s_fr AS INTEGER) AS s_fr
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: distinct-stopword hits per language, argmax
    with deterministic tiebreak. Pure column expressions — no shuffle."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    scores = TX.lang_scores(toks)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        TX.lang_id(toks).alias("lang_pred"),
        *[scores[lang].alias(f"s_{lang}") for lang in ("en", "es", "de", "fr")],
    )


@register(
    "text_langid_eval",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_D_TOKS} AS t FROM documents),
    scores AS (SELECT doc_id, lang,
        len(list_intersect(t, {_SW['en']})) AS s_en,
        len(list_intersect(t, {_SW['es']})) AS s_es,
        len(list_intersect(t, {_SW['de']})) AS s_de,
        len(list_intersect(t, {_SW['fr']})) AS s_fr
      FROM toks),
    pred AS (
      SELECT lang AS lang_label,
        CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
             WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
             WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
             WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM scores)
    SELECT lang_label, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN lang_label = lang_pred THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred GROUP BY lang_label, lang_pred
    """,
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CLASSIFIER EVALUATION: the confusion matrix of
    text_lang_id's prediction against the labeled lang — the companion
    of sim_recall_at_k for the text side (an in-engine eval of an
    in-engine model; zh has no stopword list by design, so its row
    shows exactly where the classifier is blind — the honest eval a
    model card needs). One row-local prediction + one (label, pred)
    keyed agg; n_correct is the diagonal indicator summed in-group."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    pred = docs.select(
        F.col("lang").alias("lang_label"),
        TX.lang_id(toks).alias("lang_pred"),
    )
    return pred.groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("lang_label") == F.col("lang_pred"), 1).otherwise(0)
        ).alias("n_correct"),
    )


@register(
    "text_quality_score",
    f"""
    WITH toks AS (SELECT doc_id, text, {_D_TOKS} AS t FROM documents),
    c AS (SELECT doc_id,
        CAST(len(t) AS INTEGER) AS n_tokens,
        CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio,
        CAST(LENGTH(text) - (len(t) - 1) AS DOUBLE) / CAST(len(t) AS DOUBLE)
          AS mean_word_len,
        CAST(len(list_filter(t, x -> list_contains({_SW['en']}, x))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) AS stopword_ratio
      FROM toks)
    SELECT doc_id, n_tokens, alpha_ratio, mean_word_len, stopword_ratio,
      (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END
       + CASE WHEN alpha_ratio >= 0.6 THEN 1 ELSE 0 END
       + CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END
       + CASE WHEN stopword_ratio > 0.0 THEN 1 ELSE 0 END) AS quality
    FROM c
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gates: integer score of passed checks plus the
    underlying ratios (each one IEEE division on exact integers)."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    checks = TX.quality_checks(F.col("text"), toks)
    return docs.select(
        "doc_id",
        checks["n_tokens"].alias("n_tokens"),
        checks["alpha_ratio"].alias("alpha_ratio"),
        checks["mean_word_len"].alias("mean_word_len"),
        checks["stopword_ratio"].alias("stopword_ratio"),
        TX.quality_score(F.col("text"), toks).alias("quality"),
    )


@register(
    "text_token_counts",
    rf"""
    SELECT doc_id,
      CAST(len({_D_TOKS}) AS INTEGER) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
           AS INTEGER) AS bpe_tokens,
      CAST(LENGTH(text) AS INTEGER) AS n_chars_actual,
      n_chars
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single symbols)."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(TX.tokens(F.col("text"))).alias("ws_tokens"),
        TX.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
        "n_chars",
    )


@register(
    "text_fingerprint",
    f"""
    WITH toks AS (SELECT doc_id, text, {_D_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_D_SHINGLES}) AS s FROM toks)
    SELECT t.doc_id, md5({_D_NORM}) AS fingerprint, m.min_shingle_hash
    FROM toks t JOIN (
      SELECT doc_id, MIN(md5(s)) AS min_shingle_hash FROM sh GROUP BY doc_id
    ) m ON m.doc_id = t.doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content hash + winnowing-style
    min-shingle hash (the k=1 MinHash). Both are row-local (array_min
    over the in-row shingle array) — no explode, no groupBy, no join:
    the whole query is one narrow scan-project stage."""
    from ..functions import text as TX

    from ..sources.tables import widen

    docs = widen(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens(F.col("text"))
    sh = TX.word_shingles(toks, 3)
    return docs.filter(F.size(sh) > 0).select(
        "doc_id",
        TX.content_fingerprint(F.col("text")).alias("fingerprint"),
        F.array_min(F.transform(sh, F.md5)).alias("min_shingle_hash"),
    )


@register(
    "text_udtf_bigrams",
    rf"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents)
    SELECT doc_id,
           UNNEST(list_transform(generate_series(1, len(t)-1),
                                 i -> CAST(i AS INTEGER))) AS pos,
           UNNEST(list_transform(generate_series(1, len(t)-1),
                                 i -> concat_ws(' ', t[i], t[i+1]))) AS bigram
    FROM toks
    """,
)
def text_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4): one input row → N output rows via a
    lateral table function. Tokenization matches functions/text.py:tokens
    (lowercase, trim, whitespace split). UDTFs are the row-expanding UDF
    tier — here only to pin the API; the same result native is
    posexplode over word_shingles(toks, 2), which is what a hot path
    should use. Arrow-optimized eval keeps the Python transfer batched."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class BigramUDTF:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = text.lower().strip().split()
            for i in range(len(toks) - 1):
                yield doc_id, i + 1, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("bigram_udtf", BigramUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM _udtf_docs d, LATERAL bigram_udtf(d.doc_id, d.text) b"
    )


@register(
    "text_vocab_coverage",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    vocab AS (SELECT tok FROM freq ORDER BY n DESC, tok LIMIT 100),
    cover AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS in_vocab
      FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(in_vocab AS BIGINT) AS in_vocab,
           CAST(in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage
    FROM cover
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + apply (tokenizer-prep shape): global top-100
    token vocabulary (corpus-wide agg), then per-doc OOV/coverage via a
    broadcast of the BOUNDED vocab against the exploded token stream.
    The global stats → per-row apply round trip is the pattern every
    tokenizer/normalizer pipeline runs; only the fixed-size vocab ever
    moves, the corpus shuffles once for the frequency agg."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(100)
        .select("tok", F.lit(True).alias("__v"))
    )
    cover = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__v"), 1).otherwise(0)).alias("in_vocab"),
        )
    )
    return cover.select(
        "doc_id",
        "n_tokens",
        "in_vocab",
        (F.col("in_vocab").cast("double") / F.col("n_tokens").cast("double")).alias(
            "coverage"
        ),
    )


@register(
    "text_contamination",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_D_SHINGLES}) AS shingle FROM t),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10),
    hits AS (
      SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS shared_shingles
      FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
      WHERE s.doc_id >= 10
      GROUP BY s.doc_id)
    SELECT doc_id, CAST(shared_shingles AS BIGINT) AS shared_shingles
    FROM hits
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check (benchmark-leakage audit): flag
    training docs sharing any 3-gram shingle with the eval set (doc_id <
    10 here). The eval shingle set is BOUNDED → broadcast semi-join
    against the training shingle stream — one pass over the corpus, no
    all-pairs. The production shape for 'did my training data see the
    test set'."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(TX.word_shingles(TX.tokens(F.col("text")), 3)).alias("shingle"),
    )
    eval_sh = (
        sh.filter(F.col("doc_id") < 10).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("shared_shingles"))
    )


@register(
    "text_tfidf_topterms",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    ranked AS (
      SELECT t.doc_id, t.tok, t.tf, d.df,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf DESC, d.df ASC, t.tok ASC) AS rnk
      FROM tf t JOIN df d ON t.tok = d.tok)
    SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per document, TF-IDF shape: term frequency from
    a (doc, token) agg, document frequency from a vocab-sized re-agg of
    the SAME tf table (no second corpus scan), equi-join tf x df on the
    token, rank within each doc. Rank order (tf DESC, df ASC, tok) is the
    pure-integer stand-in for tf*ln(N/df) — ln() is not correctly-rounded
    IEEE so its last bit differs across engines; the integer sort key is
    bit-stable everywhere and preserves the 'frequent here, rare
    globally' semantics. Scale: df is vocab-sized (sublinear); the tf-df
    join shuffles on the token key where stopword skew is AQE-split; the
    final rank shuffles by doc_id."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    # tf feeds BOTH the df re-agg and the final join; without
    # materialization Spark recomputes the whole scan+explode+agg per
    # consumer (verified: no exchange/stage reuse even under AQE —
    # post-agg tf is the small relation, so one localCheckpoint beats
    # two corpus tokenization passes).
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("tok")
    )
    return (
        tf.join(dfreq, "tok")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tf", "df", "rnk")
    )


@register(
    "text_token_rarity",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
    r AS (SELECT f.tok,
                 CAST(FLOOR(1000000.0 * CAST(t.total AS DOUBLE)
                            / CAST(f.cnt AS DOUBLE)) AS BIGINT) AS rarity
          FROM freq f CROSS JOIN tot t),
    per_doc AS (
      SELECT tk.doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(r.rarity) AS BIGINT) AS rarity_sum
      FROM toks tk JOIN r ON tk.tok = r.tok
      GROUP BY tk.doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, rarity_sum,
           CAST(rarity_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             / 1000000.0 AS mean_rarity
    FROM per_doc
    """,
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (CCNet shape): build corpus-wide token
    frequencies, score each doc by its mean inverse token frequency —
    rare-token-heavy docs score high, boilerplate scores low. The exact
    stand-in for mean unigram log-prob: ln() differs across engines in
    the last ULP, while FLOOR(1e6 * total/cnt) is one correctly-rounded
    IEEE divide + floor, so the per-token rarity is an exact integer and
    per-doc sums are order-independent. Scale: the LM 'model' (freq) is
    vocab-sized; the apply step is a corpus x vocab equi-join on the
    token (AQE handles stopword skew), then one doc-keyed agg."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    per_doc = TX.token_rarity_scores(docs, scale=1_000_000)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "rarity_sum",
        (
            F.col("rarity_sum").cast("double")
            / F.col("n_tokens").cast("double")
            / F.lit(1000000.0)
        ).alias("mean_rarity"),
    )


@register(
    "text_duplicate_ngrams",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    g AS (SELECT doc_id,
                 unnest(CASE WHEN len(t) >= 5 THEN
                   list_transform(generate_series(1, len(t) - 4),
                     i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))
                 ELSE CAST([] AS VARCHAR[]) END) AS ng
          FROM t)
    SELECT ng, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM g GROUP BY ng
    ORDER BY n DESC, ng LIMIT 20
    """,
)
def text_duplicate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-substring audit (the aggregate view of
    'Deduplicating Training Data Makes LMs Better': which exact 5-gram
    spans recur most, and across how many documents). One explode + one
    hash agg + bounded top-k — the shuffle keys are the n-grams
    themselves, map-side partial aggregation collapses the hot ones, and
    TakeOrderedAndProject keeps only 20 rows per partition. The full
    suffix-array approach finds arbitrary-length spans; fixed-length
    n-gram counting is its bounded-memory streaming approximation."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        F.explode(TX.word_shingles(TX.tokens(F.col("text")), 5)).alias("ng"),
    )
    return (
        g.groupBy("ng")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n"), F.asc("ng"))
        .limit(20)
    )


@register(
    "text_chunk_overlap",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    n AS (SELECT doc_id, t, len(t) AS n_toks,
                 ((greatest(len(t) - 32, 0) + 23) // 24) + 1 AS n_chunks
          FROM t),
    c AS (SELECT doc_id, t, n_toks,
                 unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
          FROM n)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32))
                AS INTEGER) AS chunk_tokens,
           array_to_string(
             list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ')
             AS chunk_text
    FROM c
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 32, stride 24 — the
    embedding/pretraining chunker: every token is covered, consecutive
    chunks share 8 tokens of context). The token array is built ONCE per
    row (let-bound), the chunk count is a closed-form integer, and the
    explode emits only index rows — each chunk then slices the bound
    array, so work is O(total chunk tokens), with no re-tokenization per
    chunk and no shuffle at all: the whole operator is a narrow
    Generate + Project at any corpus size."""
    from ..functions import exprs as EX
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    size, stride = 32, 24

    def chunks(t: F.Column) -> F.Column:
        n_chunks = (
            (F.greatest(F.size(t) - size, F.lit(0)) + (stride - 1))
            .cast("long")
            / stride
        ).cast("long") + 1
        return F.struct(
            t.alias("t"), F.sequence(F.lit(0), n_chunks - 1).alias("idx")
        )

    b = docs.select(
        "doc_id", EX.bind(TX.tokens(F.col("text")), chunks).alias("s")
    ).select("doc_id", F.col("s.t").alias("t"), F.explode("s.idx").alias("chunk_idx"))
    sliced = F.slice(F.col("t"), F.col("chunk_idx") * stride + 1, size)
    return b.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sliced).alias("chunk_tokens"),
        F.concat_ws(" ", sliced).alias("chunk_text"),
    )


@register(
    "text_repetition_ratio",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id, toks,
                  CASE WHEN len(toks) >= 2 THEN
                    list_transform(generate_series(1, len(toks) - 1),
                                   i -> concat_ws(' ', toks[i], toks[i+1]))
                  ELSE CAST([] AS VARCHAR[]) END AS bigrams
           FROM t)
    SELECT doc_id,
           CAST(len(bigrams) AS INTEGER) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS INTEGER) AS n_distinct,
           CASE WHEN len(bigrams) > 0
                THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                           / CAST(len(bigrams) AS DOUBLE)
                ELSE 0.0 END AS rep_ratio
    FROM bg
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher/C4-style quality gate): share
    of duplicate bigrams per doc. Row-local HOFs only — bigrams never
    explode into rows, so the operator is a narrow codegen'd projection
    at any corpus size. The ratio divides identical exact integers on
    both engines, so the doubles are bit-identical."""
    from ..functions import exprs as EX
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")

    def body(toks: F.Column) -> F.Column:
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(
            F.size(bigrams).alias("n_bigrams"),
            F.size(F.array_distinct(bigrams)).alias("n_distinct"),
        )

    c = EX.bind(TX.tokens(F.col("text")), body)
    n_bg = c["n_bigrams"]
    n_d = c["n_distinct"]
    ratio = F.when(
        n_bg > 0,
        F.lit(1.0) - n_d.cast("double") / n_bg.cast("double"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_bg.alias("n_bigrams"),
        n_d.alias("n_distinct"),
        ratio.alias("rep_ratio"),
    )


@register(
    "text_redact",
    r"""
    WITH t AS (
      SELECT doc_id,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@example.com ref ', CAST(doc_id * 7919 + 100003 AS VARCHAR))
               AS annotated
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(annotated,
                '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+')) AS INTEGER) AS n_emails,
           regexp_replace(
             regexp_replace(annotated,
                            '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+', '<EMAIL>', 'g'),
             '[0-9]{4,}', '<NUM>', 'g') AS redacted
    FROM t
    """,
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction (training-data scrubbing): regex masking of
    emails and long digit runs, plus a match count — one narrow
    projection, JVM regex, no Python. The corpus carries no natural PII,
    so a deterministic synthetic annotation is appended first (the
    redaction path itself is what's under test). Note DuckDB needs the
    'g' flag to match Spark's replace-all semantics."""
    docs = load_table(spark, sf_dir, "documents")
    annotated = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919 + 100003).cast("string"),
    )
    email_re = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"
    return docs.select(
        "doc_id",
        F.regexp_count(annotated, F.lit(email_re)).cast("int").alias("n_emails"),
        F.regexp_replace(
            F.regexp_replace(annotated, email_re, "<EMAIL>"),
            r"[0-9]{4,}",
            "<NUM>",
        ).alias("redacted"),
    )


@register(
    "text_pack_sequences",
    rf"""
    WITH t AS (SELECT doc_id, CAST(len({_D_TOKS}) AS BIGINT) AS n
               FROM documents),
    c AS (SELECT doc_id, n,
                 SUM(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM t)
    SELECT doc_id, n AS n_tokens,
           CAST((cum - n) // 512 AS INTEGER) AS bin,
           CAST(ROW_NUMBER() OVER (PARTITION BY (cum - n) // 512
                                   ORDER BY doc_id) AS INTEGER) AS bin_pos
    FROM c
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (LLM pretraining assembly): docs in id order
    binned by exclusive token prefix-sum DIV budget. The Spark side runs
    the DISTRIBUTED scan (range-bucketed partial sums + tiny offset
    window + per-bucket windows, operators/sampling.py:pack_sequences);
    the oracle replays it as one global window — same numbers, but only
    one of the two survives 100 TB."""
    from ..functions import text as TX
    from ..operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    d = docs.withColumn("n_tokens", F.size(TX.tokens(F.col("text"))).cast("long"))
    return pack_sequences(d, "n_tokens", budget=512, range_size=64)


@register(
    "text_quality_model",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    f AS (SELECT doc_id, t || {_QM_BIGRAMS_SQL} AS feats FROM t)
    SELECT doc_id,
           CAST(len(feats) AS INTEGER) AS n_feats,
           CAST(COALESCE(list_sum(list_transform(feats,
                  f -> {_QM_WEIGHT_SQL})), 0) AS BIGINT) AS score_milli,
           COALESCE(list_sum(list_transform(feats,
                  f -> {_QM_WEIGHT_SQL})), 0) > 0 AS keep
    FROM f
    """,
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier: features are
    unigrams + word bigrams, each hashed to a fixed-point milli-weight
    (md5-derived — the deterministic stand-in for trained weights, same
    conv/'0x' idiom as the sketch family), document score = Σ weights,
    keep = score > 0. The inference shape of the linear quality filters
    used for corpus curation (CCNet/fastText gates): real deployments
    swap the md5 weight for a broadcast weight-table lookup; the plan is
    identical.

    Scale: 100% row-local — tokenize, shingle, hash, and sum are all
    higher-order functions inside one narrow projection. Zero shuffles,
    zero Python; throughput is scan-bound at any corpus size."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")

    def weight(tok: F.Column) -> F.Column:
        return (
            F.conv(F.substring(F.md5(tok), 1, 12), 16, 10).cast("long")
            % 2001
            - 1000
        )

    toks = TX.tokens(F.col("text"))
    feats = F.concat(toks, TX.word_shingles(toks, 2))
    score = F.aggregate(
        feats, F.lit(0).cast("long"), lambda acc, x: acc + weight(x)
    )
    out = docs.select(
        "doc_id",
        F.size(feats).alias("n_feats"),
        score.alias("score_milli"),
    )
    return out.withColumn("keep", F.col("score_milli") > 0)


@register(
    "text_bpe_encode",
    f"""
    WITH words AS (
      SELECT doc_id, w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''),
    vocab AS (SELECT DISTINCT w FROM words),
    enc AS (
      SELECT w,
             {_bpe_oracle_replace_chain(
                 "'|' || array_to_string(string_split(w, ''), '|')"
                 " || '|</w>|'"
             )} AS e
      FROM vocab),
    vn AS (
      SELECT w, CAST(len(string_split(e, '|')) - 2 AS BIGINT) AS n_sub
      FROM enc)
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_subwords
    FROM words JOIN vn USING (w)
    GROUP BY doc_id
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization — APPLYING a trained merge table (the encode
    half of byte-pair encoding; training the table is a driver-side
    loop over pair counts, the applying is what runs over 100 TB).
    Per-doc output: word count and post-merge subword count (the
    compression the tokenizer achieves).

    The scale pattern is DICTIONARY ENCODING: the expensive per-token
    transform (char split + chained merge replaces) runs on the
    DISTINCT vocabulary only — thousands of rows — then broadcast-joins
    back onto the exploded corpus; per-corpus cost is one explode + one
    broadcast hash join, independent of how elaborate the tokenizer
    is. This is exactly how a production pipeline tokenizes a repeated
    vocabulary (and why tokenizer microbenchmarks on unique-string
    corpora mislead). Merge application = ordered single-pass global
    replaces over the DELIMITER-WRAPPED symbol stream ("|t|h|e|</w>|");
    the wrapping makes cross-boundary prefix matches impossible and the
    form equal to canonical BPE except on immediately-adjacent repeats
    of one pair — both engines share replace() semantics and the
    equivalence envelope is pinned in tests/test_llm_ops.py (see
    _BPE_MERGES).

    Scale: explode is narrow; vocab distinct is a small shuffle; the
    join back is broadcast. No Python anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.select("w").distinct()
    enc = F.concat(
        F.lit("|"),
        F.array_join(
            F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
            "|",
        ),
        F.lit("|</w>|"),
    )
    for a, b in _BPE_MERGES:
        pa = "|" + a.replace(" ", "|") + "|"
        enc = F.replace(enc, F.lit(pa), F.lit(f"|{b}|"))
    vn = vocab.select(
        "w",
        (F.size(F.split(enc, r"\|")) - 2).cast("long").alias("n_sub"),
    )
    return (
        words.join(F.broadcast(vn), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )


@register(
    "text_bigram_lm_score",
    """
    WITH docs_arr AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    bg AS (
      SELECT doc_id, a[i] AS w1, a[i] || ' ' || a[i + 1] AS b
      FROM docs_arr, unnest(generate_series(1, len(a) - 1)) t(i)
      WHERE a[i] <> '' AND a[i + 1] <> ''),
    uc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    bc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(bc.c * 1000000 // uc.c) AS BIGINT) AS lm_fp
    FROM bg JOIN bc USING (b) JOIN uc ON uc.w = bg.w1
    GROUP BY bg.doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score (the KenLM-style fluency
    gate of CCNet/RefinedWeb pipelines, self-trained on the corpus):
    per document, the summed conditional bigram probability mass
    P(w2|w1) = count(w1 w2)/count(w1), estimated from corpus counts.
    Low mass ⇒ improbable word sequences ⇒ quality-filter candidate.

    Cross-engine exactness: probabilities ride as INTEGER fixed-point
    (count*1e6 DIV count — exact integer division in both engines) and
    sum as int64, replacing the log-domain float accumulation whose
    ordering neither engine pins. The monotone ranking a filter
    thresholds on is unchanged.

    Scale: the model is VOCAB-BOUNDED (unigram + bigram count tables ≤
    |V|² rows regardless of corpus size), built by one map-side-
    combinable agg each, then broadcast back onto the exploded corpus —
    per-doc scoring never shuffles the corpus itself. Bigrams come from
    an index-aware HOF over the split array (no self-join, no
    posexplode alignment shuffle)."""
    return _bigram_lm(load_table(spark, sf_dir, "documents"))


@register(
    "text_decontaminate_exact",
    f"""
    WITH toks AS (SELECT doc_id, {{TOKS}} AS t FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                            t[i+4], t[i+5], t[i+6], t[i+7]) AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) g(i)
      WHERE len(t) >= 8),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, b.pos AS pb
          FROM sh a JOIN keep USING (shingle) JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id),
    runs AS (SELECT doc_a, doc_b, pa - pb AS diag,
                    pa - ROW_NUMBER() OVER (
                      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
             FROM m),
    agg AS (SELECT doc_a, doc_b, COUNT(*) AS run_len
            FROM runs GROUP BY doc_a, doc_b, diag, isl),
    pairs AS (SELECT doc_a, doc_b,
                     CAST(MAX(run_len) + 7 AS BIGINT) AS overlap_tokens
              FROM agg GROUP BY doc_a, doc_b),
    straddle AS (
      SELECT CASE WHEN doc_a % 97 = 0 THEN doc_b ELSE doc_a END AS doc_id,
             CASE WHEN doc_a % 97 = 0 THEN doc_a ELSE doc_b END AS bench_id,
             overlap_tokens
      FROM pairs WHERE (doc_a % 97 = 0) <> (doc_b % 97 = 0))
    SELECT doc_id,
           CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_partners,
           CAST(MAX(overlap_tokens) AS BIGINT) AS max_overlap_tokens,
           CAST(CASE WHEN MAX(overlap_tokens) >= 13 THEN 1 ELSE 0 END
                AS INTEGER) AS contaminated
    FROM straddle GROUP BY doc_id
    """.replace("{TOKS}", _D_TOKS),
)
def text_decontaminate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by VERBATIM overlap — the Lee et al.
    ExactSubstr primitive pointed at eval leakage instead of dedup:
    training documents that share a ≥8-token verbatim run with any
    held-out benchmark document (here: doc_id % 97 = 0 plays the
    benchmark), with the standard ≥13-token contamination flag
    (the n-gram-Jaccard `text_contamination` catches paraphrase-level
    leakage; this catches the exact-copy kind that actually inflates
    benchmarks). Per train doc: how many benchmark partners, the
    longest verbatim overlap, and the flag.

    Scale: identical machinery to dedup_exact_substring (df-capped
    shingle inverted index + diagonal islands); production would
    shingle ONLY the benchmark side and semi-join the corpus stream
    against that tiny index — same plan, one side bounded."""
    from ..operators.dedup import exact_substring_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_substring_pairs(docs, min_tokens=8, max_shingle_df=64)
    bench_a = F.col("doc_a") % 97 == 0
    bench_b = F.col("doc_b") % 97 == 0
    straddle = pairs.filter(bench_a != bench_b).select(
        F.when(bench_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "doc_id"
        ),
        F.when(bench_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "bench_id"
        ),
        "overlap_tokens",
    )
    return straddle.groupBy("doc_id").agg(
        F.count_distinct("bench_id").alias("n_bench_partners"),
        F.max("overlap_tokens").alias("max_overlap_tokens"),
        F.when(F.max("overlap_tokens") >= 13, 1)
        .otherwise(0)
        .cast("int")
        .alias("contaminated"),
    )


@register(
    "text_bm25_rank",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    per_doc AS (
      SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl,
             {", ".join(
                 f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT)"
                 f" AS tf_{w}" for w in _BM25_TERMS)}
      FROM toks),
    corpus AS (
      SELECT COUNT(*) AS nd, SUM(dl) AS tot,
             {", ".join(
                 f"SUM(CASE WHEN tf_{w} > 0 THEN 1 ELSE 0 END) AS df_{w}"
                 for w in _BM25_TERMS)}
      FROM per_doc)
    SELECT doc_id,
           ({" + ".join(_bm25_term_sql(w) for w in _BM25_TERMS)})
             / 1048576.0 AS bm25
    FROM per_doc CROSS JOIN corpus
    WHERE {" + ".join(f"tf_{w}" for w in _BM25_TERMS)} > 0
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document for a fixed 3-term query,
    entirely JVM-side: per-doc term frequencies are IN-ROW array
    filters (no explode, no shuffle), corpus statistics (N, Σdl, df_t)
    are ONE 1-row aggregate broadcast back, and each term's score is a
    fixed-point floor so the cross-term sum is order-free. The idf is
    the log-free odds form (N−df+0.5)/(df+0.5) — monotone in the
    classic log idf (same ranking) but exactly reproducible across
    engines, the same libm-avoidance contract as the rest of the repo
    (Robertson–Spärck Jones weight without the log).

    Scale: corpus stats are O(1) state; the scoring pass is one narrow
    map over the corpus — BM25 at 100 TB is scan-bound, exactly as it
    should be."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions import text as TX

    toks = TX.tokens(F.col("text"))

    def _tf(word: str) -> F.Column:
        # NB: a plain `lambda x, w=w:` would have arity 2, which PySpark's
        # HOF layer interprets as (element, index) — the index would
        # silently shadow the captured word. A factory keeps arity 1.
        return F.size(F.filter(toks, lambda x: x == F.lit(word)))

    per_doc = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[_tf(w).cast("long").alias(f"tf_{w}") for w in _BM25_TERMS],
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dl").alias("tot"),
        *[
            F.sum(F.when(F.col(f"tf_{w}") > 0, 1).otherwise(0)).alias(f"df_{w}")
            for w in _BM25_TERMS
        ],
    )

    def term_fp(w: str) -> F.Column:
        tf = F.col(f"tf_{w}").cast("double")
        df = F.col(f"df_{w}")
        idf = (F.lit(2) * (F.col("nd") - df) + F.lit(1)).cast("double") / (
            F.lit(2) * df + F.lit(1)
        ).cast("double")
        dl_ratio = (
            F.col("dl").cast("double") * F.col("nd").cast("double")
        ) / F.col("tot").cast("double")
        score = (
            idf
            * (tf * F.lit(2.2))
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * dl_ratio))
        )
        return F.when(
            F.col(f"tf_{w}") == 0, F.lit(0).cast("long")
        ).otherwise(F.floor(score * F.lit(1048576.0)).cast("long"))

    total_tf = sum(
        (F.col(f"tf_{w}") for w in _BM25_TERMS[1:]),
        F.col(f"tf_{_BM25_TERMS[0]}"),
    )
    fp_sum = sum(
        (term_fp(w) for w in _BM25_TERMS[1:]), term_fp(_BM25_TERMS[0])
    )
    return (
        per_doc.crossJoin(F.broadcast(corpus))
        .filter(total_tf > 0)
        .select("doc_id", (fp_sum / F.lit(1048576.0)).alias("bm25"))
    )


@register(
    "text_bpe_pair_counts",
    """
    WITH words AS (
      SELECT doc_id, w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''),
    wf AS (SELECT w, COUNT(*) AS f FROM words GROUP BY w),
    syms AS (
      SELECT w, f,
             list_append(list_filter(string_split(w, ''), c -> c <> ''),
                         '</w>') AS s
      FROM wf),
    prs AS (
      SELECT f, unnest(list_transform(generate_series(1, len(s) - 1),
                       i -> s[i] || ' ' || s[i + 1])) AS pair
      FROM syms),
    agg AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
            FROM prs GROUP BY pair)
    SELECT pair, cnt, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rn
          FROM agg)
    WHERE rn <= 20
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING statistic — the corpus-weighted adjacent-symbol-pair
    counts whose argmax picks the next merge (the other half of
    text_bpe_encode, which APPLIES a trained table). Same dictionary-
    encoding scale pattern: pair extraction runs over the DISTINCT
    vocabulary (thousands of rows) weighted by word frequency, so the
    raw corpus is touched exactly once for the frequency agg no matter
    how long the words are; a full BPE trainer is a driver loop calling
    this with the merge table applied so far — each iteration is one
    bounded vocab pass, which is how sentencepiece-scale training
    parallelizes over a 100 TB corpus. Top-20 with a deterministic
    (count desc, pair asc) tiebreak."""
    from ..functions import exprs as EX

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    syms = F.concat(
        F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
        F.array(F.lit("</w>")),
    )

    def pair_list(s: F.Column) -> F.Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(s, i), F.element_at(s, i + 1)
            ),
        )

    prs = wf.select(
        "f", F.explode(EX.bind(syms, pair_list)).alias("pair")
    )
    agg = prs.groupBy("pair").agg(F.sum("f").alias("cnt"))
    w = W.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .select("pair", "cnt", "rank")
    )


@register("text_bpe_train", _bpe_train_oracle(_BPE_TRAIN_ITERS))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE TRAINER loop — 4 unrolled iterations of (pair counts →
    argmax → apply merge → recount), completing the family:
    text_bpe_pair_counts is ONE iteration's statistic, text_bpe_encode
    APPLIES a finished table, this LEARNS the table. Output: the merge
    table itself, (it, merge_pair, cnt).

    Each iteration is pure DataFrame algebra: the 1-row argmax
    broadcast-crossJoins back onto the vocabulary and the merge applies
    as a replace over the delimiter-wrapped symbol stream — the whole
    4-iteration trainer is ONE lazy Catalyst plan, no driver-side
    collect between iterations (the data-dependent merge pair rides in
    a Column, not in Python). Same adjacent-repeat equivalence envelope
    as text_bpe_encode (both engines share replace() semantics, so
    oracle parity is exact regardless); pinned against a reference
    Python BPE trainer in tests/test_llm_ops.py.

    Scale: the corpus is touched ONCE (the word-frequency agg); every
    iteration after that runs over the DISTINCT vocabulary — thousands
    of rows at any corpus size (dictionary encoding, the
    sentencepiece-at-scale pattern). The union's 4 branches repeat the
    identical wf/e0 subtrees textually, but AQE's exchange reuse
    collapses them at runtime (the executed plan carries ReusedExchange
    nodes over the shared aggregates — verified on local[4]); a
    many-hundred-merge production run would checkpoint the vocab table
    once instead of relying on reuse."""
    from functools import reduce

    from ..functions import exprs as EX

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    enc0 = F.concat(
        F.lit("|"),
        F.array_join(
            F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
            "|",
        ),
        F.lit("|</w>|"),
    )
    cur = wf.select("f", enc0.alias("e"))

    def pair_counts(df: DataFrame) -> DataFrame:
        syms = F.filter(
            F.split(F.col("e"), r"\|"), lambda c: c != F.lit("")
        )

        def pair_list(s: F.Column) -> F.Column:
            return F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(s, i), F.element_at(s, i + 1)
                ),
            )

        prs = df.select(
            "f", F.explode(EX.bind(syms, pair_list)).alias("pair")
        )
        return prs.groupBy("pair").agg(
            F.sum("f").cast("long").alias("cnt")
        )

    bests: list[DataFrame] = []
    for it in range(1, _BPE_TRAIN_ITERS + 1):
        best = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )
        bests.append(
            best.select(
                F.lit(it).cast("int").alias("it"),
                F.col("pair").alias("merge_pair"),
                "cnt",
            )
        )
        if it < _BPE_TRAIN_ITERS:
            pat = F.concat(
                F.lit("|"),
                F.replace(F.col("pair"), F.lit(" "), F.lit("|")),
                F.lit("|"),
            )
            rep = F.concat(
                F.lit("|"),
                F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                F.lit("|"),
            )
            picked = best.select(pat.alias("__pat"), rep.alias("__rep"))
            cur = cur.crossJoin(F.broadcast(picked)).select(
                "f",
                F.replace(
                    F.col("e"), F.col("__pat"), F.col("__rep")
                ).alias("e"),
            )
    return reduce(DataFrame.unionAll, bests)


@register(
    "text_ngram_novelty",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    shl AS (SELECT doc_id, list_distinct({_D_SHINGLES}) AS l FROM toks),
    ex AS (SELECT doc_id,
                  unnest(list_transform(l,
                    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS shash
           FROM shl),
    owner AS (SELECT shash, MIN(doc_id) AS owner FROM ex GROUP BY shash)
    SELECT e.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN o.owner = e.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN o.owner = e.doc_id THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM ex e JOIN owner o USING (shash)
    GROUP BY e.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty attribution: every distinct trigram is OWNED by
    the lowest doc_id containing it; a document's novelty is the
    fraction of its shingles it owns — the corpus-order contribution
    curve (what fraction of each new document is text the corpus has
    not seen before). The dedup/contamination families detect COPIES;
    this measures marginal new content, the curation metric for
    deciding whether another crawl snapshot still adds information.

    Plan: the same integer shingle-hash explode as the dedup family,
    one min-agg over the shingle key (map-side combinable), one
    keyed join back, one doc agg — all shuffles on shingle or doc
    keys, never pairwise. The novelty double is one IEEE division of
    two exact ints."""
    from ..functions import exprs as EX
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    sh = F.array_distinct(TX.word_shingles(toks, 3))

    def hashes(l: F.Column) -> F.Column:
        return F.transform(l, lambda s: TX.minhash_base_hashes(s)[0])

    ex = (
        docs.select(
            "doc_id",
            F.explode_outer(EX.bind(sh, hashes)).alias("shash"),
        )
        .filter(F.col("shash").isNotNull())
    )
    owner = ex.groupBy("shash").agg(F.min("doc_id").alias("owner"))
    novel = F.sum(
        F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        ex.join(owner, "shash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            (
                novel.cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
    )


@register(
    "text_lexical_stats",
    rf"""
    WITH tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS words,
           CAST(COUNT(*) AS BIGINT) AS distinct_toks,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
           CAST(1000 * COUNT(*) // SUM(c) AS BIGINT) AS ttr_milli,
           CAST(1000 * COUNT(*) FILTER (WHERE c = 1) // SUM(c) AS BIGINT)
             AS hapax_milli,
           CAST(1000 * SUM(LENGTH(tok) * c) // SUM(c) AS BIGINT)
             AS avg_len_milli
    FROM tf GROUP BY doc_id
    """,
)
def text_lexical_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity statistics per document: type-token ratio,
    hapax-legomenon fraction and mean token length — the boilerplate /
    template-spam gate (machine-generated and boilerplate text shows
    abnormally LOW TTR and hapax rates; keyword-stuffed spam abnormally
    high). Next to the stopword/length heuristics in
    text_quality_score, TTR is the standard third axis (CCNet, Gopher
    both gate on near-duplicate token distributions).

    Plan: ONE shuffle — explode to (doc, token), partial-aggregated
    count per (doc, token), then the per-doc rollup rides the same
    partitioning (two-level agg, no second exchange of corpus-sized
    data). All integer fixed-point (×1000 DIV), bit-stable across
    engines."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, F.lit(1)).otherwise(F.lit(0)))
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("c").alias("words"),
            F.count(F.lit(1)).alias("distinct_toks"),
            hapax.alias("hapax"),
            F.sum(F.length("tok") * F.col("c")).alias("char_mass"),
        )
        .select(
            "doc_id",
            "words",
            "distinct_toks",
            "hapax",
            F.expr("1000 * distinct_toks DIV words").alias("ttr_milli"),
            F.expr("1000 * hapax DIV words").alias("hapax_milli"),
            F.expr("1000 * char_mass DIV words").alias("avg_len_milli"),
        )
    )


@register(
    "text_cdc_chunks",
    f"""
    WITH {_CDC_CHUNKS_SQL}
    SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MIN(clen) AS BIGINT) AS chunk_len
    FROM chunks GROUP BY fp HAVING COUNT(*) > 1
    ORDER BY n_occ DESC, fp LIMIT 50
    """,
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup — the rsync/LBFS/
    data-pipeline trick that finds SHARED SUBSTRINGS across documents
    without any pairwise comparison: a boundary falls wherever the
    rolling 8-gram fingerprint (md5 here) lands in a 1/32 target band,
    so two documents sharing a run of text cut it at the SAME offsets
    and produce bit-identical chunks; duplicated chunks then surface
    with one groupBy. Boundary placement is stateless per position
    (the fingerprint is a pure function of the 8-gram), which is what
    makes it embarrassingly parallel; a LAG-based anti-chain pass
    enforces the >=8-char minimum chunk size (deterministic relational
    variant of sequential CDC's skip rule — documented divergence:
    suppression here compares against the previous RAW cut, sequential
    CDC against the previous KEPT cut).

    Scale: positions explode within a doc (bounded by doc length), the
    only corpus-wide shuffles are the per-doc cut windows (doc-keyed)
    and the final chunk-hash groupBy; blobs never move — only 16-byte
    fingerprints. This is the substring-dedup primitive that scales
    where the suffix-diagonal index (dedup_exact_substring) needs its
    df cap. Span derivation shared with dedup_cdc_pairs
    (operators/dedup.py:cdc_chunks)."""
    from ..operators.dedup import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return (
        cdc_chunks(docs).groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("clen").cast("long").alias("chunk_len"),
        )
        .filter(F.col("n_occ") > 1)
        .orderBy(F.desc("n_occ"), "fp")
        .limit(50)
    )


@register(
    "text_skipgram_pairs",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents
                  WHERE lang = 'en'),
    flat AS (SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS w
             FROM toks),
    offs AS (SELECT unnest([-2, -1, 1, 2]) AS d),
    ctx AS (
      SELECT c.w AS center, x.w AS context
      FROM flat c
      CROSS JOIN offs o
      JOIN flat x ON x.doc_id = c.doc_id AND x.p = c.p + o.d)
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
    FROM ctx GROUP BY center, context
    ORDER BY n DESC, center, context LIMIT 100
    """,
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair extraction with a ±2 window —
    the word2vec/fastText training-pair generator: each token pairs
    with its neighbors at offsets {{-2,-1,1,2}}, counted corpus-wide.
    The window is an EQUI-join, not a range join: context positions are
    materialized by a 4-row offset explode on the center side, then
    joined on (doc_id, position) — so the plan is one position-keyed
    shuffle and scales linearly in tokens × window, never tokens².
    Top-100 pairs by count (deterministic tiebreak) as the view; the
    full pair stream is what a trainer would consume."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    )
    flat = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
            "p", "w"
        ),
    )
    ctx = (
        flat.select(
            "doc_id",
            F.col("w").alias("center"),
            F.explode(
                F.array(*[F.lit(d) for d in (-2, -1, 1, 2)])
            ).alias("d"),
            (F.col("p") + F.col("d")).alias("cp"),
        )
        .join(
            flat.select(
                "doc_id",
                F.col("p").alias("cp"),
                F.col("w").alias("context"),
            ),
            ["doc_id", "cp"],
        )
    )
    return (
        ctx.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "center", "context")
        .limit(100)
    )


@register(
    "text_neg_sampling_table",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents
                  WHERE lang = 'en'),
    counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
      HAVING COUNT(*) >= 5),
    wt AS (
      SELECT w, cnt,
             CAST(FLOOR(1048576.0 * sqrt(CAST(cnt AS DOUBLE)
                    * sqrt(CAST(cnt AS DOUBLE)))) AS BIGINT) AS w_fixed
      FROM counts),
    tot AS (SELECT CAST(SUM(w_fixed) AS BIGINT) AS tw FROM wt)
    SELECT w AS word, cnt,
           w_fixed,
           CAST(w_fixed AS DOUBLE) / CAST(t.tw AS DOUBLE) AS prob
    FROM wt CROSS JOIN tot t
    """,
)
def text_neg_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec negative-sampling distribution: unigram counts
    raised to the 3/4 power, normalized. cnt^0.75 is computed as
    sqrt(cnt · sqrt(cnt)) — two correctly-rounded IEEE sqrts and one
    multiply, the same no-transcendentals trick as
    sample_temperature_weights' alpha=0.5 — then fixed-pointed to
    floor(2^20 · x) so the normalizing sum is an exact integer and the
    final shares are single divides. Words under 5 occurrences are
    dropped (the min-count vocab rule). Scale: one exploded token agg
    into a vocab-bounded table; the 1-row total broadcasts."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    )
    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )
    wt = counts.select(
        "w",
        "cnt",
        F.floor(
            F.lit(1048576.0)
            * F.sqrt(
                F.col("cnt").cast("double")
                * F.sqrt(F.col("cnt").cast("double"))
            )
        )
        .cast("long")
        .alias("w_fixed"),
    ).localCheckpoint()
    tot = wt.agg(F.sum("w_fixed").cast("long").alias("tw"))
    return wt.crossJoin(F.broadcast(tot)).select(
        F.col("w").alias("word"),
        "cnt",
        "w_fixed",
        (F.col("w_fixed").cast("double") / F.col("tw").cast("double")).alias(
            "prob"
        ),
    )


@register(
    "text_rake_keywords",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents
                  WHERE lang = 'en'),
    flat AS (SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS w
             FROM toks),
    marked AS (
      SELECT doc_id, p, w,
             CASE WHEN list_contains({_SW['en']}, w)
                       OR NOT regexp_matches(w, '^[a-z]+$')
                  THEN 1 ELSE 0 END AS b
      FROM flat),
    isl AS (SELECT doc_id, p, w, b,
                   SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS g
            FROM marked),
    members AS (SELECT doc_id, g, w FROM isl WHERE b = 0),
    plen AS (SELECT doc_id, g, COUNT(*) AS phrase_len
             FROM members GROUP BY doc_id, g),
    stats AS (
      SELECT m.w AS word, SUM(p2.phrase_len) AS degree, COUNT(*) AS freq
      FROM members m JOIN plen p2 ON m.doc_id = p2.doc_id AND m.g = p2.g
      GROUP BY m.w)
    SELECT word, CAST(degree AS BIGINT) AS degree,
           CAST(freq AS BIGINT) AS freq,
           CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) AS score
    FROM stats ORDER BY score DESC, degree DESC, word LIMIT 30
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the English
    corpus: candidate phrases are maximal runs of content tokens
    between delimiters (stopwords or any non-[a-z] token), a word's
    degree is the summed length of every phrase it appears in (its
    co-occurrence mass), and score = degree/freq favors words that
    travel in long multi-word phrases — the zero-model keyword
    extractor that needs no training corpus.

    All-integer until the single output division. Scale: phrase
    segmentation is the gaps-and-islands pattern — posexplode, one
    doc-keyed running-sum window, one (doc, island) agg — then one
    word-keyed agg; no self-joins over the corpus, vocabulary-bounded
    output."""
    from ..functions.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
            "p", "w"
        ),
    )
    sw = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    marked = toks.withColumn(
        "b",
        F.when(
            F.array_contains(sw, F.col("w"))
            | ~F.col("w").rlike("^[a-z]+$"),
            1,
        ).otherwise(0),
    )
    wdoc = W.partitionBy("doc_id").orderBy("p")
    isl = marked.withColumn("g", F.sum("b").over(wdoc))
    members = isl.filter(F.col("b") == 0).select("doc_id", "g", "w")
    plen = members.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("phrase_len")
    )
    stats = (
        members.join(plen, ["doc_id", "g"])
        .groupBy(F.col("w").alias("word"))
        .agg(
            F.sum("phrase_len").cast("long").alias("degree"),
            F.count(F.lit(1)).cast("long").alias("freq"),
        )
    )
    return (
        stats.withColumn(
            "score",
            F.col("degree").cast("double") / F.col("freq").cast("double"),
        )
        .orderBy(F.desc("score"), F.desc("degree"), "word")
        .limit(30)
    )


@register(
    "text_gopher_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_D_TOKS}, w -> w <> '') AS t
      FROM documents),
    st AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT)
               AS n_chars,
             CAST(len(list_filter(t,
                    w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
               AS n_alpha,
             CAST(len(list_distinct(list_filter(t, w -> list_contains(
                    ['the','be','to','of','and','that','have','with'], w))))
               AS BIGINT) AS n_stop
      FROM toks)
    SELECT doc_id, n_words,
           n_chars * 1000 // n_words AS mean_wlen_fp,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
            + CASE WHEN 3 * n_words <= n_chars AND n_chars <= 10 * n_words
                   THEN 2 ELSE 0 END
            + CASE WHEN 5 * n_alpha >= 4 * n_words THEN 4 ELSE 0 END
            + CASE WHEN n_stop >= 2 THEN 8 ELSE 0 END AS BIGINT)
             AS rules_mask,
           (n_words BETWEEN 50 AND 100000
            AND 3 * n_words <= n_chars AND n_chars <= 10 * n_words
            AND 5 * n_alpha >= 4 * n_words
            AND n_stop >= 2) AS gopher_pass
    FROM st WHERE n_words > 0
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, the filter bundle
    Dolma/RedPajama-style pipelines apply verbatim), per document as a
    RULES BITMASK plus the conjunctive pass flag: (1) word count in
    [50, 100k], (2) mean word length in [3, 10] — cross-multiplied so
    the bound check is exact integers, (4) ≥80%% of words contain an
    alphabetic character, (8) ≥2 distinct stop words from the published
    8-word list. The bitmask (not just the verdict) is the practical
    output: pipeline dashboards track WHICH rule kills documents per
    source before tuning thresholds. Differs from text_quality_score
    (additive heuristic score) by being the named, thresholded,
    auditable rule set.

    Scale: entirely ROW-LOCAL — one tokenize plus four HOF aggregates
    inside a single projection; no shuffle at all (the plan is scan →
    project). Exactly the shape that saturates IO at 100 TB."""
    from ..functions import exprs as EX
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(TX.tokens(F.col("text")), lambda w: w != "")

    def stats(tc: F.Column) -> F.Column:
        stop = F.array(
            *[
                F.lit(w)
                for w in ("the", "be", "to", "of", "and", "that", "have", "with")
            ]
        )
        return F.struct(
            F.size(tc).cast("long").alias("n_words"),
            F.aggregate(
                tc,
                F.lit(0).cast("long"),
                lambda acc, w: acc + F.length(w),
            ).alias("n_chars"),
            F.size(
                F.filter(tc, lambda w: w.rlike("[a-zA-Z]"))
            ).cast("long").alias("n_alpha"),
            F.size(
                F.array_distinct(
                    F.filter(tc, lambda w: F.array_contains(stop, w))
                )
            ).cast("long").alias("n_stop"),
        )

    st = docs.select("doc_id", EX.bind(t, stats).alias("s")).select(
        "doc_id", "s.*"
    )
    nw, nc, na, ns = (
        F.col("n_words"),
        F.col("n_chars"),
        F.col("n_alpha"),
        F.col("n_stop"),
    )
    r1 = nw.between(50, 100000)
    r2 = (3 * nw <= nc) & (nc <= 10 * nw)
    r3 = 5 * na >= 4 * nw
    r4 = ns >= 2
    mask = (
        F.when(r1, 1).otherwise(0)
        + F.when(r2, 2).otherwise(0)
        + F.when(r3, 4).otherwise(0)
        + F.when(r4, 8).otherwise(0)
    )
    return st.filter(nw > 0).select(
        "doc_id",
        "n_words",
        F.expr("n_chars * 1000 DIV n_words").alias("mean_wlen_fp"),
        mask.cast("long").alias("rules_mask"),
        (r1 & r2 & r3 & r4).alias("gopher_pass"),
    )


# --------------------------------------------------------------------------
# in-engine trained quality classifier (r13, VERDICT r12 #5)
# --------------------------------------------------------------------------

_QT_BUCKETS = 512
_QT_DENS = (1, 2, 4)
# Bootstrap label: English ∩ the Gopher word-count gate. The full
# gopher_pass conjunction is degenerate on this synthetic corpus (the
# 8-word stopword rule never fires — zero docs pass), so the bootstrap
# keeps the one rule with signal; production swaps any label Column in
# (operators/quality.py takes it as a parameter).
_QT_LABEL_SQL = "lang = 'en' AND len(t) BETWEEN 50 AND 100000"


def _qt_label_col():
    # the ONE definition, shared with the streaming twin (ADVICE r13)
    from ..operators.quality import default_quality_label

    return default_quality_label()


def _quality_train_ctes(
    B: int = _QT_BUCKETS, dens=_QT_DENS, occ_where: str = "TRUE"
) -> str:
    """The unrolled fixed-point trainer as a DuckDB CTE chain; the
    final weights CTE is named w{len(dens)}. ``occ_where`` restricts
    which documents TRAIN (their occurrences feed h/z/g); lab keeps
    every doc plus its hash-split bucket ``sb`` so a holdout query can
    score the rest."""
    p_expr = (
        "GREATEST(CAST(0 AS BIGINT), LEAST(CAST(1000 AS BIGINT),"
        " 500 + (z // 1000) // 4))"
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, lang, list_filter({_D_TOKS}, w -> w <> '') AS t
      FROM documents),
    lab AS (
      SELECT doc_id,
             CASE WHEN {_QT_LABEL_SQL} THEN 1 ELSE 0 END AS y,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10 AS sb,
             list_append(list_transform(t || {_QM_BIGRAMS_SQL},
                 f -> ('0x' || substr(md5(f), 1, 15))::BIGINT % {B}),
               CAST({B} AS BIGINT)) AS fb
      FROM toks),
    occ AS (SELECT doc_id, unnest(fb) AS b FROM lab WHERE {occ_where}),
    h AS (SELECT b, SUM(c * c) AS h
          FROM (SELECT doc_id, b, COUNT(*)::BIGINT AS c
                FROM occ GROUP BY doc_id, b)
          GROUP BY b),
    w0 AS (SELECT unnest(generate_series(0, {B}))::BIGINT AS b,
                  CAST(0 AS BIGINT) AS w)"""
    for t, den in enumerate(dens, start=1):
        p = t - 1
        sql += f""",
    z{t} AS (SELECT occ.doc_id, SUM(w{p}.w) AS z
             FROM occ JOIN w{p} USING (b) GROUP BY occ.doc_id),
    e{t} AS (SELECT lab.doc_id, {p_expr} - 1000 * y AS err
             FROM lab JOIN z{t} USING (doc_id)),
    g{t} AS (SELECT b, SUM(err) AS g
             FROM occ JOIN e{t} USING (doc_id) GROUP BY b),
    w{t} AS (SELECT w{p}.b,
                    w{p}.w - COALESCE((g{t}.g * 1000) // (h.h * {den}), 0)
                      AS w
             FROM w{p} LEFT JOIN h USING (b) LEFT JOIN g{t} USING (b))"""
    return sql


@register(
    "text_quality_train",
    _quality_train_ctes()
    + f"""
    SELECT CAST(b AS INTEGER) AS bucket, CAST(w AS BIGINT) AS w FROM w{len(_QT_DENS)}
    """,
)
def text_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the hashed-linear quality classifier in-engine (the
    text_quality_model inference shape, with learned instead of fixed
    weights): full-batch logistic regression over hashed unigram+bigram
    bucket counts against the bootstrap label (English ∩ Gopher
    word-count gate), 3 unrolled diagonally-preconditioned gradient
    steps with a halving learning-rate schedule, everything in integer
    fixed-point (micro weights, milli probabilities, hard sigmoid,
    truncating DIV) so the oracle hash-compares exactly. Output: the
    learned weight table, (bucket, w) with bucket 512 = bias.

    Plan/scale (operators/quality.py): the model state between steps is
    a 1-row array<long> broadcast — per-doc scores are ROW-LOCAL array
    folds (the DSIR broadcast-model shape; the corpus text never
    shuffles). Per step the only shuffle is the ≤513-row bucket-keyed
    gradient agg; the h preconditioner (one (doc,bucket) count agg,
    computed once) makes the step size corpus-size-invariant with no N
    division. The single lazy plan re-scans the corpus once per step
    plus once for h (4 scans at T=3; the tiny model/h frames are
    lazily persisted, else the nested chain re-derives the feature
    subtree exponentially) — a many-epoch run would checkpoint the
    feature frame; at 3 steps the scans are the honest scan-bound
    cost.
    Measured train AUC 0.785/0.970/0.797 at sf0.001/0.01/0.1 (every
    constant-LR variant oscillates to ≤0.5 on these collinear count
    features — the schedule is what converges)."""
    from ..operators.quality import quality_train

    docs = load_table(spark, sf_dir, "documents")
    return quality_train(
        docs, _qt_label_col(), buckets=_QT_BUCKETS, lr_dens=_QT_DENS
    )


@register(
    "text_quality_train_eval",
    _quality_train_ctes()
    + f""",
    zf AS (SELECT occ.doc_id, SUM(w{len(_QT_DENS)}.w) AS z
           FROM occ JOIN w{len(_QT_DENS)} USING (b)
           GROUP BY occ.doc_id),
    pf AS (SELECT lab.doc_id, y,
                  GREATEST(CAST(0 AS BIGINT), LEAST(CAST(1000 AS BIGINT),
                    500 + (z // 1000) // 4)) AS p
           FROM lab JOIN zf USING (doc_id)),
    dec AS (SELECT p // 100 AS decile,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(y)::BIGINT AS n_pos
            FROM pf GROUP BY 1),
    tot AS (SELECT SUM(n_pos) AS tp, SUM(n_docs) - SUM(n_pos) AS tn
            FROM dec)
    SELECT CAST(decile AS INTEGER) AS decile, n_docs, n_pos,
           CAST((1000 * SUM(n_pos) OVER (ORDER BY decile DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             // NULLIF(tp, 0) AS BIGINT) AS cum_tpr_permille,
           CAST((1000 * SUM(n_docs - n_pos) OVER (ORDER BY decile DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             // NULLIF(tn, 0) AS BIGINT) AS cum_fpr_permille
    FROM dec, tot
    """,
)
def text_quality_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVALUATE the trained classifier: score every document with the
    just-trained weights and report the ROC staircase at decile
    granularity — per probability decile, doc/positive counts plus the
    cumulative TPR/FPR permille from the top decile down (the points
    whose trapezoid is the AUC; integer-exact, one IEEE-free DIV per
    cell). The decile table is the curation dashboard read: positives
    concentrating in high deciles = the trainer learned the label.

    Plan/scale: the training subplan is text_quality_train verbatim;
    scoring is one more broadcast crossJoin + row-local fold (no
    shuffle), the decile agg is ≤11 groups (map-side combinable), and
    the ROC window runs over ≤11 rows in one partition. Train-set eval
    by design — the holdout split belongs to pipeline_eval_holdout's
    family."""
    from ..operators.quality import (
        quality_features,
        quality_scored,
        quality_train_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(
        docs, _qt_label_col(), buckets=_QT_BUCKETS
    )
    model = quality_train_model(
        feats, buckets=_QT_BUCKETS, lr_dens=_QT_DENS
    )
    scored = quality_scored(feats, model)
    dec = scored.groupBy(
        F.expr("p_milli DIV 100").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    tot = dec.agg(
        F.sum("n_pos").alias("tp"),
        (F.sum("n_docs") - F.sum("n_pos")).alias("tn"),
    )
    w_roc = W.orderBy(F.desc("decile")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        dec.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(w_roc))
        .withColumn(
            "cum_neg", F.sum(F.col("n_docs") - F.col("n_pos")).over(w_roc)
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_docs",
            "n_pos",
            F.expr("(1000 * cum_pos) DIV NULLIF(tp, 0)").alias(
                "cum_tpr_permille"
            ),
            F.expr("(1000 * cum_neg) DIV NULLIF(tn, 0)").alias(
                "cum_fpr_permille"
            ),
        )
    )


@register(
    "text_quality_train_holdout",
    _quality_train_ctes(occ_where="sb < 8")
    + f""",
    occv AS (SELECT doc_id, unnest(fb) AS b FROM lab WHERE sb = 8),
    zf AS (SELECT occv.doc_id, SUM(w{len(_QT_DENS)}.w) AS z
           FROM occv JOIN w{len(_QT_DENS)} USING (b)
           GROUP BY occv.doc_id),
    pf AS (SELECT lab.doc_id, y,
                  GREATEST(CAST(0 AS BIGINT), LEAST(CAST(1000 AS BIGINT),
                    500 + (z // 1000) // 4)) AS p
           FROM lab JOIN zf USING (doc_id)
           WHERE lab.sb = 8),
    dec AS (SELECT p // 100 AS decile,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(y)::BIGINT AS n_pos
            FROM pf GROUP BY 1),
    tot AS (SELECT SUM(n_pos) AS tp, SUM(n_docs) - SUM(n_pos) AS tn
            FROM dec)
    SELECT CAST(decile AS INTEGER) AS decile, n_docs, n_pos,
           CAST((1000 * SUM(n_pos) OVER (ORDER BY decile DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             // NULLIF(tp, 0) AS BIGINT) AS cum_tpr_permille,
           CAST((1000 * SUM(n_docs - n_pos) OVER (ORDER BY decile DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             // NULLIF(tn, 0) AS BIGINT) AS cum_fpr_permille
    FROM dec, tot
    """,
)
def text_quality_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HOLDOUT evaluation of the trained quality classifier — the
    ML-hygiene counterpart of text_quality_train_eval (which scores the
    training set and so reads optimistically high, 0.97 AUC at sf0.01
    vs a ~0.77 label-noise ceiling = memorization): train ONLY on the
    deterministic 80% hash-split train buckets, then report the decile
    ROC staircase on the UNSEEN val bucket. The split is the same
    md5(doc_id)%10 assignment as hash_split (operators/sampling.py) —
    stable across runs and engines, so train/val membership is part of
    the reproducible contract, not a seed.

    Measured holdout AUC (trapezoid of this staircase): 0.21 / 0.45 /
    0.80 at sf0.001/0.01/0.1 — the textbook capacity curve for 512
    hashed features: at ≤400 train docs the model memorizes buckets
    (train-eval 0.97 vs holdout 0.45 at sf0.01 — exactly the gap this
    query exists to expose), at 4000 docs it generalizes to the ~0.8
    label ceiling. At real corpus scales docs ≫ buckets and the two
    evals converge.

    Plan/scale: identical to text_quality_train (the training subplan
    filters its occurrence explode to train docs — a narrow predicate
    before the bucket agg, no new shuffle) plus one broadcast-scored
    val pass and the ≤11-row decile/ROC tail. Train docs never mix
    into the eval: the val pass is a disjoint hash-bucket filter of
    the same scan."""
    from ..operators.quality import (
        quality_features,
        quality_scored,
        quality_train_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    sb = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    feats = quality_features(
        docs, _qt_label_col(), buckets=_QT_BUCKETS
    ).withColumn("__sb", sb)
    model = quality_train_model(
        feats.filter(F.col("__sb") < 8).drop("__sb"),
        buckets=_QT_BUCKETS,
        lr_dens=_QT_DENS,
    )
    scored = quality_scored(
        feats.filter(F.col("__sb") == 8).drop("__sb"), model
    )
    dec = scored.groupBy(
        F.expr("p_milli DIV 100").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    tot = dec.agg(
        F.sum("n_pos").alias("tp"),
        (F.sum("n_docs") - F.sum("n_pos")).alias("tn"),
    )
    w_roc = W.orderBy(F.desc("decile")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        dec.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(w_roc))
        .withColumn(
            "cum_neg", F.sum(F.col("n_docs") - F.col("n_pos")).over(w_roc)
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_docs",
            "n_pos",
            F.expr("(1000 * cum_pos) DIV NULLIF(tp, 0)").alias(
                "cum_tpr_permille"
            ),
            F.expr("(1000 * cum_neg) DIV NULLIF(tn, 0)").alias(
                "cum_fpr_permille"
            ),
        )
    )


# --------------------------------------------------------------------------
# Gopher repetition-filter bundle (completes the text_gopher_quality family)
# --------------------------------------------------------------------------

_REP_ORACLE_NGRAM = """
      CASE WHEN len(G) = 0 THEN 0 ELSE
        list_max(list_transform(list_distinct(G),
          d -> len(list_filter(G, x -> x = d))))
        * (length(list_min(list_filter(list_distinct(G),
             d -> len(list_filter(G, x -> x = d)) =
                  list_max(list_transform(list_distinct(G),
                    d2 -> len(list_filter(G, x -> x = d2))))))) - {nm1})
        * 1000 // c_all END
"""


def _rep_oracle_gram_sql(n: int) -> str:
    grams = ", ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return (
        f"CASE WHEN nw >= {n} THEN list_transform("
        f"generate_series(1, nw-{n - 1}), i -> concat_ws(' ', {grams}))"
        " ELSE CAST([] AS VARCHAR[]) END"
    )


@register(
    "text_gopher_repetition",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_D_TOKS}, w -> w <> '') AS t
      FROM documents),
    st AS (
      SELECT doc_id, t, len(t) AS nw,
             CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT)
               AS c_all
      FROM toks WHERE len(t) > 0),
    g AS (
      SELECT doc_id, t, nw, c_all,
             {_rep_oracle_gram_sql(2)} AS g2,
             {_rep_oracle_gram_sql(3)} AS g3,
             {_rep_oracle_gram_sql(4)} AS g4,
             {_rep_oracle_gram_sql(5)} AS g5
      FROM st),
    f AS (
      SELECT doc_id, c_all,
             {_REP_ORACLE_NGRAM.replace("G", "g2").format(nm1=1)} AS top2_fp,
             {_REP_ORACLE_NGRAM.replace("G", "g3").format(nm1=2)} AS top3_fp,
             {_REP_ORACLE_NGRAM.replace("G", "g4").format(nm1=3)} AS top4_fp,
             CASE WHEN len(g5) = 0 THEN 0 ELSE
               CAST(list_sum(list_transform(generate_series(1, nw), p ->
                 CASE WHEN len(list_filter(
                        generate_series(GREATEST(1, p-4),
                                        LEAST(p, len(g5))),
                        i -> len(list_filter(g5, x -> x = g5[i])) > 1)) > 0
                      THEN length(t[p]) ELSE 0 END)) AS BIGINT)
               * 1000 // c_all END AS dup5_fp
      FROM g)
    SELECT doc_id,
           CAST(top2_fp AS BIGINT) AS top2_fp,
           CAST(top3_fp AS BIGINT) AS top3_fp,
           CAST(top4_fp AS BIGINT) AS top4_fp,
           CAST(dup5_fp AS BIGINT) AS dup5_fp,
           CAST(CASE WHEN top2_fp <= 200 THEN 1 ELSE 0 END
            + CASE WHEN top3_fp <= 180 THEN 2 ELSE 0 END
            + CASE WHEN top4_fp <= 160 THEN 4 ELSE 0 END
            + CASE WHEN dup5_fp <= 150 THEN 8 ELSE 0 END AS BIGINT)
             AS rules_mask,
           (top2_fp <= 200 AND top3_fp <= 180 AND top4_fp <= 160
            AND dup5_fp <= 150) AS rep_pass
    FROM f
    """,
)
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher REPETITION rules (Rae et al. 2021 Table A1 — the
    other half of the filter bundle text_gopher_quality started):
    per document, the permille of characters (1) in all occurrences of
    the most frequent word 2-gram (threshold ≤200), (2) 3-gram (≤180),
    (3) 4-gram (≤160), and (4) inside any DUPLICATED 5-gram occurrence
    (positional coverage, ≤150) — as integer fixed-point fractions plus
    the auditable per-rule bitmask and conjunctive verdict, mirroring
    the quality query's dashboard shape. Ties for 'most frequent' break
    to the lexicographically smallest gram in BOTH engines (the Spark
    sorted-run scan keeps the first maximum of the sorted gram array;
    the oracle takes list_min of the argmax set).

    Scale: entirely ROW-LOCAL (scan → project, zero shuffles), but
    unlike the quality rules the naive per-rule mode is O(grams ×
    distinct) string compares per document — the Spark side instead
    sorts each gram array once and finds the modal run with ONE linear
    aggregate() fold (struct accumulator, O(g log g)), and the dup-5
    coverage tests membership against the (typically tiny) duplicated-
    gram set rather than re-counting per position. The DuckDB oracle
    keeps the quadratic spelling — correctness-only."""
    from ..functions import exprs as EX
    from ..functions import text as TX

    # The modal-run folds are ~3 ms/doc of interpreted-HOF compute —
    # far above scan cost — so parallelism, not IO, is the budget. The
    # local corpus is ONE row group (= one scan partition); the round-
    # robin rebalance ships each text once so every core shares the
    # fold work. At production scale the scan's own file parallelism
    # already spreads it, and for compute-dominated rows the rebalance
    # stays cheap relative to the projection it feeds.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def modal_run_fp(grams: F.Column, n: int, c_all: F.Column) -> F.Column:
        """(max run count × gram char-length × 1000) DIV c_all over the
        sorted gram array; 0 when no grams."""

        def scan(s: F.Column) -> F.Column:
            init = F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit("").alias("bg"),
                F.lit(0).cast("long").alias("bc"),
            )

            def step(acc: F.Column, x: F.Column) -> F.Column:
                run = F.when(
                    x == acc["prev"], acc["run"] + 1
                ).otherwise(F.lit(1).cast("long"))
                better = run > acc["bc"]
                return F.struct(
                    x.alias("prev"),
                    run.alias("run"),
                    F.when(better, x).otherwise(acc["bg"]).alias("bg"),
                    F.when(better, run).otherwise(acc["bc"]).alias("bc"),
                )

            fin = F.aggregate(s, init, step)
            return (
                fin["bc"]
                * (F.length(fin["bg"]) - (n - 1))
                * 1000
            )

        return F.when(
            F.size(grams) > 0, EX.bind(F.array_sort(grams), scan)
        ).otherwise(F.lit(0).cast("long"))

    t = F.filter(TX.tokens(F.col("text")), lambda w: w != "")

    def build(tc: F.Column) -> F.Column:
        c_all = F.aggregate(
            tc, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        )
        g2 = TX.word_shingles(tc, 2)
        g3 = TX.word_shingles(tc, 3)
        g4 = TX.word_shingles(tc, 4)
        g5 = TX.word_shingles(tc, 5)

        def dup5_cov(g5c: F.Column) -> F.Column:
            s = F.array_sort(g5c)
            # CASE guard (same footgun as _core._bigram_lm): a doc with
            # exactly 5 tokens has ONE 5-gram, which passes the outer
            # size(g5) > 0 gate but makes sequence(1, 0) — the
            # DESCENDING [1, 0] — so element_at(s, 0) dies under ANSI.
            # The oracle's generate_series(1, 0) is simply empty; a
            # single 5-gram can never be duplicated, so dups = [].
            dups = F.when(
                F.size(s) >= 2,
                F.array_distinct(
                    F.filter(
                        F.transform(
                            F.sequence(F.lit(1), F.size(s) - 1),
                            lambda i: F.when(
                                F.element_at(s, i)
                                == F.element_at(s, i + 1),
                                F.element_at(s, i),
                            ),
                        ),
                        lambda x: x.isNotNull(),
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))

            def with_flags(dp: F.Column) -> F.Column:
                flags = F.transform(
                    g5c,
                    lambda x: F.array_contains(dp, x).cast("int"),
                )

                def cover(fl: F.Column) -> F.Column:
                    return F.aggregate(
                        F.sequence(F.lit(1), F.size(tc)),
                        F.lit(0).cast("long"),
                        lambda acc, p: acc
                        + F.when(
                            F.exists(
                                F.sequence(
                                    F.greatest(F.lit(1), p - 4),
                                    F.least(p, F.size(g5c)),
                                ),
                                lambda i: F.element_at(fl, i) == 1,
                            ),
                            F.length(F.element_at(tc, p)),
                        ).otherwise(F.lit(0).cast("long")),
                    )

                return EX.bind(flags, cover)

            return EX.bind(dups, with_flags)

        return F.struct(
            c_all.alias("c_all"),
            modal_run_fp(g2, 2, c_all).alias("m2"),
            modal_run_fp(g3, 3, c_all).alias("m3"),
            modal_run_fp(g4, 4, c_all).alias("m4"),
            F.when(F.size(g5) > 0, EX.bind(g5, dup5_cov) * 1000)
            .otherwise(F.lit(0).cast("long"))
            .alias("m5"),
        )

    st = docs.select(
        "doc_id",
        F.size(EX.bind(F.col("text"), lambda _: t)).alias("__nw"),
        EX.bind(t, build).alias("s"),
    ).filter(F.col("__nw") > 0)
    out = st.select(
        "doc_id",
        F.expr("s.m2 DIV s.c_all").alias("top2_fp"),
        F.expr("s.m3 DIV s.c_all").alias("top3_fp"),
        F.expr("s.m4 DIV s.c_all").alias("top4_fp"),
        F.expr("s.m5 DIV s.c_all").alias("dup5_fp"),
    )
    mask = (
        F.when(F.col("top2_fp") <= 200, 1).otherwise(0)
        + F.when(F.col("top3_fp") <= 180, 2).otherwise(0)
        + F.when(F.col("top4_fp") <= 160, 4).otherwise(0)
        + F.when(F.col("dup5_fp") <= 150, 8).otherwise(0)
    )
    return out.select(
        "doc_id",
        "top2_fp",
        "top3_fp",
        "top4_fp",
        "dup5_fp",
        mask.cast("long").alias("rules_mask"),
        (
            (F.col("top2_fp") <= 200)
            & (F.col("top3_fp") <= 180)
            & (F.col("top4_fp") <= 160)
            & (F.col("dup5_fp") <= 150)
        ).alias("rep_pass"),
    )


@register(
    "text_tokenizer_fertility",
    f"""
    WITH words AS (
      SELECT lang, w
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''),
    vocab AS (SELECT DISTINCT w FROM words),
    enc AS (
      SELECT w,
             {_bpe_oracle_replace_chain(
                 "'|' || array_to_string(string_split(w, ''), '|')"
                 " || '|</w>|'"
             )} AS e
      FROM vocab),
    vn AS (
      SELECT w, CAST(length(w) AS BIGINT) AS n_chars,
             CAST(len(string_split(e, '|')) - 2 AS BIGINT) AS n_sub
      FROM enc)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST((1000 * SUM(n_sub)) // COUNT(*) AS BIGINT)
             AS fertility_permille,
           CAST((1000 * SUM(n_chars)) // SUM(n_sub) AS BIGINT)
             AS chars_per_sub_permille
    FROM words JOIN vn USING (w)
    GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY by language — the diagnostic multilingual
    pipelines read before fixing a tokenizer budget (fertility =
    subwords per word; high-fertility languages pay more sequence
    length per word, the classic BPE-bias finding): per language,
    corpus word count, post-merge subword count (the text_bpe_encode
    merge table applied verbatim), character count, and the two
    integer fixed-point ratios (subwords/word and chars/subword,
    permille). Completes the BPE family as its per-language dashboard:
    encode (per doc) → pair counts → trainer → fertility (per lang).

    Scale: the same dictionary-encoding pattern as text_bpe_encode —
    the expensive chained-replace encode runs over the DISTINCT
    vocabulary only, then broadcast-joins back onto the exploded
    corpus; the final agg is ≤|languages| rows. One explode + one
    distinct + one broadcast join, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.select("w").distinct()
    enc = F.concat(
        F.lit("|"),
        F.array_join(
            F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
            "|",
        ),
        F.lit("|</w>|"),
    )
    for a, b in _BPE_MERGES:
        pa = "|" + a.replace(" ", "|") + "|"
        enc = F.replace(enc, F.lit(pa), F.lit(f"|{b}|"))
    vn = vocab.select(
        "w",
        F.length("w").cast("long").alias("n_chars_w"),
        (F.size(F.split(enc, r"\|")) - 2).cast("long").alias("n_sub"),
    )
    return (
        words.join(F.broadcast(vn), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
            F.sum("n_chars_w").cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_subwords",
            "n_chars",
            F.expr("(1000 * n_subwords) DIV n_words").alias(
                "fertility_permille"
            ),
            F.expr("(1000 * n_chars) DIV n_subwords").alias(
                "chars_per_sub_permille"
            ),
        )
    )
