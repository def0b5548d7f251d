"""'multimodal'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DataFrame,
    F,
    SparkSession,
    W,
    _FRAME_DUP_TH,
    _SCENE_CUT_TH,
    _VAD_TH,
    _phash_block_sql,
    load_table,
    register,
)


# ---- multimodal -----------------------------------------------------------


@register(
    "multimodal_audio_energy",
    """
    WITH w AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
               AS win
      FROM documents),
    seg AS (
      SELECT doc_id, CAST(win AS INTEGER) AS win_idx,
             substr(text, win * 64 + 1, 64) AS s
      FROM w)
    SELECT doc_id, win_idx,
           CAST(length(s) AS INTEGER) AS n_samples,
           sqrt(list_sum(list_transform(string_split(s, ''),
                                        c -> ord(c) * ord(c)))
                / CAST(length(s) AS DOUBLE)) AS rms
    FROM seg
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over the audio-like payload (byte = unsigned
    PCM sample; real pipelines decode with librosa here). 1→N Arrow rows
    per payload; exact integer square-sums, one IEEE divide+sqrt. The
    oracle rebuilds the same windows from the UTF-8 text (ASCII corpus ⇒
    byte == codepoint)."""
    from ..operators.multimodal import audio_window_energy, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return audio_window_energy(with_binary_payload(docs), window=64)


@register(
    "multimodal_audio_vad_spans",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(generate_series(0,
        CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
        AS win, text
      FROM documents),
    seg AS (
      SELECT doc_id, CAST(win AS INTEGER) AS win,
             substr(text, win * 64 + 1, 64) AS s
      FROM w),
    e AS (
      SELECT doc_id, win,
             CAST(list_sum(list_transform(string_split(s, ''),
               c -> ord(c) * ord(c))) AS BIGINT) AS ssq,
             CAST(length(s) AS BIGINT) AS n
      FROM seg),
    act AS (
      SELECT doc_id, win, ssq,
             win - ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY win) AS island
      FROM e WHERE ssq > {_VAD_TH} * n)
    SELECT doc_id,
           CAST(MIN(win) AS INTEGER) AS span_start,
           CAST(MAX(win) AS INTEGER) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(ssq) AS BIGINT) AS ssq_total
    FROM act GROUP BY doc_id, island
    HAVING COUNT(*) >= 2
    """,
)
def multimodal_audio_vad_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style span extraction over audio-like payloads —
    the segmentation step speech training pipelines run to cut silence
    and keep contiguous speech: windowed integer energy (exact
    sum-of-squares, the float RMS never gates anything), an all-integer
    activity threshold (mean square > TH), and a gaps-and-islands merge
    of adjacent active windows into spans (≥2 windows). Composes the
    audio-energy windowing with the islands idiom; a real pipeline
    swaps the byte-energy for decoded PCM energy in the same Arrow
    slot.

    Scale: windows are generated in-row (no shuffle), the only shuffle
    is the doc-keyed islands window + span agg — frames of one clip
    co-locate, same as scene cuts."""
    docs = load_table(spark, sf_dir, "documents")
    n_wins = (
        F.ceil(F.octet_length(F.col("text")) / F.lit(64.0)).cast("int") - 1
    )
    # empty payload ⇒ n_wins = -1 and sequence(0,-1) is DESCENDING in
    # Spark (two phantom zero-length windows) while DuckDB's
    # generate_series(0,-1) is empty — filter before the explode so
    # both engines agree that an empty clip has no windows at all
    seg = docs.filter(F.octet_length(F.col("text")) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins)).alias("win"),
        F.col("text"),
    ).select(
        "doc_id",
        "win",
        F.substring(F.col("text"), F.col("win") * 64 + 1, 64).alias("s"),
    )
    ssq = F.aggregate(
        F.split(F.col("s"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c == "", F.lit(0)).otherwise(F.ascii(c) * F.ascii(c)),
    )
    e = seg.select(
        "doc_id",
        "win",
        ssq.alias("ssq"),
        F.length("s").cast("long").alias("n"),
    )
    wd = W.partitionBy("doc_id").orderBy("win")
    act = e.filter(F.col("ssq") > F.lit(_VAD_TH) * F.col("n")).withColumn(
        "island", F.col("win") - F.row_number().over(wd)
    )
    return (
        act.groupBy("doc_id", "island")
        .agg(
            F.min("win").cast("int").alias("span_start"),
            F.max("win").cast("int").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("ssq").alias("ssq_total"),
        )
        .filter(F.col("n_windows") >= 2)
        .drop("island")
    )


@register(
    "multimodal_audio_snr_gate",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(generate_series(0,
        CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
        AS win, text
      FROM documents),
    e AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(
               string_split(substr(text, win * 64 + 1, 64), ''),
               c -> ord(c) * ord(c))) AS BIGINT) AS ssq,
             CAST(length(substr(text, win * 64 + 1, 64)) AS BIGINT) AS n
      FROM w),
    g AS (
      SELECT doc_id,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 1 ELSE 0 END)
               AS active_windows,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 0 ELSE 1 END)
               AS silent_windows,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN ssq ELSE 0 END)
               AS active_ssq,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 0 ELSE ssq END)
               AS silent_ssq,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN n ELSE 0 END)
               AS active_n,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 0 ELSE n END)
               AS silent_n
      FROM e GROUP BY doc_id)
    SELECT doc_id,
           CAST(active_windows AS BIGINT) AS active_windows,
           CAST(silent_windows AS BIGINT) AS silent_windows,
           CAST(CASE WHEN silent_ssq > 0 AND active_n > 0
                THEN ((active_ssq * 1000000) // active_n)
                     // (CASE WHEN silent_n > 0
                         THEN silent_ssq // silent_n ELSE 1 END)
                ELSE -1 END AS BIGINT) AS snr_fp,
           CAST(CASE WHEN active_windows * 5 >= 2 * (active_windows
                + silent_windows) THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM g
    """,
)
def multimodal_audio_snr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio quality gate: per-payload signal-to-noise proxy — mean
    active-window energy over mean silent-window energy (the VAD
    threshold splits the windows), all-integer fixed-point (10^6-scaled
    DIV chain, -1 sentinel when a side is empty), plus the keep rule
    speech curation applies (≥40%% of windows active — clips that are
    mostly silence are dropped before they waste tokenizer/encoder
    budget). One in-row window explode + one doc-keyed agg; no Python,
    no shuffle beyond the agg."""
    docs = load_table(spark, sf_dir, "documents")
    n_wins = (
        F.ceil(F.octet_length(F.col("text")) / F.lit(64.0)).cast("int") - 1
    )
    # empty payload: sequence(0,-1) would emit phantom windows (the
    # vad_spans divergence) — an empty clip has no windows on either
    # engine, and therefore 0%% activity: correctly absent from output
    seg = docs.filter(F.octet_length(F.col("text")) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins)).alias("win"),
        F.col("text"),
    ).select(
        "doc_id",
        F.substring(F.col("text"), F.col("win") * 64 + 1, 64).alias("s"),
    )
    ssq = F.aggregate(
        F.split(F.col("s"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c == "", F.lit(0)).otherwise(F.ascii(c) * F.ascii(c)),
    )
    e = seg.select(
        "doc_id",
        ssq.alias("ssq"),
        F.length("s").cast("long").alias("n"),
    )
    act = F.col("ssq") > F.lit(_VAD_TH) * F.col("n")
    g = e.groupBy("doc_id").agg(
        F.sum(F.when(act, 1).otherwise(0)).alias("active_windows"),
        F.sum(F.when(act, 0).otherwise(1)).alias("silent_windows"),
        F.sum(F.when(act, F.col("ssq")).otherwise(0)).alias("active_ssq"),
        F.sum(F.when(act, 0).otherwise(F.col("ssq"))).alias("silent_ssq"),
        F.sum(F.when(act, F.col("n")).otherwise(0)).alias("active_n"),
        F.sum(F.when(act, 0).otherwise(F.col("n"))).alias("silent_n"),
    )
    snr = F.expr(
        "CASE WHEN silent_ssq > 0 AND active_n > 0"
        " THEN ((active_ssq * 1000000) DIV active_n)"
        " DIV (CASE WHEN silent_n > 0"
        " THEN silent_ssq DIV silent_n ELSE 1 END)"
        " ELSE -1 END"
    )
    return g.select(
        "doc_id",
        F.col("active_windows").cast("long").alias("active_windows"),
        F.col("silent_windows").cast("long").alias("silent_windows"),
        snr.cast("long").alias("snr_fp"),
        F.expr(
            "CASE WHEN active_windows * 5 >= 2 *"
            " (active_windows + silent_windows) THEN 1 ELSE 0 END"
        ).cast("int").alias("kept"),
    )


@register(
    "multimodal_scene_cuts",
    f"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx, feat,
             feat - LAG(feat) OVER (PARTITION BY doc_id
               ORDER BY frame_idx) AS d0
      FROM feat)
    SELECT doc_id, frame_idx, feat,
           CAST(ABS(d0) AS BIGINT) AS delta,
           CASE WHEN d0 IS NULL THEN FALSE
                ELSE ABS(d0) > {_SCENE_CUT_TH} END AS is_cut
    FROM d
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over video-like payloads — the clip
    segmentation step video training pipelines run before sampling
    clips: per-frame scalar feature (operators/multimodal.py:
    frame_features, the decode stand-in in an Arrow batch), then a
    frame-lag delta per document and a threshold flag, all JVM-side.
    Byte-sum frames stand in for luminance histograms (codecs absent);
    the analytics layer — lag window keyed by doc, exact integer
    deltas, deterministic threshold — is the real operator.

    Scale: decode is one narrow Arrow pass (payloads never shuffle);
    the cut detection shuffles only (doc_id, frame_idx, feat) rows on
    doc_id for the lag window — frames of one video co-locate, which is
    also what a real GOP-aware decoder needs."""
    from ..operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    feats = frame_features(with_binary_payload(docs), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    d0 = F.col("feat") - F.lag("feat").over(wd)
    return feats.withColumn("d0", d0).select(
        "doc_id",
        "frame_idx",
        "feat",
        F.abs(F.col("d0")).cast("long").alias("delta"),
        F.when(F.col("d0").isNull(), F.lit(False))
        .otherwise(F.abs(F.col("d0")) > _SCENE_CUT_TH)
        .alias("is_cut"),
    )


@register(
    "multimodal_video_keyframes",
    f"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c)))  AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx,
             ABS(feat - LAG(feat) OVER (PARTITION BY doc_id
               ORDER BY frame_idx)) AS delta,
             CASE WHEN COALESCE(ABS(feat - LAG(feat)
                    OVER (PARTITION BY doc_id ORDER BY frame_idx)), 0)
                    > {_SCENE_CUT_TH} THEN 1 ELSE 0 END AS cut
      FROM feat),
    sc AS (
      SELECT doc_id, frame_idx, delta,
             SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS scene_id
      FROM d)
    SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
           frame_idx AS keyframe_idx,
           CAST(delta AS BIGINT) AS kf_delta,
           CAST(n_frames AS BIGINT) AS n_frames
    FROM (
      SELECT *, COUNT(*) OVER (PARTITION BY doc_id, scene_id) AS n_frames,
             ROW_NUMBER() OVER (PARTITION BY doc_id, scene_id
               ORDER BY delta DESC NULLS LAST, frame_idx) AS rn
      FROM sc)
    WHERE rn = 1
    """,
)
def multimodal_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection per scene — the representative-frame pick
    that turns scene segments into a thumbnail/embedding budget: within
    each scene (running-sum ids over threshold cuts, same machinery as
    pipeline_clip_extract), the keyframe is the frame of maximum
    feature change (the most visually informative), deterministic
    tiebreak on frame index; a single-frame scene keeps its only frame
    with NULL delta. All windows share the one doc-keyed shuffle."""
    from ..operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    feats = frame_features(with_binary_payload(docs), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.abs(F.col("feat") - F.lag("feat").over(wd))
    d = feats.select(
        "doc_id",
        "frame_idx",
        delta.alias("delta"),
        F.when(
            F.coalesce(delta, F.lit(0)) > _SCENE_CUT_TH, F.lit(1)
        ).otherwise(F.lit(0)).alias("cut"),
    )
    wcum = wd.rowsBetween(W.unboundedPreceding, W.currentRow)
    sc = d.withColumn("scene_id", F.sum("cut").over(wcum)).drop("cut")
    ws = W.partitionBy("doc_id", "scene_id")
    wr = ws.orderBy(F.desc_nulls_last("delta"), F.asc("frame_idx"))
    return (
        sc.withColumn("n_frames", F.count(F.lit(1)).over(ws))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("scene_id").cast("long").alias("scene_id"),
            F.col("frame_idx").alias("keyframe_idx"),
            F.col("delta").cast("long").alias("kf_delta"),
            F.col("n_frames").cast("long").alias("n_frames"),
        )
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           (i * octet_length(encode(text))) // 4 AS frame_offset,
           least(16, octet_length(encode(text))
                     - (i * octet_length(encode(text))) // 4) AS frame_len
    FROM documents, unnest(generate_series(0, 3)) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1→k rows per payload via mapInPandas): the batch
    shape of any frame/chunk extractor, with deterministic offsets so the
    oracle can pin them."""
    from ..operators.multimodal import sample_frames, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(docs), k=4)


@register(
    "multimodal_features",
    """
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      md5(text) AS content_md5,
      CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
      CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
      CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column + Arrow-batched
    mapInPandas feature extraction (the decode step is a deterministic
    fake — codecs aren't in this container; the Spark-side batch shape is
    the real thing being exercised)."""
    from ..operators.multimodal import extract_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs))


@register(
    "multimodal_dedup_payload",
    """
    WITH h AS (SELECT doc_id, md5(text) AS content_md5,
                      octet_length(encode(text)) AS n_bytes
               FROM documents)
    SELECT content_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper,
           CAST(MIN(n_bytes) AS BIGINT) AS n_bytes
    FROM h GROUP BY content_md5 HAVING COUNT(*) >= 1
    """,
)
def multimodal_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection on the BINARY payload column (the image
    dedup step every multimodal crawl runs first: same bytes ⇒ same
    asset, before any perceptual hashing). md5 runs JVM-side directly on
    the binary column — the payload never leaves the executor and the
    shuffle carries 16-byte digests, not blobs; min-id keeper per
    content group mirrors the text dedup contract."""
    from ..operators.multimodal import with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs)
    return (
        b.select(
            "doc_id",
            F.md5(F.col("payload")).alias("content_md5"),
            F.length(F.col("payload")).alias("n_bytes"),
        )
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.min("n_bytes").cast("long").alias("n_bytes"),
        )
    )


@register(
    "multimodal_near_dup_phash",
    f"""
    WITH sig AS (
      SELECT doc_id,
             [{", ".join(_phash_block_sql(b) for b in range(8))}] AS s
      FROM documents WHERE octet_length(encode(text)) = length(text)),
    banded AS (
      SELECT doc_id, s, j AS band_idx, s[2 * j + 1] || s[2 * j + 2] AS band
      FROM sig, (SELECT unnest([0, 1, 2, 3]) AS j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.s AS sa, b.s AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band = b.band
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(8 - (SELECT COUNT(*) FROM unnest(range(8)) t(i)
                     WHERE sa[i + 1] = sb[i + 1]) AS INT) AS diff_blocks
    FROM cand
    WHERE (SELECT COUNT(*) FROM unnest(range(8)) t(i)
           WHERE sa[i + 1] = sb[i + 1]) >= 6
    """,
)
def multimodal_near_dup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-duplicate detection for binary assets:
    the payload is cut into 8 equal blocks, each block hashed to a
    16-bit signature (a block-level 'phash' — robust to edits localized
    in ≤2 blocks, the CDC-chunking idea), signatures banded 2-blocks-
    per-band into 4 keys, candidates generated by band equi-join
    (pigeonhole: ≤2 differing blocks can kill at most 2 of 4 bands), and
    verified by block hamming distance ≥6-of-8. All JVM-side on the
    BINARY payload — blobs never shuffle, 4-char band digests do. The
    oracle computes the same signatures over the text (payload = UTF-8
    bytes; the ASCII guard keeps char and byte slicing identical)."""
    from ..operators.multimodal import with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs).filter(
        F.length(F.col("payload")) == F.length(F.col("text"))
    )
    sigs = F.array(
        *[
            F.substring(
                F.md5(
                    F.expr(
                        f"substring(payload, 1 + {bi} *"
                        " ((length(payload) + 7) DIV 8),"
                        " (length(payload) + 7) DIV 8)"
                    )
                ),
                1,
                4,
            )
            for bi in range(8)
        ]
    )
    sig = b.select("doc_id", sigs.alias("s"))
    banded = sig.select(
        "doc_id",
        "s",
        F.posexplode(
            F.array(
                *[
                    F.concat(
                        F.col("s").getItem(2 * j), F.col("s").getItem(2 * j + 1)
                    )
                    for j in range(4)
                ]
            )
        ).alias("band_idx", "band"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.s").alias("s"),
            F.col("b.s").alias("s2"),
        )
        .distinct()
    )
    same = sum(
        (F.col("s").getItem(i) == F.col("s2").getItem(i)).cast("int")
        for i in range(8)
    )
    return (
        cand.withColumn("n_same", same)
        .filter(F.col("n_same") >= 6)
        .select(
            "doc_a", "doc_b", (F.lit(8) - F.col("n_same")).cast("int").alias("diff_blocks")
        )
    )


@register(
    "multimodal_phash_calibration",
    f"""
    WITH sig AS (
      SELECT doc_id,
             [{", ".join(_phash_block_sql(b) for b in range(8))}] AS s
      FROM documents WHERE octet_length(encode(text)) = length(text)),
    banded AS (
      SELECT doc_id, s, j AS band_idx, s[2 * j + 1] || s[2 * j + 2] AS band
      FROM sig, (SELECT unnest([0, 1, 2, 3]) AS j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.s AS sa, b.s AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band = b.band
       AND a.doc_id < b.doc_id),
    d AS (
      SELECT CAST(8 - (SELECT COUNT(*) FROM unnest(range(8)) t(i)
                       WHERE sa[i + 1] = sb[i + 1]) AS INT) AS diff_blocks
      FROM cand)
    SELECT diff_blocks, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM d GROUP BY diff_blocks
    """,
)
def multimodal_phash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold CALIBRATION for the perceptual-hash near-dup: the
    distribution of block-hamming distances over ALL band-join
    candidates (multimodal_near_dup_phash keeps only diff ≤ 2) — the
    histogram an operator reads to place the verify threshold: a clean
    valley between the near-dup mass at 0-2 and the collision tail at
    5+ says the banding is calibrated; mass in the middle says the
    block size disagrees with the edit granularity. Same signature and
    candidate machinery; the only change is aggregating instead of
    filtering."""
    from ..operators.multimodal import with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs).filter(
        F.length(F.col("payload")) == F.length(F.col("text"))
    )
    sigs = F.array(
        *[
            F.substring(
                F.md5(
                    F.expr(
                        f"substring(payload, 1 + {bi} *"
                        " ((length(payload) + 7) DIV 8),"
                        " (length(payload) + 7) DIV 8)"
                    )
                ),
                1,
                4,
            )
            for bi in range(8)
        ]
    )
    sig = b.select("doc_id", sigs.alias("s"))
    banded = sig.select(
        "doc_id",
        "s",
        F.posexplode(
            F.array(
                *[
                    F.concat(
                        F.col("s").getItem(2 * j), F.col("s").getItem(2 * j + 1)
                    )
                    for j in range(4)
                ]
            )
        ).alias("band_idx", "band"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.s").alias("s"),
            F.col("b.s").alias("s2"),
        )
        .distinct()
    )
    same = sum(
        (F.col("s").getItem(i) == F.col("s2").getItem(i)).cast("int")
        for i in range(8)
    )
    return (
        cand.select((F.lit(8) - same).cast("int").alias("diff_blocks"))
        .groupBy("diff_blocks")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "multimodal_frame_dedup",
    f"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx,
             CASE WHEN LAG(feat) OVER w IS NULL
                    OR ABS(feat - LAG(feat) OVER w) > {_FRAME_DUP_TH}
                  THEN 1 ELSE 0 END AS fresh
      FROM feat WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
    runs AS (
      SELECT doc_id, frame_idx,
             SUM(fresh) OVER (PARTITION BY doc_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM d)
    SELECT doc_id, CAST(MIN(frame_idx) AS INTEGER) AS kept_frame,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM runs GROUP BY doc_id, run_id
    """,
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal frame deduplication: collapse runs of near-identical
    consecutive frames (|Δfeature| ≤ TH) to their first frame — the
    static-shot pruning video pipelines run before feature extraction,
    typically dropping 30-60%% of frames of talking-head/slide content
    (here TH=64 ≈ p45 of deltas, so runs genuinely form). The dual of
    scene cuts: cuts find where content CHANGES, this collapses where
    it DOESN'T.

    Plan: the same narrow Arrow frame-feature pass as scene cuts, one
    doc-keyed shuffle shared by the lag window, the running-sum run ids
    and the run rollup — frames of one video co-locate once."""
    from ..operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    feats = frame_features(with_binary_payload(docs), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("feat").over(wd)
    fresh = (
        F.when(
            prev.isNull() | (F.abs(F.col("feat") - prev) > _FRAME_DUP_TH),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("fresh")
    )
    runs = feats.select("doc_id", "frame_idx", fresh).withColumn(
        "run_id",
        F.sum("fresh").over(
            wd.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.min("frame_idx").alias("kept_frame"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .select("doc_id", "kept_frame", "run_len")
    )


@register(
    "multimodal_av_align",
    f"""
    WITH seg AS (
      SELECT doc_id,
             unnest(generate_series(0,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
               AS win,
             text
      FROM documents WHERE octet_length(encode(text)) > 0),
    e AS (
      SELECT doc_id, win,
             CAST(list_sum(list_transform(string_split(
               substr(text, win * 64 + 1, 64), ''),
               c -> ord(c) * ord(c))) AS BIGINT) AS ssq,
             CAST(length(substr(text, win * 64 + 1, 64)) AS BIGINT) AS n
      FROM seg),
    act AS (
      SELECT doc_id, win,
             win - ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY win) AS island
      FROM e WHERE ssq > {_VAD_TH} * n),
    spans AS (
      SELECT doc_id, MIN(win) AS span_start, MAX(win) AS span_end
      FROM act GROUP BY doc_id, island HAVING COUNT(*) >= 2),
    f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    cuts AS (
      SELECT doc_id, frame_idx,
             CASE WHEN LAG(feat) OVER w IS NULL THEN 0
                  WHEN ABS(feat - LAG(feat) OVER w) > {_SCENE_CUT_TH}
                  THEN 1 ELSE 0 END AS is_cut
      FROM feat WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
    sc AS (
      SELECT doc_id, frame_idx,
             SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS scene_id
      FROM cuts),
    scenes AS (
      SELECT doc_id, scene_id, MIN(frame_idx) AS smin, MAX(frame_idx) AS smax
      FROM sc GROUP BY doc_id, scene_id)
    SELECT s.doc_id,
           CAST(s.span_start AS INTEGER) AS span_start,
           CAST(sn.scene_id AS BIGINT) AS scene_id,
           CAST(GREATEST(s.span_start * 2, sn.smin) AS INTEGER)
             AS overlap_start,
           CAST(LEAST(s.span_end * 2 + 1, sn.smax) AS INTEGER)
             AS overlap_end,
           CAST(LEAST(s.span_end * 2 + 1, sn.smax)
                - GREATEST(s.span_start * 2, sn.smin) + 1 AS BIGINT)
             AS overlap_frames
    FROM spans s JOIN scenes sn
      ON s.doc_id = sn.doc_id
     AND s.span_start * 2 <= sn.smax
     AND s.span_end * 2 + 1 >= sn.smin
    """,
)
def multimodal_av_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-visual alignment: join speech spans (the VAD islands, in
    64-byte audio windows) to video scenes (cut-delimited frame runs,
    32-byte frames — one audio window spans exactly 2 frames) of the
    SAME asset by interval overlap — the "which scenes contain speech"
    selector that talking-head/captioned-clip curation runs before
    sampling clips (a speech span touching scene k means scene k is a
    speech scene; overlap_frames sizes the evidence).

    Plan: the VAD span derivation and the scene derivation each share
    one doc-keyed shuffle; the alignment is a doc_id EQUI-join with the
    interval test as a residual — spans and scenes of one asset number
    in the tens, so the per-doc pair term is trivially bounded and no
    banded-range machinery is needed (contrast q_join_banded_range,
    where the intervals do not share a bounding key)."""
    docs = load_table(spark, sf_dir, "documents")

    # speech spans (the VAD island derivation, inline)
    n_wins = (
        F.ceil(F.octet_length(F.col("text")) / F.lit(64.0)).cast("int") - 1
    )
    seg = docs.filter(F.octet_length(F.col("text")) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins)).alias("win"),
        F.col("text"),
    ).select(
        "doc_id",
        "win",
        F.substring(F.col("text"), F.col("win") * 64 + 1, 64).alias("s"),
    )
    ssq = F.aggregate(
        F.split(F.col("s"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c == "", F.lit(0)).otherwise(F.ascii(c) * F.ascii(c)),
    )
    e = seg.select(
        "doc_id", "win", ssq.alias("ssq"), F.length("s").cast("long").alias("n")
    )
    wd = W.partitionBy("doc_id").orderBy("win")
    act = e.filter(F.col("ssq") > F.lit(_VAD_TH) * F.col("n")).withColumn(
        "island", F.col("win") - F.row_number().over(wd)
    )
    spans = (
        act.groupBy("doc_id", "island")
        .agg(
            F.min("win").alias("span_start"),
            F.max("win").alias("span_end"),
            F.count(F.lit(1)).alias("nw"),
        )
        .filter(F.col("nw") >= 2)
        .select("doc_id", "span_start", "span_end")
    )

    # scenes (the scene-cut run derivation, inline)
    from ..operators.multimodal import frame_features, with_binary_payload

    feats = frame_features(with_binary_payload(docs), frame=32)
    wf = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("feat").over(wf)
    is_cut = (
        F.when(prev.isNull(), F.lit(0))
        .when(F.abs(F.col("feat") - prev) > _SCENE_CUT_TH, F.lit(1))
        .otherwise(F.lit(0))
    )
    sc = feats.select("doc_id", "frame_idx", is_cut.alias("is_cut")).withColumn(
        "scene_id",
        F.sum("is_cut").over(
            wf.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    scenes = sc.groupBy("doc_id", "scene_id").agg(
        F.min("frame_idx").alias("smin"), F.max("frame_idx").alias("smax")
    )

    fs = F.col("span_start") * 2
    fe = F.col("span_end") * 2 + 1
    return (
        spans.join(
            scenes,
            (spans.doc_id == scenes.doc_id)
            & (fs <= F.col("smax"))
            & (fe >= F.col("smin")),
        )
        .select(
            spans.doc_id.alias("doc_id"),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("scene_id").cast("long").alias("scene_id"),
            F.greatest(fs, F.col("smin")).cast("int").alias("overlap_start"),
            F.least(fe, F.col("smax")).cast("int").alias("overlap_end"),
            (
                F.least(fe, F.col("smax")) - F.greatest(fs, F.col("smin")) + 1
            )
            .cast("long")
            .alias("overlap_frames"),
        )
    )
