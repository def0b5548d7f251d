"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or NotImplementedError) — but everything Spark-side is
real and tested: the schema (binary payload + metadata struct), the
mapInPandas batch iteration, the output schema contract, and partition
behavior. Swapping `_fake_decode` for PIL/librosa is a one-function
change.

At 100 TB: binary columns ride Parquet as-is (no row-group bloat beyond
payload size); decode/feature-extract runs where the data is, batch-at-a-
time via Arrow; `spark.sql.files.maxPartitionBytes` bounds per-task memory
with large payloads; feature outputs are narrow columns so downstream
shuffles never carry the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len int, content_md5 string, first_byte int, "
    "fake_width int, fake_height int"
)


def decode_image(data: bytes) -> object:
    """Real codec hook — not available in this container.

    Reference pipelines would decode here (PIL.Image.open, cv2.imdecode).
    """
    raise NotImplementedError(
        "image codecs not installed; use fake_decode for deterministic tests"
    )


def fake_decode(data: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives 'dimensions' from the
    payload bytes so tests and oracles can pin exact values."""
    return {
        "byte_len": len(data),
        "content_md5": hashlib.md5(data).hexdigest(),
        "first_byte": data[0] if data else None,
        "fake_width": len(data) % 640,
        "fake_height": (len(data) * 7) % 480,
    }


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = UTF-8 bytes of the text
    (deterministic), metadata = typed struct. Real tables would read the
    binary column straight from Parquet."""
    from ..sources.tables import widen

    return widen(docs).select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame_len long"


def sample_frames(binary_df: DataFrame, k: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: each input row yields k
    rows at evenly spaced byte offsets — the 1→N Arrow batch shape every
    frame/chunk extractor has. The 'decode at offset' step is where a
    real pipeline would seek into the container format (stubbed:
    deterministic offsets + lengths only, codecs absent here)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n = len(bytes(b))
                for i in range(k):
                    off = (i * n) // k
                    rows.append((doc_id, i, off, min(16, n - off)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_len"]
            )

    return binary_df.mapInPandas(batches, schema=FRAME_SCHEMA)


ENERGY_SCHEMA = "doc_id long, win_idx int, n_samples int, rms double"


def audio_window_energy(binary_df: DataFrame, window: int = 64) -> DataFrame:
    """Audio-style windowed RMS energy over the binary payload, treating
    each byte as an unsigned PCM sample (the real pipeline decodes with
    librosa/soundfile here — absent in this container, and byte-as-sample
    keeps the math oracle-reproducible). 1→N rows per payload like frame
    sampling; integer square-sums stay exact, the final divide+sqrt is
    the only float step so both engines agree bitwise."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b)
                n = len(data)
                for i in range((n + window - 1) // window):
                    seg = data[i * window : (i + 1) * window]
                    s = sum(x * x for x in seg)
                    rms = math.sqrt(s / float(len(seg)))
                    rows.append((doc_id, i, len(seg), rms))
            yield pd.DataFrame(
                rows, columns=["doc_id", "win_idx", "n_samples", "rms"]
            )

    return binary_df.mapInPandas(batches, schema=ENERGY_SCHEMA)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas keeps the blobs executor-local; only the narrow feature
    columns leave the stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_decode(bytes(b)) for b in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_FEAT_SCHEMA = "doc_id long, frame_idx int, feat long"


def frame_features(
    binary_df: DataFrame, frame: int = 32
) -> DataFrame:
    """Per-frame scalar feature over a video-like payload: fixed
    `frame`-byte windows (full frames only — a real decoder works on
    whole frames), feature = exact integer byte sum (the luminance-sum
    stand-in; a real pipeline computes a frame histogram/embedding in
    this same Arrow batch slot, codecs absent here). 1→N rows per
    payload, int64 exact — the downstream scene-cut analytics stay
    JVM-side and oracle-reproducible."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b)
                for i in range(len(data) // frame):
                    seg = data[i * frame : (i + 1) * frame]
                    rows.append((doc_id, i, sum(seg)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "feat"]
            )

    return binary_df.mapInPandas(batches, schema=FRAME_FEAT_SCHEMA)
