"""Plan-identity-aware ownership for lazily persist()ed model state.

Several lazy operators persist tiny in-plan model frames (the quality
trainer's h + per-step models, the sampled-PQ trainer's sample +
codebook cells). Two requirements pull in opposite directions:

- OWNERSHIP (ADVICE r13): the cached blocks must not accumulate for
  the session lifetime when the operator is invoked over ever-changing
  inputs (streaming drains, different corpora).
- REUSE: re-invoking the operator over the SAME inputs must keep the
  caches hot — Spark's CacheManager dedupes persist() of a
  semantically-equal plan into the existing entry, so a re-run reads
  the materialized model instead of re-deriving the whole training
  chain (bench min-of-N and any interactive session rely on this;
  evicting unconditionally re-pays full training per invocation —
  measured 1.4 s → 9.9 s on text_quality_train at sf0.1).

PlanCache keeps both: each invocation presents an ANCHOR frame (built
from the operator's inputs, pre-persist) plus a config key; if the
anchor's analyzed plan sameResult()-matches the previous invocation's
anchor and the key is unchanged, the registered caches are kept (the
new persist() calls dedupe into them); otherwise everything from the
previous run is unpersisted first. Unpersisted-but-still-referenced
frames stay CORRECT — persist is a hint; lineage recomputes."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["PlanCache"]


class PlanCache:
    def __init__(self) -> None:
        self._anchor: DataFrame | None = None
        self._key = None
        self._frames: list[DataFrame] = []
        self._hit = False

    def matches(self, anchor: DataFrame, key=None) -> bool:
        """True iff `anchor` is semantically the same plan as the
        previous invocation's anchor and the config key is unchanged —
        i.e. the registered caches are the ones this invocation's
        persist() calls would dedupe into."""
        if self._anchor is None or key != self._key:
            return False
        try:
            return (
                anchor._jdf.queryExecution()
                .analyzed()
                .sameResult(self._anchor._jdf.queryExecution().analyzed())
            )
        except Exception:  # noqa: BLE001 — stale session etc.: treat as miss
            return False

    def evict(self) -> int:
        """Unpersist every registered frame; returns how many."""
        n = len(self._frames)
        for df in self._frames:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — session may already be gone
                pass
        self._frames = []
        self._anchor = None
        self._key = None
        self._hit = False
        return n

    def begin(self, anchor: DataFrame, key=None) -> None:
        """Start an invocation: keep the caches when the anchor/key
        match the previous run, evict them otherwise. On a hit the
        already-registered frames are the ones this invocation's
        persist() calls dedupe into, so register() becomes a no-op
        pass-through — otherwise _frames grows by ~(1+steps) duplicate
        handles per same-input re-run (bench min-of-N)."""
        if self.matches(anchor, key):
            self._hit = True
        else:
            self.evict()
            self._anchor = anchor
            self._key = key
            self._hit = False

    def register(self, df: DataFrame) -> DataFrame:
        """Track a persisted frame for later eviction (pass-through).

        Skipped when begin() matched the previous invocation: the JVM
        CacheManager dedupes the persist() into the existing entry, so
        the frame registered by the original (miss) invocation already
        owns the cached block."""
        if not self._hit:
            self._frames.append(df)
        return df
