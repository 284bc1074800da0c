"""Incremental & streaming layer (SURVEY.md §2.10 T1-T7, §2.6 W12) —
the reference's hourly-micro-batch execution model, Spark-first.

- incremental: batch-incremental lookback recompute (the reference's
  own 299-row warm-up strategy) + Structured Streaming ingestion with
  watermarked content-hash dedup and an idempotent foreachBatch sink.
- stateful: recurrence state carried across micro-batches with
  applyInPandasWithState (O(1) state per series, no warm-up re-read).
"""
