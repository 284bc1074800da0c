"""Operator library — each module maps to a SURVEY.md §2 family.

- window_ops:  sliding-window analytics (SMA, Bollinger, rolling
               median repair, Gaussian kernel smoothing, crossovers,
               tumbling candles) — pure Window/groupBy expressions.
- recurrence:  sequential per-series recurrences (EMA/SES, MACD, PPO,
               RSI, ADX, Kalman, Savitzky-Golay, wavelet) as
               Arrow-batched grouped-map pandas UDFs.
- asof:        as-of (most-recent-prior) join.
- textops:     text analysis (HTML strip, tokens, quality, lang-id,
               fingerprints) as JVM-side column expressions.
- dedup:       exact + near-duplicate detection (hash, n-gram
               Jaccard, MinHash LSH, SimHash, embedding cosine).
- similarity:  vector top-k (exact brute force + LSH/IVF scale path).
- scoring:     deterministic sentiment/embedding scoring UDF plumbing
               (the reference's ML-scoring surface, stubbed).
- multimodal:  binary-column (image/audio) plumbing with stubbed
               decoders.
- ann_index:   persisted IVF/LSH index artifacts (INT8-quantized
               posting lists) + single-query probes, batched kNN
               joins, and insert-only index appends.
- hnsw:        sharded HNSW graph index (per-task graphs, int8 node
               codes, bit-deterministic builds) + batched kNN join
               and incremental shard refresh.
- sampling:    deterministic stratified sampling, GPT-style token/
               sequence packing, train/val/test split, domain-mixture
               rebalance, and seed-keyed training-order shuffle.
"""
