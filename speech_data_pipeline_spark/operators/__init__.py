"""Operator library: the SURVEY.md §2 inventory re-expressed Spark-first.

Modules:
- ``intervals``   — interval/segment algebra: gaps, containment/overlap
                    joins, monotonic suppression, clamping (J1-J4, F7, F11, X15)
- ``sessions``    — sessionization: gap-based (SQL-form), capped-span and
                    speaker-aware kernels, barrier sessionization (W1, W2, W9)
- ``sweepline``   — sweep-line overlap flattening (W3)
- ``windows``     — sliding-window explode (W4/W5), budgeted accumulation (A12)
- ``dedup``       — exact / minhash-LSH / simhash / n-gram-Jaccard dedup
- ``similarity``  — embedding cosine top-k, LSH-bucketed ANN
- ``text``        — token counting, quality scoring, language-ID, fingerprints
- ``multimodal``  — opaque binary columns + stubbed decode/feature plumbing
"""
