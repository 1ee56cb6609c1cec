"""Greedy sequence packing for training-batch construction.

Packs documents into fixed token-budget sequences ("bins") — the
standard preprocessing step between a curated corpus and an LLM
training run (concat-and-chunk with document boundaries respected).

Next-fit semantics: documents are taken in a deterministic order
(``order_col`` ascending within each ``key`` partition) and appended to
the current sequence while the running token total stays within
``budget``; a document that would overflow closes the sequence and
starts a new one. A single document larger than the budget gets a
sequence of its own (never split — padding/truncation is a downstream
choice).

Like the reference's capped-session merge (W1,
modules/models/utils.py:64-102 — same shape: an accumulate-until-cap
recurrence), the break decision depends on the running total, making the
recurrence non-associative: no window-function composition computes it,
so it runs as a sequential per-key kernel in ``applyInPandas``. Per-key
work is O(n); the only shuffle is the groupBy on ``key``. At 100 TB the
key should be a shard id of bounded size (e.g. ``(source, doc_id mod
S)``) so no single group exceeds executor memory — same contract as
every other per-key kernel in this engine.

The kernel is SQL-replayable: the DuckDB oracle in
queries/curation_q.py steps the same recurrence as a recursive CTE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def pack_sequences(
    df: DataFrame,
    budget: int,
    key: str = "source",
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """Next-fit pack rows into ``budget``-bounded sequences per key.

    Returns one row per input row: ``key, order_col, weight_col, seq_id``
    (seq_id restarts at 1 per key) — the assignment table downstream
    writers group on to emit packed sequences.
    """
    key_type = dict(df.dtypes)[key]
    order_type = dict(df.dtypes)[order_col]
    weight_type = dict(df.dtypes)[weight_col]
    schema = (
        f"{key} {key_type}, {order_col} {order_type}, "
        f"{weight_col} {weight_type}, seq_id long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        seq_ids = []
        seq_id, total = 1, 0
        for w in pdf[weight_col]:
            w = int(w)
            if total > 0 and total + w > budget:
                seq_id += 1
                total = 0
            total += w
            seq_ids.append(seq_id)
        out = pdf[[key, order_col, weight_col]].copy()
        out["seq_id"] = seq_ids
        return out

    return df.groupBy(key).applyInPandas(pack, schema=schema)
