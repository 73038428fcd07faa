"""Sequence packing: bin documents into fixed token budgets for training.

Pre-training consumes fixed-length sequences; feeding one short document per
sequence wastes most of the context window. Packing groups documents so
each pack's token total approaches (never exceeds) the budget.

Optimal bin packing is NP-hard and inherently sequential — the distributed
answer is PARTITION-LOCAL first-fit-decreasing: each partition packs its own
rows greedily (sorted longest-first), pack ids are made globally unique by
prefixing the partition id. Packing quality is within a few percent of
global FFD once partitions hold thousands of docs, and the job stays
embarrassingly parallel — no shuffle beyond an optional repartition. This is
the documented use-case for a Python boundary: per-partition imperative
logic that DataFrame operators genuinely cannot express (mapInPandas, Arrow
batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    drop_oversize: bool = False,
    n_partitions: int = 64,
) -> DataFrame:
    """Pack documents into token budgets. Returns one row per pack:
    ``(pack_id string, doc_ids array, n_docs, total_tokens)`` with
    ``total_tokens <= max_tokens`` guaranteed.

    Documents longer than the budget raise by default (truncation is a
    modeling decision the caller must own); ``drop_oversize=True`` excludes
    them instead. ``tokens_col`` lets callers supply a real tokenizer's
    counts; otherwise the whitespace estimate is used.

    ``n_partitions`` is part of the recipe: packs are a pure function of
    (rows, max_tokens, n_partitions) — a FIXED count (not the input's
    physical layout) so re-reading the same corpus from a different file
    split still yields identical packs. Size it so a partition's docs fit
    one worker comfortably (tens of thousands of docs each).
    """
    import pandas as pd

    toks = F.col(tokens_col) if tokens_col else token_count(text_col)
    slim = docs.select(F.col(id_col).alias("id"), toks.alias("n_tok"))
    oversize = slim.filter(F.col("n_tok") > max_tokens)
    if drop_oversize:
        slim = slim.filter(F.col("n_tok") <= max_tokens)
    else:
        n_over = oversize.limit(1).count()
        if n_over:
            raise ValueError(
                f"document(s) exceed max_tokens={max_tokens}; pass "
                "drop_oversize=True or pre-split them"
            )

    schema = (
        "pack_id string, doc_ids array<long>, n_docs int, total_tokens long"
    )

    # determinism: hash-partition on the id into a FIXED partition count
    # (content-based placement — row order, scheduling, and the input's file
    # layout can't move a doc between partitions) and sort with an id
    # tiebreak inside the packer. Same input -> same packs.
    slim = slim.repartition(n_partitions, F.col("id"))

    def _pack(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        batches = list(it)  # one partition arrives as several Arrow batches
        if not batches:
            return
        pdf = pd.concat(batches).sort_values(
            ["n_tok", "id"], ascending=[False, True]
        )
        packs: list[list] = []   # [ [remaining, ids, total] ]
        for doc_id, n in zip(pdf["id"], pdf["n_tok"]):
            n = int(n)
            placed = False
            for p in packs:  # first fit over open packs
                if p[0] >= n:
                    p[0] -= n
                    p[1].append(int(doc_id))
                    p[2] += n
                    placed = True
                    break
            if not placed:
                packs.append([max_tokens - n, [int(doc_id)], n])
        yield pd.DataFrame({
            "pack_id": [f"{pid}-{i}" for i in range(len(packs))],
            "doc_ids": [p[1] for p in packs],
            "n_docs": [len(p[1]) for p in packs],
            "total_tokens": [p[2] for p in packs],
        })

    return slim.mapInPandas(_pack, schema)


def packing_efficiency(packs: DataFrame, max_tokens: int) -> float:
    """Fraction of the packed token budget actually used — the metric that
    says whether the packing is worth its cost (1.0 = zero padding; an empty
    pack set reports 0.0)."""
    row = packs.agg(
        F.sum("total_tokens").alias("used"), F.count("*").alias("n")
    ).first()
    if not row["n"]:
        return 0.0
    return float(row["used"]) / float(row["n"] * max_tokens)
