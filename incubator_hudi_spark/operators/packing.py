"""Sequence packing — assign documents to fixed-token-budget packs, the step
that turns a filtered/deduped corpus into dense training examples.

Greedy in-order packing is inherently sequential (a running decision per
document), so it runs as an Arrow-batched ``applyInPandas`` per shard: shards
pack independently and in parallel, documents within a shard pack in a
deterministic order.  At 100 TB the shard count is the parallelism knob — one
shuffle by shard, then a linear pass per shard; no global coordination.

Rule (first-fit in order): a document joins the current pack unless adding it
would exceed ``budget``; then it opens the next pack.  A document larger than
the budget occupies a pack of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pack_greedy(df: DataFrame, budget: int, token_col: str = "n_tokens",
                id_col: str = "doc_id", shard_col: str = "shard",
                order_col: str | None = None) -> DataFrame:
    """Returns (id, shard, n_tokens, pack_id) with pack_id dense per shard,
    packed greedily in ``order_col`` (default: id) order."""
    import pandas as pd

    order = order_col or id_col
    out_schema = f"{id_col} long, {shard_col} long, {token_col} long, pack_id long"

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order)
        packs, acc, cur = [], 0, 0
        for n in pdf[token_col].tolist():
            if acc > 0 and acc + n > budget:
                cur, acc = cur + 1, n
            else:
                acc += n
            packs.append(cur)
        return pd.DataFrame({
            id_col: pdf[id_col].astype("int64"),
            shard_col: pdf[shard_col].astype("int64"),
            token_col: pdf[token_col].astype("int64"),
            "pack_id": packs,
        })

    cols = list(dict.fromkeys([id_col, shard_col, token_col, order]))
    return (df.select(*cols)
            .groupBy(shard_col).applyInPandas(pack, out_schema))
