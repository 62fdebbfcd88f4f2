"""SQL DML surface as DataFrame algebra — MERGE INTO / UPDATE / DELETE.

Reference parity (hudi-spark-datasource/hudi-spark/src/main/scala/.../command/):
  - MergeIntoHoodieTableCommand.scala:56-217 + payload/ExpressionPayload.scala:
    the reference serializes the matched/not-matched (condition, assignment)
    expressions into a payload evaluated record-at-a-time inside the merge
    handles, with its own codegen (ExpressionCodeGen.scala).
  - UpdateHoodieTableCommand.scala / DeleteHoodieTableCommand.scala.

Spark-first design (SURVEY §3.3): one right-outer join of the target snapshot
with the source + conditional projection computes every action branch in a
single vectorized pass — Catalyst codegens the expressions, no serialized
payload, one shuffle fewer than the reference.  The routed rows then flow
through the normal upsert pipeline in ONE commit (deletes ride along as
API-delete rows).

Expressions reference the target as ``t`` and the source as ``s``
(``t.qty + s.qty``), like MERGE INTO aliases.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import UPSERT
from .writer import API_DELETE

MERGE = "merge"
DELETE_ACTION = "__DELETE__"

#: A matched clause: (condition-or-None, assignments-dict) or
#: (condition-or-None, DELETE_ACTION).  First matching clause wins (ANSI MERGE).
MatchedClause = tuple[Optional[str], Union[dict[str, str], str]]


def merge_into(table, source: DataFrame, on: str,
               when_matched: Optional[Sequence[MatchedClause]] = None,
               when_not_matched: Optional[Sequence[
                   tuple[Optional[str], Optional[dict[str, str]]]]] = None,
               # ergonomic single-clause shorthands
               when_matched_update: Optional[dict[str, str]] = None,
               when_matched_update_condition: Optional[str] = None,
               when_matched_delete: Optional[str] = None,
               when_not_matched_insert: Optional[dict[str, str]] = None,
               when_not_matched_condition: Optional[str] = None) -> str:
    """MERGE INTO table t USING source s ON <on>
       [WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE]...
       [WHEN NOT MATCHED [AND cond] THEN INSERT ...]"""
    clauses: list[MatchedClause] = list(when_matched or [])
    if when_matched_delete is not None:
        clauses.append((when_matched_delete if when_matched_delete != "true"
                        else None, DELETE_ACTION))
    if when_matched_update is not None:
        clauses.append((when_matched_update_condition, when_matched_update))
    not_matched = list(when_not_matched or [])
    if when_not_matched_insert is not None or (
            not not_matched and when_not_matched_condition is not None):
        not_matched.append((when_not_matched_condition, when_not_matched_insert))

    tgt = table.read().alias("t")
    src = source.alias("s")
    data_cols = [c for c in tgt.columns if not c.startswith("_hoodie_")]
    src_cols = source.columns

    joined = tgt.join(src, on=F.expr(on), how="right_outer")
    matched = F.col("t._hoodie_record_key").isNotNull()

    # ---- matched branch: first-clause-wins routing --------------------
    action = F.lit(None).cast("string")
    for i, (cond, act) in enumerate(reversed(clauses)):
        idx = len(clauses) - 1 - i
        c = matched & (F.expr(cond) if cond else F.lit(True))
        action = F.when(c, F.lit(str(idx))).otherwise(action)
    # ---- not-matched branch -------------------------------------------
    insert_action = F.lit(None).cast("string")
    for i, (cond, _assigns) in enumerate(reversed(not_matched)):
        idx = len(not_matched) - 1 - i
        c = (~matched) & (F.expr(cond) if cond else F.lit(True))
        insert_action = F.when(c, F.lit(f"i{idx}")).otherwise(insert_action)
    routed = joined.withColumn("_action", F.coalesce(action, insert_action)) \
                   .filter(F.col("_action").isNotNull())

    # ---- project each output column per action ------------------------
    tgt_types = {f.name: f.dataType for f in tgt.schema.fields}
    out_cols = []
    for col in data_cols:
        expr = F.col(f"t.{col}") if col in tgt.columns else F.lit(None)
        for idx, (_cond, act) in enumerate(clauses):
            if isinstance(act, dict) and col in act:
                expr = F.when(F.col("_action") == str(idx), F.expr(act[col])) \
                        .otherwise(expr)
        for idx, (_cond, assigns) in enumerate(not_matched):
            if assigns and col in assigns:
                ins = F.expr(assigns[col])
            elif col in src_cols:
                ins = F.col(f"s.{col}")
            else:
                ins = F.lit(None)
            expr = F.when(F.col("_action") == f"i{idx}", ins).otherwise(expr)
        # ANSI assignment semantics: the expression is cast to the target
        # column's type (an int literal into a double column stays double)
        out_cols.append(expr.cast(tgt_types[col]).alias(col))

    delete_idxs = [str(i) for i, (_c, a) in enumerate(clauses) if a == DELETE_ACTION]
    is_delete = F.col("_action").isin(delete_idxs) if delete_idxs else F.lit(False)
    batch = routed.select(*out_cols, is_delete.alias(API_DELETE))
    return table._upsert_impl(batch, MERGE)


def update_table(table, set_exprs: dict[str, str],
                 where: Optional[str] = None) -> str:
    """UPDATE t SET ... WHERE ... (UpdateHoodieTableCommand.scala, 120 LoC):
    read matching rows, apply assignments, upsert."""
    snap = table.read()
    if where:
        snap = snap.filter(F.expr(where))
    data_cols = [c for c in snap.columns if not c.startswith("_hoodie_")]
    types = {f.name: f.dataType for f in snap.schema.fields}
    out = snap.select(*data_cols)
    for col, expr in set_exprs.items():
        e = F.expr(expr)
        if col in types:  # ANSI assignment cast to the column's type
            e = e.cast(types[col])
        out = out.withColumn(col, e)
    return table._upsert_impl(out, UPSERT)


def delete_where(table, where: str) -> str:
    """DELETE FROM t WHERE ... (DeleteHoodieTableCommand.scala, 83 LoC):
    read matching keys → delete op."""
    snap = table.read().filter(F.expr(where))
    data_cols = [c for c in snap.columns if not c.startswith("_hoodie_")]
    return table.delete(snap.select(*data_cols))
