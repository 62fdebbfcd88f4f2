"""SQL-string DML surface over Hudi tables.

Reference parity (§2.6): the reference injects parser + analysis rules via
HoodieSparkSessionExtension.scala:29-46 so Spark SQL's MERGE/UPDATE/DELETE/
CREATE statements resolve to Hudi commands (MergeIntoHoodieTableCommand.scala,
UpdateHoodieTableCommand.scala, DeleteHoodieTableCommand.scala,
CreateHoodieTableCommand.scala, TruncateHoodieTableCommand.scala).  PySpark
cannot inject Catalyst rules without JVM code, so the same statements are
routed by a small driver-side parser to the DataFrame implementations in
dml.py / table.py — the *expressions* inside every statement are still parsed
and codegenned by Catalyst (`F.expr`), only the statement *shape* is handled
here.

    hs = HudiSqlSession(spark)
    hs.register("trips", table)            # or a path
    hs.sql("UPDATE trips SET fare = fare * 1.1 WHERE dist > 10")
    hs.sql("MERGE INTO trips t USING updates u ON t.uuid = u.uuid "
           "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    hs.sql("SELECT count(*) FROM trips")   # reads: plain Spark SQL over views
"""

from __future__ import annotations

import re
from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession

from .dml import DELETE_ACTION
from .table import HudiTable

_WS = re.compile(r"\s+")


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth 0."""
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def _assignments(s: str) -> dict[str, str]:
    out = {}
    for part in _split_top(s):
        k, v = part.split("=", 1)
        k = k.strip()
        out[k.split(".")[-1]] = v.strip()   # strip target alias from lhs
    return out


def _realias(expr: str, alias: Optional[str], to: str) -> str:
    if not alias or alias == to:
        return expr
    return re.sub(rf"\b{re.escape(alias)}\.", f"{to}.", expr)


class HudiSqlSession:
    """Statement router: DML on registered Hudi tables; reads fall through to
    ``spark.sql`` with every registered table exposed as a temp view of its
    current snapshot."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, HudiTable] = {}

    def register(self, name: str, table: Union[HudiTable, str]) -> None:
        if isinstance(table, str):
            table = HudiTable.load(self.spark, table)
        self.tables[name] = table

    # -----------------------------------------------------------------
    def sql(self, statement: str) -> Union[DataFrame, str, None]:
        """Execute one statement.  DML returns the commit instant time;
        SELECT returns a DataFrame."""
        s = statement.strip().rstrip(";").strip()
        head = _WS.split(s, 1)[0].upper()
        if head == "MERGE":
            return self._merge(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "DELETE":
            return self._delete(s)
        if head == "TRUNCATE":
            return self._truncate(s)
        if head == "INSERT":
            return self._insert(s)
        if head == "CREATE":
            return self._create(s)
        if head == "ALTER":
            return self._alter(s)
        if head == "SHOW":
            return self._show(s)
        # reads: expose snapshots as views, let Spark SQL do the rest
        return self._passthrough(s)

    def _show(self, s: str) -> DataFrame:
        """SHOW PARTITIONS / COMMITS / SAVEPOINTS / CLEANS / ROLLBACKS /
        FILES <table> — hudi-cli inspection commands surfaced as SQL
        (CommitsCommand, FileSystemViewCommand, SavepointsCommand, ...)."""
        m = re.match(r"SHOW\s+(PARTITIONS|COMMITS|SAVEPOINTS|CLEANS|"
                     r"ROLLBACKS|FILES)\s+(?:FROM\s+|IN\s+)?(\S+)$", s, re.I)
        if not m:
            raise ValueError(f"cannot parse SHOW: {s[:120]}")
        what, tname = m.group(1).upper(), m.group(2)
        from . import admin
        t = self._table(tname)
        return {"PARTITIONS": admin.partitions_df,
                "COMMITS": admin.commits_df,
                "SAVEPOINTS": admin.savepoints_df,
                "CLEANS": admin.cleans_df,
                "ROLLBACKS": admin.rollbacks_df,
                "FILES": admin.files_df}[what](t)

    # -----------------------------------------------------------------
    def _table(self, name: str) -> HudiTable:
        t = self.tables.get(name)
        if t is None:
            raise ValueError(f"unknown hudi table {name!r}; register() it")
        return t

    def _passthrough(self, s: str) -> DataFrame:
        for name, t in self.tables.items():
            if t.stored_schema() is not None:  # skip never-written tables
                t.read().createOrReplaceTempView(name)
        return self.spark.sql(s)

    def _source_df(self, src: str) -> DataFrame:
        src = src.strip()
        if src.startswith("("):
            return self._passthrough(src[1:-1])
        if src in self.tables:
            return self._table(src).read()
        return self.spark.table(src)

    # -----------------------------------------------------------------
    def _merge(self, s: str) -> str:
        m = re.match(
            r"MERGE\s+INTO\s+(\S+)(?:\s+AS)?(?:\s+(\w+))?\s+USING\s+"
            r"(\(.*?\)|\S+)(?:\s+AS)?(?:\s+(\w+))?\s+ON\s+(.*?)\s+(WHEN\s+.*)$",
            s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse MERGE statement: {s[:120]}...")
        tname, talias, src, salias, on, rest = m.groups()
        table = self._table(tname)
        source = self._source_df(src)

        def ra(e: str) -> str:
            return _realias(_realias(e, talias, "t"), salias, "s")

        when_matched, when_not_matched = [], []
        for cm in re.finditer(
                r"WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.*?))?\s+THEN\s+"
                r"(UPDATE\s+SET\s+.*?|DELETE|INSERT\s+.*?)(?=\s+WHEN\s+|\s*$)",
                rest, re.I | re.S):
            neg, cond, act = cm.groups()
            cond = ra(cond.strip()) if cond else None
            act_s = act.strip()
            up = re.match(r"UPDATE\s+SET\s+(.*)$", act_s, re.I | re.S)
            ins = re.match(r"INSERT\s+(.*)$", act_s, re.I | re.S)
            if not neg:
                if act_s.upper() == "DELETE":
                    when_matched.append((cond, DELETE_ACTION))
                elif up:
                    body = up.group(1).strip()
                    if body == "*":
                        assigns = {c: f"s.{c}" for c in source.columns}
                    else:
                        assigns = {k: ra(v) for k, v in _assignments(body).items()}
                    when_matched.append((cond, assigns))
                else:
                    raise ValueError(f"bad WHEN MATCHED action: {act_s[:60]}")
            else:
                if not ins:
                    raise ValueError(f"bad WHEN NOT MATCHED action: {act_s[:60]}")
                body = ins.group(1).strip()
                if body == "*":
                    when_not_matched.append((cond, None))
                else:
                    im = re.match(r"\((.*?)\)\s+VALUES\s+\((.*)\)$", body,
                                  re.I | re.S)
                    if not im:
                        raise ValueError(f"bad INSERT clause: {body[:60]}")
                    cols = [c.strip().split(".")[-1]
                            for c in _split_top(im.group(1))]
                    vals = [ra(v) for v in _split_top(im.group(2))]
                    when_not_matched.append((cond, dict(zip(cols, vals))))
        return table.merge(source, on=ra(on.strip()),
                           when_matched=when_matched or None,
                           when_not_matched=when_not_matched or None)

    def _update(self, s: str) -> str:
        m = re.match(r"UPDATE\s+(\S+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
                     s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse UPDATE: {s[:120]}")
        tname, sets, where = m.groups()
        return self._table(tname).update(_assignments(sets), where=where)

    def _delete(self, s: str) -> str:
        m = re.match(r"DELETE\s+FROM\s+(\S+)(?:\s+WHERE\s+(.*))?$", s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse DELETE: {s[:120]}")
        tname, where = m.groups()
        return self._table(tname).delete_where(where or "true")

    def _truncate(self, s: str) -> str:
        m = re.match(r"TRUNCATE\s+TABLE\s+(\S+)$", s, re.I)
        if not m:
            raise ValueError(f"cannot parse TRUNCATE: {s[:120]}")
        return self._table(m.group(1)).truncate()

    def _insert(self, s: str) -> str:
        m = re.match(r"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?(\S+)\s+(.*)$",
                     s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse INSERT: {s[:120]}")
        kind, tname, body = m.groups()
        table = self._table(tname)
        body = body.strip()
        if body.upper().startswith("VALUES"):
            data_cols = [c for c in table.read().columns
                         if not c.startswith("_hoodie_")]
            df = self._passthrough(
                f"SELECT * FROM ({body}) AS _v({', '.join(data_cols)})")
        else:
            df = self._passthrough(body)
        if kind.upper() == "OVERWRITE":
            return table.insert_overwrite(df)
        return table.insert(df)

    def _alter(self, s: str) -> str:
        m = re.match(r"ALTER\s+TABLE\s+(\S+)\s+ADD\s+COLUMNS?\s*\((.*)\)$",
                     s, re.I | re.S)
        if m:
            return self._table(m.group(1)).add_columns(m.group(2))
        m = re.match(r"ALTER\s+TABLE\s+(\S+)\s+CHANGE\s+(?:COLUMN\s+)?"
                     r"(\S+)\s+(?:\2\s+)?(\S+)$", s, re.I)
        if m:
            return self._table(m.group(1)).change_column(m.group(2), m.group(3))
        m = re.match(r"ALTER\s+TABLE\s+(\S+)\s+RENAME\s+TO\s+(\S+)$", s, re.I)
        if m:
            old, new = m.groups()
            t = self._table(old)
            t.rename_table(new)
            self.tables[new] = self.tables.pop(old)
            return new
        raise ValueError(f"cannot parse ALTER TABLE: {s[:120]}")

    def _create(self, s: str) -> str:
        m = re.match(
            r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)\s*"
            r"(?:\((?P<cols>[^)]*)\)\s*)?USING\s+hudi\s*"
            r"(?:(?:OPTIONS|TBLPROPERTIES)\s*\((?P<opts>.*?)\)\s*)?"
            r"(?:LOCATION\s+'(?P<loc>[^']+)'\s*)?"
            r"(?:AS\s+(?P<select>SELECT\s+.*))?$",
            s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse CREATE TABLE: {s[:120]}")
        name = m.group(1)
        opts = {}
        for part in _split_top(m.group("opts") or ""):
            k, v = part.split("=", 1)
            opts[k.strip().strip("'\"").lower()] = v.strip().strip("'\"")
        loc = m.group("loc")
        if not loc:
            raise ValueError("CREATE TABLE requires LOCATION '<path>'")
        table = HudiTable.create(
            self.spark, loc, name,
            recordkey_fields=[k.strip() for k in
                              opts.get("primarykey", "uuid").split(",")],
            partition_expr=opts.get("partitionexpr") or None,
            precombine_field=opts.get("precombinefield") or None,
            table_type=("MERGE_ON_READ" if opts.get("type", "cow") == "mor"
                        else "COPY_ON_WRITE"))
        sel = m.group("select")
        if sel:
            table.bulk_insert(self._passthrough(sel))
        self.tables[name] = table
        return name
