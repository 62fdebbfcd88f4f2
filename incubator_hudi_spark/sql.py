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

_MASK = "\x00"


def _mask_top(s: str) -> str:
    """Return an equal-length copy of ``s`` where every character inside a
    string literal ('' escapes honored), double-quote/backtick identifier,
    SQL comment (``--`` / ``/* */``), or nested parens/brackets is replaced
    by NUL.  Statement-shape keywords (WHEN/THEN/ON/SET/WHERE/...) can then
    be located with plain regex on the mask while slicing the ORIGINAL text
    — this is what makes the router robust to ``'... WHEN MATCHED ...'``
    inside a literal or a subquery source with arbitrary nesting (the cases
    the reference handles via a real Catalyst parser,
    HoodieSparkSessionExtension.scala:29-46)."""
    out: list[str] = []
    depth = 0
    for ch in _mask_literals_only(s):
        if ch in "([":
            out.append(ch if depth == 0 else _MASK)
            depth += 1
        elif ch in ")]":
            depth -= 1
            out.append(ch if depth == 0 else _MASK)
        else:
            out.append(ch if depth == 0 else _MASK)
    return _mask_case("".join(out))


def _mask_case(masked: str) -> str:
    """Mask the interior of top-level ``CASE ... END`` expressions (nesting
    honored) so their WHEN/THEN/ELSE — and any commas — can never be
    mistaken for statement structure: ``UPDATE SET x = CASE WHEN s.a > 1
    THEN 1 ELSE 0 END`` must not split at the CASE's WHEN.  Runs on the
    already literal/paren-masked text, so CASE inside strings or subqueries
    is invisible here and only genuinely top-level expressions match."""
    out = list(masked)
    depth, span_start = 0, -1
    for m in re.finditer(r"\b(CASE|END)\b", masked, re.I):
        if m.group(1).upper() == "CASE":
            if depth == 0:
                span_start = m.start()
            depth += 1
        elif depth > 0:
            depth -= 1
            if depth == 0:
                for i in range(span_start, m.end()):
                    out[i] = _MASK
    if depth > 0 and span_start >= 0:        # unterminated CASE: mask to end
        for i in range(span_start, len(out)):
            out[i] = _MASK
    return "".join(out)


def _find_kw(masked: str, kw: str, start: int = 0):
    """First top-level occurrence of keyword ``kw`` (word-bounded, any case)
    in the masked text at/after ``start``; None if absent."""
    return re.compile(rf"\b{kw}\b", re.I).search(masked, start)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0, outside literals/comments."""
    masked = _mask_top(s)
    out, prev = [], 0
    for i, ch in enumerate(masked):
        if ch == sep:
            out.append(s[prev:i].strip())
            prev = i + 1
    out.append(s[prev:].strip())
    return [x for x in out if x]


def _name_alias(seg: str) -> tuple[str, Optional[str]]:
    """Parse ``<name-or-(subquery)> [AS] [alias]`` → (source_text, alias)."""
    seg = seg.strip()
    if seg.startswith("("):
        # the paren group is intact at top level of the segment's own mask
        m = re.match(r"(\(.*\))\s*(?:AS\s+)?(\w+)?\s*$", _mask_top(seg),
                     re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse source: {seg[:80]}")
        return seg[m.start(1):m.end(1)], m.group(2)
    parts = _WS.split(seg)
    if len(parts) >= 2 and parts[-2].upper() == "AS":
        return " ".join(parts[:-2]), parts[-1]
    if len(parts) >= 2:
        return " ".join(parts[:-1]), parts[-1]
    return parts[0], None


def _assignments(s: str) -> dict[str, str]:
    out = {}
    for part in _split_top(s):
        i = _mask_literals_only(part).index("=")  # first = outside literals
        k = part[:i].strip()
        out[k.split(".")[-1]] = part[i + 1:].strip()  # strip lhs alias
    return out


def _realias(expr: str, alias: Optional[str], to: str) -> str:
    """Rewrite ``alias.`` → ``to.`` outside string literals/comments."""
    if not alias or alias == to:
        return expr
    # alias refs inside parens are real SQL — hide only literals/comments
    masked = _mask_literals_only(expr)
    pat = re.compile(rf"\b{re.escape(alias)}\.")
    out, prev = [], 0
    for m in pat.finditer(masked):
        out.append(expr[prev:m.start()])
        out.append(f"{to}.")
        prev = m.end()
    out.append(expr[prev:])
    return "".join(out)


def _mask_literals_only(s: str) -> str:
    """Like _mask_top but parens stay visible (only literals/quoted
    identifiers/comments are hidden)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            out.append(_MASK)
            i += 1
            while i < n:
                if s[i] == "'" and i + 1 < n and s[i + 1] == "'":
                    out.append(_MASK * 2)
                    i += 2
                    continue
                out.append(_MASK)
                i += 1
                if s[i - 1] == "'":
                    break
            continue
        if ch in ('"', "`"):
            q = ch
            out.append(_MASK)
            i += 1
            while i < n and s[i] != q:
                out.append(_MASK)
                i += 1
            if i < n:
                out.append(_MASK)
                i += 1
            continue
        if ch == "-" and s[i:i + 2] == "--":
            while i < n and s[i] != "\n":
                out.append(_MASK)
                i += 1
            continue
        if ch == "/" and s[i:i + 2] == "/*":
            j = s.find("*/", i + 2)
            j = n if j < 0 else j + 2
            out.append(_MASK * (j - i))
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _strip_comments(s: str) -> str:
    """Remove ``--`` and ``/* */`` comments (outside string literals) so the
    statement routers never see them; comments carry no semantics and would
    otherwise corrupt whitespace-split name/alias segments."""
    out, i, n = [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":   # '' escape
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            out.append(s[i:j])
            i = j
            continue
        if ch in ('"', "`"):
            j = s.find(ch, i + 1)
            j = n if j < 0 else j + 1
            out.append(s[i:j])
            i = j
            continue
        if ch == "-" and s[i:i + 2] == "--":
            j = s.find("\n", i)
            i = n if j < 0 else j   # keep the newline itself
            out.append(" ")
            continue
        if ch == "/" and s[i:i + 2] == "/*":
            j = s.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
            continue
        out.append(ch)
        i += 1
    return "".join(out)


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
        s = _strip_comments(statement).strip().rstrip(";").strip()
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
        # central identifier normalization: every statement router hands the
        # raw token over (possibly `backticked` or "double-quoted"), so all
        # of UPDATE/DELETE/MERGE/INSERT/TRUNCATE/SHOW accept quoted names
        name = name.strip().strip('`"')
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
        """Statement-shape keywords (USING/ON/WHEN/THEN) are located on the
        masked text (_mask_top), so string literals containing 'WHEN MATCHED'
        and subquery sources with arbitrary nesting parse correctly —
        semantics per MergeIntoHoodieTableCommand.scala:56-217."""
        masked = _mask_top(s)
        mu = _find_kw(masked, "USING")
        mon = _find_kw(masked, "ON", mu.end()) if mu else None
        mw = _find_kw(masked, "WHEN", mon.end()) if mon else None
        mhead = re.match(r"MERGE\s+INTO\s+", masked, re.I)
        if not (mhead and mu and mon and mw):
            raise ValueError(f"cannot parse MERGE statement: {s[:120]}...")
        tname, talias = _name_alias(s[mhead.end():mu.start()])
        src, salias = _name_alias(s[mu.end():mon.start()])
        on = s[mon.end():mw.start()].strip()
        rest, rest_masked = s[mw.start():], masked[mw.start():]
        table = self._table(tname)
        source = self._source_df(src)

        def ra(e: str) -> str:
            return _realias(_realias(e, talias, "t"), salias, "s")

        # split the WHEN ... clauses at top-level WHEN boundaries
        starts = [m.start() for m in re.finditer(r"\bWHEN\b", rest_masked,
                                                 re.I)]
        bounds = list(zip(starts, starts[1:] + [len(rest)]))
        when_matched, when_not_matched = [], []
        for lo, hi in bounds:
            clause, cmask = rest[lo:hi], rest_masked[lo:hi]
            hm = re.match(r"WHEN\s+(NOT\s+)?MATCHED\b", cmask, re.I)
            mt = _find_kw(cmask, "THEN")
            if not (hm and mt):
                raise ValueError(f"bad MERGE clause: {clause[:80]}")
            neg = bool(hm.group(1))
            between = clause[hm.end():mt.start()].strip()
            cond = None
            if between:
                ba = re.match(r"AND\b", between, re.I)
                if not ba:
                    raise ValueError(f"bad MERGE clause condition: "
                                     f"{between[:80]}")
                cond = ra(between[ba.end():].strip())
            act_s = clause[mt.end():].strip()
            amask = _mask_top(act_s)
            up = re.match(r"UPDATE\s+SET\s+", amask, re.I)
            ins = re.match(r"INSERT\b\s*", amask, re.I)
            if not neg:
                if act_s.upper() == "DELETE":
                    when_matched.append((cond, DELETE_ACTION))
                elif up:
                    body = act_s[up.end():].strip()
                    if body == "*":
                        assigns = {c: f"s.{c}" for c in source.columns}
                    else:
                        assigns = {k: ra(v)
                                   for k, v in _assignments(body).items()}
                    when_matched.append((cond, assigns))
                else:
                    raise ValueError(f"bad WHEN MATCHED action: {act_s[:60]}")
            else:
                if not ins:
                    raise ValueError(f"bad WHEN NOT MATCHED action: "
                                     f"{act_s[:60]}")
                body = act_s[ins.end():].strip()
                if body == "*":
                    when_not_matched.append((cond, None))
                else:
                    bmask = _mask_top(body)
                    vm = re.match(r"(\(.*?\))\s*VALUES\s*(\(.*\))\s*$",
                                  bmask, re.I | re.S)
                    if not vm:
                        raise ValueError(f"bad INSERT clause: {body[:60]}")
                    cols_s = body[vm.start(1) + 1:vm.end(1) - 1]
                    vals_s = body[vm.start(2) + 1:vm.end(2) - 1]
                    cols = [c.strip().split(".")[-1]
                            for c in _split_top(cols_s)]
                    vals = [ra(v) for v in _split_top(vals_s)]
                    when_not_matched.append((cond, dict(zip(cols, vals))))
        return table.merge(source, on=ra(on),
                           when_matched=when_matched or None,
                           when_not_matched=when_not_matched or None)

    def _update(self, s: str) -> str:
        masked = _mask_top(s)
        mh = re.match(r"UPDATE\s+(\S+)\s+", masked, re.I)
        ms = _find_kw(masked, "SET", mh.end() if mh else 0) if mh else None
        if not (mh and ms):
            raise ValueError(f"cannot parse UPDATE: {s[:120]}")
        mw = _find_kw(masked, "WHERE", ms.end())
        sets = s[ms.end():mw.start() if mw else len(s)]
        where = s[mw.end():].strip() if mw else None
        # name from the ORIGINAL text: the mask NUL-replaces quoted chars,
        # so a backticked identifier would resolve to NUL garbage otherwise
        # (_table strips the quoting)
        return self._table(s[mh.start(1):mh.end(1)]).update(
            _assignments(sets), where=where)

    def _delete(self, s: str) -> str:
        masked = _mask_top(s)
        mh = re.match(r"DELETE\s+FROM\s+(\S+)\s*", masked, re.I)
        if not mh:
            raise ValueError(f"cannot parse DELETE: {s[:120]}")
        mw = _find_kw(masked, "WHERE", mh.end())
        where = s[mw.end():].strip() if mw else None
        return self._table(s[mh.start(1):mh.end(1)]).delete_where(
            where or "true")

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
        m = re.match(r"ALTER\s+TABLE\s+(\S+)\s+DROP\s+(?:IF\s+EXISTS\s+)?"
                     r"PARTITION\s*\((.*)\)$", s, re.I | re.S)
        if m:
            # ALTER TABLE t DROP PARTITION (dt='2024-01')[, PARTITION (...)]
            # → logical delete via replacecommit, exactly the Python API's
            # delete_partitions (AlterHoodieTableDropPartitionCommand.scala
            # routes to the same delete_partition write operation).  Spec
            # values join with '/' in declaration order — the engine's
            # partition_path shape for single- and multi-level partitioning.
            tname, spec = m.groups()
            parts = []
            for clause in re.split(r"\)\s*,\s*PARTITION\s*\(", spec,
                                   flags=re.I):
                vals = []
                for kv in _split_top(clause):
                    if "=" not in kv:
                        raise ValueError(
                            f"bad partition spec {clause[:80]!r}")
                    vals.append(kv.split("=", 1)[1].strip().strip("'\""))
                parts.append("/".join(vals))
            return self._table(tname).delete_partitions(parts)
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
