"""Interleaved A/B: pyds native-write task kernel, r6 pandas vs r7 arrow.

The r6 kernel round-tripped the whole task batch through pandas
(``to_pandas`` → groupby(partition) → ``from_pandas`` per group), boxing
every payload value into Python objects twice; the r7 kernel
(pyds_write._write_table) keeps the payload in Arrow end to end and runs
only the key/partition evaluators (unchanged pandas code over their input
columns) through pandas.  This tool holds a verbatim copy of the r6 kernel
body and times both driver-side over the same real Arrow tables — no Spark
session, so the delta is the kernel, not scheduling (the kernel is 100% of
the task's work either way).

Parity is asserted each warmup: identical row content (read back, sorted,
_hoodie_file_name dropped — fg ids embed a uuid) and identical WriteStats
modulo fg/path/size.

Corpora: documents.parquet ×8 (payload-heavy strings, partitioned by
source) and lineitem.parquet (narrow numerics, date_format month
partitions — the bench table shape).

Run: python tools/ab_pyds_write_kernel.py [sf_dir] [n_rounds]
"""

import os
import re
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 6

from incubator_hudi_spark.config import (META_COMMIT_SEQNO, META_COMMIT_TIME,
                                         META_FILE_NAME, META_PARTITION_PATH,
                                         META_RECORD_KEY)
from incubator_hudi_spark.keygen import NON_PARTITIONED
from incubator_hudi_spark.pyds_write import (_parse_partition_expr,
                                             _record_key_series,
                                             _write_table)


class _StubMeta:
    """Just enough TableMetaClient surface for the kernel: where files go."""

    def __init__(self, root):
        self.root = root

    def instant_data_dir(self, instant):
        return os.path.join(self.root, instant)

    def rel_path(self, p):
        return os.path.relpath(p, self.root)


def _write_table_r6(meta, instant, tid, schema, fields, partition_expr,
                    base_format, tbl):
    """VERBATIM r6 kernel body (pyds_write.py @ d921137), param-adapted."""
    import pandas as pd
    import pyarrow as pa

    part_fn = _parse_partition_expr(partition_expr)
    stats = []
    pdf = tbl.to_pandas()
    pdf[META_RECORD_KEY] = _record_key_series(pdf, fields)
    ppath = pd.Series(part_fn(pdf), index=pdf.index, dtype="object")
    pdf[META_PARTITION_PATH] = ppath.where(ppath.notna(), NON_PARTITIONED)
    pdf[META_COMMIT_TIME] = instant
    pdf[META_COMMIT_SEQNO] = [f"{instant}_{tid}_{i}"
                              for i in range(len(pdf))]
    out_dir = meta.instant_data_dir(instant)
    for part, grp in pdf.groupby(META_PARTITION_PATH, sort=False):
        safe = re.sub(r"[^A-Za-z0-9_.\-]", "_", str(part))
        fg = f"{safe}-{tid}-{uuid.uuid4().hex[:8]}"
        grp = grp.copy()
        grp[META_FILE_NAME] = fg
        d = os.path.join(out_dir, f"_fg={fg}")
        os.makedirs(d, exist_ok=True)
        suffix = ".orc" if base_format == "orc" else ".parquet"
        fpath = os.path.join(d, f"part-{tid:05d}-0{suffix}")
        meta_cols = [META_COMMIT_TIME, META_COMMIT_SEQNO, META_RECORD_KEY,
                     META_PARTITION_PATH, META_FILE_NAME]
        data_cols = [f.name for f in schema.fields
                     if not f.name.startswith("_hoodie")]
        out_schema = pa.schema(
            [pa.field(c, pa.string()) for c in meta_cols]
            + [tbl.schema.field(c) for c in data_cols])
        otbl = pa.Table.from_pandas(grp[meta_cols + data_cols],
                                    schema=out_schema, preserve_index=False)
        if suffix == ".orc":
            import pyarrow.orc as orc
            orc.write_table(otbl, fpath)
        else:
            import pyarrow.parquet as pq
            pq.write_table(otbl, fpath, compression="snappy")
        keys = grp[META_RECORD_KEY]
        stats.append({
            "partition": part, "file_group": fg,
            "path": meta.rel_path(fpath),
            "size": os.path.getsize(fpath),
            "num_records": int(len(grp)),
            "min_key": str(keys.min()), "max_key": str(keys.max()),
            "log": False, "base_instant": instant,
        })
    return stats


def main():
    import pyarrow as pa
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StringType, StructField, StructType,
                                   TimestampNTZType)

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    docs = pa.concat_tables(
        [docs.set_column(0, "doc_id",
                         pa.compute.add(docs.column("doc_id"),
                                        i * 10_000_000))
         for i in range(8)])
    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"))

    doc_schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
        StructField("lang", StringType()), StructField("source", StringType()),
        StructField("n_chars", LongType())])
    li_schema = StructType([
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampNTZType())])
    cases = {
        "documents_x8": (docs, doc_schema, ["doc_id"], "source"),
        "lineitem": (li, li_schema, ["l_orderkey", "l_linenumber"],
                     "date_format(l_shipdate,'yyyy-MM')"),
    }
    kernels = {"r6_pandas": _write_table_r6, "r7_arrow": _write_table}

    def run(kernel, case, keep=False):
        tbl, schema, fields, pexpr = cases[case]
        root = tempfile.mkdtemp(prefix="ab_pyds_")
        t0 = time.time()
        stats = kernel(_StubMeta(root), "20260817000000000", 0, schema,
                       fields, pexpr, "parquet", tbl)
        wall = time.time() - t0
        if keep:
            return wall, stats, root
        shutil.rmtree(root, ignore_errors=True)
        return wall, stats, None

    # parity check (once per case): same rows, same stats modulo fg ids
    for case in cases:
        outs = {}
        for k, fn in kernels.items():
            _, stats, root = run(fn, case, keep=True)
            import glob
            files = sorted(glob.glob(os.path.join(root, "**", "*.parquet"),
                                     recursive=True))
            t = ds.dataset(files, format="parquet").to_table()
            t = t.drop_columns([META_FILE_NAME])
            outs[k] = (t.sort_by([(c, "ascending")
                                  for c in (META_COMMIT_SEQNO,)]),
                       sorted((s["partition"], s["num_records"],
                               s["min_key"], s["max_key"]) for s in stats))
            shutil.rmtree(root, ignore_errors=True)
        a, b = outs["r6_pandas"], outs["r7_arrow"]
        assert a[1] == b[1], (case, "stats differ")
        assert a[0].equals(b[0]), (case, "row content differs")
        print(f"{case}: parity OK "
              f"({a[0].num_rows} rows, {len(a[1])} file groups)",
              file=sys.stderr)

    times = {(c, k): [] for c in cases for k in kernels}
    for r in range(N):
        order = list(kernels) if r % 2 == 0 else list(reversed(kernels))
        for case in cases:
            for k in order:
                w, _, _ = run(kernels[k], case)
                times[(case, k)].append(w)
        print(f"round {r}: " + "  ".join(
            f"{c}/{k}={times[(c, k)][-1]:.2f}s"
            for c in cases for k in order), file=sys.stderr)
    print("\n== trimmed means (drop best+worst) ==")
    for (c, k), xs in times.items():
        xs = sorted(xs)[1:-1] if len(xs) > 2 else xs
        print(f"  {c:13s} {k:10s}: {sum(xs)/len(xs):.3f}s")


if __name__ == "__main__":
    main()
