"""Dump the ExactSubstr WINDOW-PASS physical plan (the part normally hidden
behind the localCheckpoint) for dedup_exact_substrings as currently
implemented in operators/text.py.

The checkpoint helper is monkeypatched to identity so the full lineage —
seg -> owners -> covered -> removed -> rebuild — appears in one plan.  Two
dumps per invocation: the default-broadcast shape (sf0.1 / bench shape) and
the autoBroadcastJoinThreshold=-1 shape (the at-scale SMJ shape where the
owners-side Sort input is what the r7 count>=2 prefilter shrinks).

Run: python tools/dump_exactsubstr_windowpass.py <out_prefix>
  -> <out_prefix>_broadcast.txt, <out_prefix>_smj.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/exactsubstr_windowpass"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .appName("dump-exactsubstr-windowpass")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark.operators import _util
    _util.checkpoint = lambda df, checkpoint_dir=None, eager=False: df
    from incubator_hudi_spark.operators.text import dedup_exact_substrings

    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text"))

    for label, thresh in (("broadcast", "64m"), ("smj", "-1")):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        out = dedup_exact_substrings(docs)
        txt = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
                 .fromString("formatted"))
        with open(f"{OUT}_{label}.txt", "w") as fh:
            fh.write(txt)
        print(f"wrote {OUT}_{label}.txt")


if __name__ == "__main__":
    main()
