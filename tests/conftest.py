import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder
         .master("local[4]")
         .appName("incubator-hudi-spark-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "4g")
         .config("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
         .getOrCreate())
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_path():
    d = tempfile.mkdtemp(prefix="hudi_py_")
    yield os.path.join(d, "tbl")
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="session")
def events(spark):
    from incubator_hudi_spark.functions.io import load_table
    return load_table(spark, SF_DIR, "events")
