"""incubator_hudi_spark — a PySpark-native transactional table format +
write/read engine with the capabilities of apache/incubator-hudi (0.9.0),
re-expressed Spark-first: DataFrame transforms over plain Parquet plus a JSON
timeline, with Catalyst/Tungsten doing all relational work.

Beyond the reference surface, ``operators/`` adds the large-scale
training-data pipeline operators (dedup, similarity search, multimodal
columns, text analysis).
"""

from .config import (COPY_ON_WRITE, MERGE_ON_READ, PAYLOAD_DEFAULT,
                     PAYLOAD_OVERWRITE_LATEST, QUERY_INCREMENTAL,
                     QUERY_READ_OPTIMIZED, QUERY_SNAPSHOT, TableConfig,
                     WriteConfig)
from .table import HudiTable
from .datasource import read_hudi, write_hudi

__all__ = [
    "HudiTable", "TableConfig", "WriteConfig",
    "COPY_ON_WRITE", "MERGE_ON_READ",
    "PAYLOAD_DEFAULT", "PAYLOAD_OVERWRITE_LATEST",
    "QUERY_SNAPSHOT", "QUERY_READ_OPTIMIZED", "QUERY_INCREMENTAL",
    "read_hudi", "write_hudi",
]

__version__ = "0.1.0"
