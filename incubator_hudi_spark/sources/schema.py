"""Schema providers for ingest jobs.

Reference: hudi-utilities/.../schema/*.java (11 files — FilebasedSchemaProvider,
RowBasedSchemaProvider, SchemaRegistryProvider, JdbcbasedSchemaProvider…).
Avro is the reference's canonical schema language; ours is Spark StructType
serialized as its JSON form (``StructType.json()`` / ``fromJson``).
"""

from __future__ import annotations

import json
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def file_based_schema(path: str) -> StructType:
    """FilebasedSchemaProvider: StructType from a JSON schema file
    (either StructType.json() output or a DDL string)."""
    with open(path) as f:
        body = f.read().strip()
    try:
        return StructType.fromJson(json.loads(body))
    except (json.JSONDecodeError, KeyError, TypeError):
        return StructType.fromDDL(body)


def row_based_schema(df: DataFrame) -> StructType:
    """RowBasedSchemaProvider: the source batch's own schema."""
    return df.schema


def registry_schema(fetch: Callable[[], str]) -> StructType:
    """SchemaRegistryProvider shape: ``fetch`` returns the registry's JSON
    schema body (the HTTP GET is injected — no live registry in tests)."""
    return StructType.fromJson(json.loads(fetch()))


def conform(df: DataFrame, schema: Optional[StructType]) -> DataFrame:
    """Project/cast a source batch to the provided schema (missing columns
    become typed nulls, extra columns drop, types cast) — the reference does
    the same via Avro rewriting in DeltaSync."""
    if schema is None:
        return df
    from pyspark.sql import functions as F
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in df.columns
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)
