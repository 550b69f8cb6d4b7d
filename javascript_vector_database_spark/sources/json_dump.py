"""JSON dump sink/source (reference exportJSON/importJSON,
MAP#rxdb/dist/esm/plugins/json-dump/index.js:32-71).

Semantics preserved: the dump carries a schema hash checked on import;
engine-internal columns (`_rev`, `_attachments`) are stripped from the
dump; import stamps a fresh `_lwt` on every row.  The payload is JSON
Lines (a distributed-friendly dump — each executor writes its split;
the reference's single-array JSON does not scale past one node).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INTERNAL = ("_rev", "_attachments")


def schema_hash(df: DataFrame) -> str:
    payload = [c for c in df.schema.simpleString().split(",")]
    return hashlib.md5(json.dumps(payload, sort_keys=True).encode()).hexdigest()


def export_json(df: DataFrame, path: str) -> str:
    """Whole-collection dump: JSONL data files + a _dump_meta.json with
    the schema hash.  Returns the hash."""
    data = df.drop(*[c for c in _INTERNAL if c in df.columns])
    h = schema_hash(data)
    data.write.mode("overwrite").json(os.path.join(path, "data"))
    with open(os.path.join(path, "_dump_meta.json"), "w") as f:
        json.dump({"schemaHash": h, "columns": data.columns}, f)
    return h


def import_json(
    spark: SparkSession, path: str, expected_schema, lwt: float = 0.0
) -> DataFrame:
    """Load a dump, assert the schema hash, stamp fresh `_lwt`
    (MAP#json-dump/index.js:49-71: mismatched schema hash -> error;
    import stamps fresh `_meta.lwt`)."""
    with open(os.path.join(path, "_dump_meta.json")) as f:
        meta = json.load(f)
    df = spark.read.schema(expected_schema).json(os.path.join(path, "data"))
    got = schema_hash(df)
    if got != meta["schemaHash"]:
        raise ValueError(
            f"schema hash mismatch: dump={meta['schemaHash']} expected={got}"
        )
    return df.withColumn("_lwt", F.lit(float(lwt)))
