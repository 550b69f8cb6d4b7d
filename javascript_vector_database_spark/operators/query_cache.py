"""Query-result cache — the ``tunnelQueryCache`` analog.

Reference spec: MAP#rxdb/dist/esm/query-cache.js:1-60 and
rx-query.js:347-363 — identical query strings "tunnel" into ONE shared
RxQuery instance, so re-creating the same query reuses the existing
instance (and its maintained result set) until a write touches the
collection.

Spark-first translation: the cache key is the NORMALIZED query spec
(canonical JSON of selector/sort/skip/limit/projection — the same
normalization rx-query's `normalizeMangoQuery` applies before keying);
the value is the same DataFrame, persisted MEMORY_AND_DISK so repeated
executions reuse the InMemoryRelation instead of re-scanning parquet.
Catalyst's ReuseExchange already dedups identical subplans WITHIN one
query; this cache dedups ACROSS queries, which is what the reference's
cache does.  Invalidation is write-driven: a ``ParquetTable`` write
fires its listeners (see ``ParquetTable.on_write``) and the cache drops +
unpersists every entry, exactly like RxDB re-running cached queries on a
collection change event.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from javascript_vector_database_spark.operators import mango


def normalize_spec(
    selector: dict[str, Any] | None,
    sort: list[dict[str, str]] | None,
    skip: int,
    limit: int | None,
    projection: list[str] | None,
) -> str:
    """Canonical cache key: dict keys sorted (selector key order is
    semantically irrelevant), list order preserved (sort precedence and
    projection order are semantic)."""
    return json.dumps(
        {
            "selector": selector or {},
            "sort": sort or [],
            "skip": skip,
            "limit": limit,
            "projection": projection or [],
        },
        sort_keys=True,
        separators=(",", ":"),
    )


class CachedCollection:
    """A find() surface over a collection source with result-instance
    sharing.  ``source`` is any zero-arg callable returning the
    collection DataFrame (e.g. ``table.docs``); pass a ``ParquetTable``
    via :func:`attach` to get automatic write invalidation."""

    def __init__(
        self, source: Callable[[], DataFrame], primary_key: str = "doc_id"
    ) -> None:
        self._source = source
        self._pk = primary_key
        self._entries: dict[str, DataFrame] = {}
        self.hits = 0
        self.misses = 0

    @classmethod
    def attach(cls, table, primary_key: str | None = None) -> "CachedCollection":
        """Wrap a ``ParquetTable``: queries read ``table.docs()`` and any
        DML verb on the table invalidates the cache."""
        cache = cls(table.docs, primary_key or table.primary_key)
        table.on_write(cache.invalidate)
        return cache

    def find(
        self,
        selector: dict[str, Any] | None = None,
        sort: list[dict[str, str]] | None = None,
        skip: int = 0,
        limit: int | None = None,
        projection: list[str] | None = None,
    ) -> DataFrame:
        key = normalize_spec(selector, sort, skip, limit, projection)
        hit = self._entries.get(key)
        if hit is not None:
            self.hits += 1
            return hit
        self.misses += 1
        df = mango.find(
            self._source(),
            selector=selector,
            sort=sort,
            skip=skip,
            limit=limit,
            projection=projection,
            primary_key=self._pk,
        ).persist()
        self._entries[key] = df
        return df

    def invalidate(self) -> None:
        """Drop every cached result (called on any write to the backing
        collection — the RxDB change-event analog)."""
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()

    def __len__(self) -> int:
        return len(self._entries)
