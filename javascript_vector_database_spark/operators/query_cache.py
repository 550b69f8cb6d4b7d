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
        self._table = None
        self._entries: dict[str, DataFrame] = {}
        self._counts: dict[str, int] = {}
        self.hits = 0
        self.misses = 0

    @classmethod
    def attach(cls, table, primary_key: str | None = None) -> "CachedCollection":
        """Wrap a ``ParquetTable``: queries read ``table.docs()`` and any
        DML verb on the table invalidates the cache.  ``find_by_ids``
        additionally gains the table's partition-pruned point-lookup
        fast path."""
        cache = cls(table.docs, primary_key or table.primary_key)
        cache._table = table
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

    def count(self, selector: dict[str, Any] | None = None) -> int:
        """Matching-doc count with the reference's two-tier fast path
        (rx-query.js:83-120 ``_execOverDatabase``: a COUNT query skips
        result materialization and calls the storage's ``count()``
        directly; rx-query caches ``_result`` so a re-exec is free).

        Tier 1 — cached: the same selector's count (or an already-
        materialized find() result for the same selector, which is
        counted without any rescan).  Tier 2 — storage count: one
        COUNT(1) aggregate with the selector pushed into the scan; no
        row ever reaches the driver but the single tally (count-star
        over parquet can even be answered from footer row counts when
        the selector is empty)."""
        key = "count:" + normalize_spec(selector, None, 0, None, None)
        if key in self._counts:
            self.hits += 1
            return self._counts[key]
        find_key = normalize_spec(selector, None, 0, None, None)
        cached_find = self._entries.get(find_key)
        if cached_find is not None:
            # count the persisted result instance — no rescan
            self.hits += 1
            n = cached_find.count()
        else:
            self.misses += 1
            src = self._source()
            if selector:
                src = src.where(mango.mango_to_column(selector))
            n = src.count()
        self._counts[key] = n
        return n

    def find_by_ids(self, ids: list) -> DataFrame:
        """Point lookups by primary key (the reference's ``findByIds``,
        rx-collection.js:343-381 — a direct storage
        ``findDocumentsById``, never a full query executor pass).  When
        attached to a ``ParquetTable`` this delegates to its
        partition-pruned ``get_by_ids`` (read only the PK-hash buckets
        the ids land in); otherwise an IN filter over the source.
        Cached under its own key like any query.

        Ids must be PRIMITIVES (str/int/float/bool) — the cache key is
        their canonical JSON, and a non-primitive (or a DataFrame, which
        the underlying ``get_by_ids`` would happily take) has no stable
        key: repr() embeds memory addresses, so every call would be a
        guaranteed miss that persists a fresh DataFrame until the next
        invalidate — a quiet persisted-memory leak, not an error (r11
        ADVICE).  Raise instead; DataFrame callers want the uncached
        ``table.get_by_ids`` directly."""
        ids = list(ids)
        bad = [i for i in ids if not isinstance(i, (str, int, float, bool))]
        if bad:
            raise TypeError(
                "find_by_ids takes primitive ids (str/int/float/bool); got "
                f"{type(bad[0]).__name__} — for a DataFrame of keys call "
                "the table's get_by_ids (uncacheable: no stable cache key)"
            )
        key = "byids:" + json.dumps(
            sorted(ids, key=lambda i: (type(i).__name__, str(i)))
        )
        hit = self._entries.get(key)
        if hit is not None:
            self.hits += 1
            return hit
        self.misses += 1
        if self._table is not None:
            df = self._table.get_by_ids(list(ids))
        else:
            from pyspark.sql import functions as F

            df = self._source().where(F.col(self._pk).isin(list(ids)))
        df = df.persist()
        self._entries[key] = df
        return df

    def invalidate(self) -> None:
        """Drop every cached result (called on any write to the backing
        collection — the RxDB change-event analog)."""
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()
        self._counts.clear()

    def __len__(self) -> int:
        return len(self._entries)
