"""Mango (MongoDB-subset) selector -> Catalyst Column translator.

The reference's entire predicate language is the mingo operator set
registered in MAP#rxdb/dist/esm/rx-query-mingo.js:20-43:
``$and $or $not $nor $eq $ne $gt $gte $lt $lte $in $nin $mod $regex
$elemMatch $size $all $exists $type`` plus ``$sort``/``$project`` pipeline
stages.  This module translates a selector dict to a single Column
expression, so Catalyst gets a declarative predicate it can push down,
split into partition/residual filters, and codegen — subsuming the
reference's query planner (MAP#rxdb/dist/esm/query-planner.js:24-133)
entirely.

``find`` reproduces query normalization (MAP#rxdb/dist/esm/
rx-query-helper.js:12-138): bare-value ``$eq`` sugar, default skip 0,
primary key appended to every sort for deterministic order, and the
implicit ``_deleted = false`` filter (rx-query.js:182-184).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOGICAL = {"$and", "$or", "$nor"}
COMPARISON = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin"}
EVALUATION = {"$mod", "$regex", "$exists", "$size", "$elemMatch", "$not", "$type"}
SUPPORTED = LOGICAL | COMPARISON | EVALUATION


class MangoError(ValueError):
    pass


def _is_operator_dict(v: Any) -> bool:
    return isinstance(v, dict) and any(str(k).startswith("$") for k in v)


def _resolve_dtype(schema, dotted: str):
    """Walk a dot-path through a StructType; None when unresolvable
    (unknown field, or no schema was provided)."""
    from pyspark.sql.types import MapType, StructType

    if schema is None:
        return None
    cur = schema
    for part in str(dotted).split("."):
        if isinstance(cur, MapType):
            # dot-path on a map is key access — every value has valueType
            cur = cur.valueType
        elif isinstance(cur, StructType):
            try:
                cur = cur[part].dataType
            except KeyError:
                return None
        else:
            return None
    return cur


def _field_predicate(col: Column, ops: dict[str, Any], dtype=None) -> Column:
    """Translate one field's operator dict, e.g. {"$gt": 5, "$lt": 9}.

    ``dtype`` (optional, from the input schema) lets type-polymorphic
    operators like ``$all`` pick the mingo semantics for the actual
    column type; without it, array semantics are assumed."""
    from pyspark.sql.types import ArrayType

    conds: list[Column] = []
    for op, arg in ops.items():
        if op == "$eq":
            conds.append(col.eqNullSafe(F.lit(arg)) if arg is None else col == F.lit(arg))
        elif op == "$ne":
            conds.append(~col.eqNullSafe(F.lit(arg)))
        elif op == "$gt":
            conds.append(col > F.lit(arg))
        elif op == "$gte":
            conds.append(col >= F.lit(arg))
        elif op == "$lt":
            conds.append(col < F.lit(arg))
        elif op == "$lte":
            conds.append(col <= F.lit(arg))
        elif op == "$in":
            conds.append(col.isin(list(arg)))
        elif op == "$nin":
            # Mongo $nin also matches missing fields; Spark NULL-safe variant
            conds.append(~col.isin(list(arg)) | col.isNull())
        elif op == "$mod":
            d, r = arg
            conds.append(col % F.lit(d) == F.lit(r))
        elif op == "$regex":
            conds.append(col.rlike(arg))
        elif op == "$exists":
            conds.append(col.isNotNull() if arg else col.isNull())
        elif op == "$size":
            conds.append(F.size(col) == F.lit(int(arg)))
        elif op == "$elemMatch":
            conds.append(_elem_match(col, arg))
        elif op == "$all":
            # array contains EVERY listed value
            # (MAP#mingo/dist/esm/operators/query/array/all.js); Mongo
            # semantics: an empty $all list matches nothing, and $all on
            # a SCALAR field degrades to equality (the scalar must equal
            # every listed value) — array_contains would fail analysis
            # on a non-array column, so dispatch on the schema type when
            # the caller supplied one (find() does)
            vals = list(arg)
            if not vals:
                conds.append(F.lit(False))
            elif dtype is not None and not isinstance(dtype, ArrayType):
                allc = col == F.lit(vals[0])
                for v in vals[1:]:
                    allc = allc & (col == F.lit(v))
                conds.append(allc)
            else:
                allc = F.array_contains(col, F.lit(vals[0]))
                for v in vals[1:]:
                    allc = allc & F.array_contains(col, F.lit(v))
                conds.append(allc)
        elif op == "$not":
            inner = (
                _field_predicate(col, arg, dtype)
                if isinstance(arg, dict)
                else (col == F.lit(arg))
            )
            conds.append(~inner)
        elif op == "$type":
            raise MangoError(
                "$type is a JSON-type check; Spark columns are statically "
                "typed (SURVEY.md §2.2 marks it N/A)"
            )
        else:
            raise MangoError(f"unsupported operator {op!r}")
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _elem_match(col: Column, arg: dict[str, Any]) -> Column:
    """$elemMatch: array has an element matching the sub-predicate
    (MAP#mingo/dist/esm/operators/query/array/elemMatch.js).  Scalar
    element form ({"$gt": 0.5}) and struct-element form ({"f": {...}})."""
    if _is_operator_dict(arg):
        return F.exists(col, lambda x: _field_predicate(x, arg))

    def elem_pred(x: Column) -> Column:
        conds = []
        for f, sub in arg.items():
            fc = x.getField(f)
            if _is_operator_dict(sub):
                conds.append(_field_predicate(fc, sub))
            else:
                conds.append(fc == F.lit(sub))
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    return F.exists(col, elem_pred)


def mango_to_column(selector: dict[str, Any], schema=None) -> Column:
    """Translate a full Mango selector to one boolean Column.

    ``schema`` (the input DataFrame's StructType, optional) enables
    type-dispatch for polymorphic operators ($all on scalar fields)."""
    if not selector:
        return F.lit(True)
    conds: list[Column] = []
    for key, val in selector.items():
        if key == "$and":
            sub = [mango_to_column(s, schema) for s in val]
            acc = sub[0]
            for c in sub[1:]:
                acc = acc & c
            conds.append(acc)
        elif key == "$or":
            sub = [mango_to_column(s, schema) for s in val]
            acc = sub[0]
            for c in sub[1:]:
                acc = acc | c
            conds.append(acc)
        elif key == "$nor":
            sub = [mango_to_column(s, schema) for s in val]
            acc = sub[0]
            for c in sub[1:]:
                acc = acc | c
            conds.append(~acc)
        elif str(key).startswith("$"):
            raise MangoError(f"unsupported top-level operator {key!r}")
        else:
            col = F.col(key)  # dot-paths address struct fields natively
            if _is_operator_dict(val):
                conds.append(
                    _field_predicate(col, val, _resolve_dtype(schema, key))
                )
            else:
                # bare value sugar {f: v} ≡ {f: {$eq: v}}
                # (MAP#rxdb/dist/esm/rx-query-helper.js:38-44)
                conds.append(
                    col.eqNullSafe(F.lit(val)) if val is None else col == F.lit(val)
                )
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def find(
    df: DataFrame,
    selector: dict[str, Any] | None = None,
    sort: list[dict[str, str]] | None = None,
    skip: int = 0,
    limit: int | None = None,
    projection: list[str] | None = None,
    primary_key: str | None = None,
) -> DataFrame:
    """``collection.find(mango)`` as a DataFrame plan, with the engine's
    normalization: implicit `_deleted=false`, PK sort tiebreak, skip/limit
    after sort (MAP#rxdb/dist/esm/plugins/storage-dexie/dexie-query.js:45-47).
    """
    out = df
    if "_deleted" in df.columns:
        out = out.where(~F.col("_deleted"))
    if selector:
        out = out.where(mango_to_column(selector, df.schema))
    order: list[Column] = []
    if sort:
        for spec in sort:
            for field, direction in spec.items():
                c = F.col(field)
                order.append(c.desc() if direction == "desc" else c.asc())
    if primary_key and primary_key not in [list(s)[0] for s in (sort or [])]:
        order.append(F.col(primary_key).asc())
    if order:
        out = out.orderBy(*order)
    if skip:
        out = out.offset(skip)
    if limit is not None:
        out = out.limit(limit)
    if projection:
        out = out.select(*projection)
    return out
