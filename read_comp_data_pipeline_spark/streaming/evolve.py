"""Schema evolution (SURVEY §1.3, FIXTURES §3).

The reference evolved its schema informally — the BFS variant added a 13th
classifier term absent from the DFS variant (``search_scrape.py:1100-1102``
vs ``:368-381``) with no migration. The engine makes evolution explicit and
transactional: before applying an epoch whose WAL slice carries columns or
types beyond the target schema, commit a metadata-only schema snapshot
(add-column / widen), then merge. Pre-evolution rows read as null for added
columns (alignment happens at scan time — ``operators/merge._align``).
"""

from __future__ import annotations

from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable

# numeric widening lattice: target type that safely holds both
_WIDEN: dict[tuple[str, str], T.DataType] = {
    ("integer", "long"): T.LongType(),
    ("long", "integer"): T.LongType(),
    ("integer", "double"): T.DoubleType(),
    ("long", "double"): T.DoubleType(),
    ("double", "integer"): T.DoubleType(),
    ("double", "long"): T.DoubleType(),
    ("float", "double"): T.DoubleType(),
    ("double", "float"): T.DoubleType(),
    ("short", "integer"): T.IntegerType(),
    ("integer", "short"): T.IntegerType(),
    ("short", "long"): T.LongType(),
    ("long", "short"): T.LongType(),
}


def evolved_schema(
    target: T.StructType,
    incoming: T.StructType,
    ignore: set[str] = frozenset({"op", "epoch", "ts"}),
) -> T.StructType | None:
    """Compute the evolved target schema for an incoming slice schema.

    Returns None when no evolution is needed. New columns are appended
    (nullable); same-name numeric columns widen per the lattice; anything
    incompatible raises.
    """
    tgt_fields = {f.name: f for f in target.fields}
    out = list(target.fields)
    changed = False
    for f in incoming.fields:
        if f.name in ignore:
            continue
        if f.name not in tgt_fields:
            out.append(T.StructField(f.name, f.dataType, True))
            changed = True
            continue
        cur = tgt_fields[f.name]
        if cur.dataType == f.dataType:
            continue
        pair = (cur.dataType.typeName(), f.dataType.typeName())
        if pair in _WIDEN:
            wide = _WIDEN[pair]
            if wide != cur.dataType:
                idx = next(i for i, x in enumerate(out) if x.name == f.name)
                out[idx] = T.StructField(f.name, wide, True)
                changed = True
        else:
            raise ValueError(
                f"incompatible evolution for column {f.name!r}: "
                f"{cur.dataType.simpleString()} vs {f.dataType.simpleString()}"
            )
    return T.StructType(out) if changed else None


def ensure_evolved(table: HashMergeTable, incoming: T.StructType) -> bool:
    """Apply evolution transactionally BEFORE the upsert wave that needs it
    (north_rule). Returns True if the table schema changed."""
    new = evolved_schema(table.schema, incoming)
    if new is None:
        return False
    return table.evolve_schema(new)
