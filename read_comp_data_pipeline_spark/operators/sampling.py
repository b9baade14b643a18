"""Deterministic sampling & dataset splitting for training-data pipelines.

A training corpus needs train/val/test splits and per-stratum samples that
are (a) reproducible across runs, (b) independent of cluster size,
partitioning, and row order, and (c) stable under incremental ingest (a
document's split never changes when other documents arrive — the property
``df.randomSplit``/``sample`` do NOT have, since they seed per-partition).
Hash-based assignment gives all three: the split is a pure projection of
the row's own key.

Scale shape: :func:`hash_split` adds ZERO shuffles (a deterministic
expression on the id column — Catalyst folds it into the scan
projection); :func:`stratified_sample` is one shuffle keyed on the
stratum with a per-stratum top-n window (skew-bounded by stratum size;
at 100 TB a hot stratum caps at n kept rows per task via the rank
filter's partial evaluation).

Both use the portable md5-derived hash (functions/hashing.py), so DuckDB
oracles replicate every assignment bit-for-bit — sampling here is
deterministic enough to VALUE-check, not just count-check.

Reference analogue: the reference samples nothing (it scrapes whatever the
search API returns, ``/root/reference/search_scrape.py:932-``); these
operators are part of the training-data extension surface (brief: "the
operations a large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.functions.hashing import phash, phash_sql

# assignment granularity: hash buckets out of 10_000 → weights are exact
# to 0.01%
_BUCKETS = 10_000


def _normalized_cuts(weights: dict[str, float]) -> list[tuple[str, int]]:
    total = sum(weights.values())
    cuts, acc = [], 0.0
    for name, w in weights.items():  # dict order = declaration order
        acc += w / total
        cuts.append((name, int(round(acc * _BUCKETS))))
    cuts[-1] = (cuts[-1][0], _BUCKETS)  # close rounding gaps
    # a weight < ~0.5/_BUCKETS of total rounds to a zero-width interval:
    # the WHEN chain would still list the label but no hash bucket could
    # ever reach it — fail loudly instead of silently emitting no rows
    prev = 0
    for name, hi in cuts:
        if hi <= prev:
            raise ValueError(
                f"split '{name}' has zero hash-bucket coverage: weight "
                f"{weights[name]!r} is below the 1/{_BUCKETS} assignment "
                f"granularity after normalization"
            )
        prev = hi
    return cuts


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a ``split`` label by hashing its id — stable,
    order-independent, incremental-ingest-safe. ``salt`` versions the
    assignment (bump it to reshuffle all splits deterministically)."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    bucket = F.pmod(phash(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
                    F.lit(_BUCKETS))
    expr = None
    for name, hi in _normalized_cuts(weights):
        cond = bucket < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def hash_split_sql(
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`'s ``split``."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    h = phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    bucket = f"(({h}) % {_BUCKETS})"
    arms = "".join(
        f" WHEN {bucket} < {hi} THEN '{name}'"
        for name, hi in _normalized_cuts(weights)
    )
    return f"CASE{arms} END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic n-per-stratum sample: rows ranked inside each stratum
    by their salted hash (a reproducible random order), keep the first
    ``n_per_stratum``. Output carries ``sample_rank`` (1-based)."""
    h = phash(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_stratum)
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Data-mixture curation: keep each row with its stratum's target rate
    (down-weight an overrepresented source, up-weight a scarce one) by a
    deterministic per-row hash-bucket test — Bernoulli in distribution,
    but reproducible, order-independent, and incremental-ingest-safe (a
    doc's keep/drop never flips when other docs arrive). Unlisted strata
    keep at ``default_rate``. ZERO shuffles: a pure filter Catalyst pushes
    into the scan. Rates are exact to 1/10000."""
    for name, r in {**rates, "default_rate": default_rate}.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {r}")
    bucket = F.pmod(
        phash(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(_BUCKETS),
    )
    default_thr = F.lit(int(round(default_rate * _BUCKETS)))
    thr = None
    for name, r in rates.items():
        cond = F.col(strata_col) == name
        lit_thr = F.lit(int(round(r * _BUCKETS)))
        thr = F.when(cond, lit_thr) if thr is None else thr.when(cond, lit_thr)
    # empty rates = a uniform global sample at default_rate
    thr = default_thr if thr is None else thr.otherwise(default_thr)
    return df.where(bucket < thr)


def mixture_sample_sql(
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> str:
    """DuckDB WHERE predicate mirroring :func:`mixture_sample`."""
    h = phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    default_thr = int(round(default_rate * _BUCKETS))
    if not rates:  # CASE with zero WHEN arms is invalid SQL
        return f"(({h}) % {_BUCKETS}) < {default_thr}"
    arms = "".join(
        f" WHEN {strata_col} = '{name}' THEN {int(round(r * _BUCKETS))}"
        for name, r in rates.items()
    )
    return f"(({h}) % {_BUCKETS}) < (CASE{arms} ELSE {default_thr} END)"


def corpus_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global corpus shuffle for training: every row gets a
    ``shard`` (zero-shuffle hash projection) and a 1-based ``pos`` inside
    its shard (reproducible random order: ranked by an independently
    salted hash, doc id tiebreak). Training readers stream shard files in
    pos order and see a reproducible global permutation — no engine-side
    global sort, no RNG state. One shuffle keyed on shard; size
    ``n_shards`` so a shard's rows fit one task (10^10 docs / 10^4 shards
    = 10^6 rows per window task)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(id_col).cast("string")
    shard = F.pmod(phash(F.concat(F.lit(f"{salt}:shard:"), key)), F.lit(n_shards))
    order = phash(F.concat(F.lit(f"{salt}:ord:"), key))
    w = Window.partitionBy("shard").orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )


def corpus_shuffle_sql(
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
    table: str = "documents",
    select_cols: str = "doc_id",
) -> str:
    """DuckDB rendering of :func:`corpus_shuffle`."""
    key = f"CAST({id_col} AS VARCHAR)"
    shard_h = phash_sql(f"'{salt}:shard:' || {key}")
    shard = f"(({shard_h}) % {n_shards})"
    order = phash_sql(f"'{salt}:ord:' || {key}")
    return f"""
    SELECT {select_cols}, CAST({shard} AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY {shard}
                                   ORDER BY {order} ASC, {id_col} ASC) AS INT)
             AS pos
    FROM {table}
    """


def stratified_sample_sql(
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    table: str = "documents",
    select_cols: str = "doc_id, lang",
) -> str:
    """DuckDB rendering of :func:`stratified_sample`."""
    h = phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT {select_cols}, CAST(sample_rank AS INT) AS sample_rank FROM (
      SELECT {select_cols},
             row_number() OVER (PARTITION BY {strata_col}
                                ORDER BY {h} ASC, {id_col} ASC) AS sample_rank
      FROM {table}
    ) WHERE sample_rank <= {n_per_stratum}
    """
