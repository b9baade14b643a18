"""Deduplication operators for large-scale training-data pipelines.

The reference deduplicates with an in-driver seen-set (exact key identity,
``/root/reference/search_scrape.py:330-337``). At 100 TB the engine needs
content-level dedup families, each shuffle-conscious:

* exact          — hash-groupBy on md5(text); map-side combinable.
* minhash + LSH  — shingle → k minhashes → banded signatures → bucket join;
                   candidate verification by exact Jaccard. Pair generation
                   is bounded per bucket (no all-pairs blowup).
* simhash        — 64-bit sign-sum fingerprint; near-dups share a bucket
                   (hamming-k search via bit-block banding).
* n-gram Jaccard — exact verification used on LSH candidates.
* embedding cosine — see operators/similarity.py.

Everything is Column-expression only (no UDFs) so DuckDB oracles can
replicate it bit-for-bit via the portable hash (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.functions.hashing import phash, phash_sql


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts: (content_hash, keeper_id = min id, dup_count).

    One hash-aggregate; partial agg makes it skew-safe even if one document
    is duplicated millions of times.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("dup_count"),
        )
    )


def tokens_expr(text_col: str = "text"):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """(id, shingle) — distinct n-gram word shingles per document.

    Shingling is a per-row array transform (no shuffle); the distinct is a
    local explode + aggregate keyed by (id, shingle).
    """
    toks = tokens_expr(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.where(F.size(toks) >= n)  # <n-token docs yield no shingles
        .select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


# universal-hash family over ONE base hash per shingle: h_i = (A_i*h30 + B_i)
# mod P. One md5 instead of k — the md5 was 90% of signature cost. Constants
# are plain arithmetic so DuckDB oracles replicate bit-for-bit.
_MH_P = 2_147_483_647  # 2^31 - 1
_MH_H30 = 1 << 30


def _mh_coeffs(i: int) -> tuple[int, int]:
    return 1_000_003 + 97 * i, 10_007 + 31 * i


def minhash_signatures(sh: DataFrame, k: int = 16) -> DataFrame:
    """(id, h0..h{k-1}) — k minhashes per document from a single portable
    base hash via a universal-hash family. One aggregate over the exploded
    shingle relation; map-side combinable → skew-safe.
    """
    h30 = F.pmod(phash(F.col("shingle")), F.lit(_MH_H30))
    aggs = []
    for i in range(k):
        a, b = _mh_coeffs(i)
        aggs.append(F.min(F.pmod(h30 * a + b, F.lit(_MH_P))).alias(f"h{i}"))
    return sh.groupBy("id").agg(*aggs)


def minhash_sql_aggs(k: int = 16) -> str:
    """DuckDB rendering of :func:`minhash_signatures`'s aggregate list."""
    base = f"(({phash_sql('shingle')}) % {_MH_H30})"
    parts = []
    for i in range(k):
        a, b = _mh_coeffs(i)
        parts.append(f"min(({base} * {a} + {b}) % {_MH_P}) AS h{i}")
    return ", ".join(parts)


def lsh_bucket_pairs(sig: DataFrame, k: int = 16, bands: int = 4) -> DataFrame:
    """Banded LSH: docs agreeing on any full band become candidate pairs.

    Returns distinct (id_a < id_b) pairs. The self-join shuffles on the
    band-hash key only; bucket sizes are bounded by signature agreement, so
    no quadratic blowup on the full corpus.
    """
    rows_per_band = k // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + i}").cast("string") for i in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws(",", *cols)).alias(f"band{b}"))
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_no"), F.col(f"band{b}").alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bd"),
    ).select("id", "bd.band_no", "bd.band_hash")
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, on=["band_no", "band_hash"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_on_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs.

    The shingle self-join is restricted FIRST to docs that appear in a
    candidate pair (broadcast semi-join on the small candidate-id set) —
    without that, intersection counting grows with the whole corpus's
    shared-shingle volume instead of the candidates'. union =
    |A| + |B| - |A∩B|; all shuffles keyed on doc id or shingle.

    ``pairs`` feeds two branches (the id broadcast and the final join), so
    it is materialized here via an eager localCheckpoint — otherwise the
    banding subtree executes twice. localCheckpoint (not persist): its
    storage is released by the ContextCleaner when the DataFrame is
    garbage-collected, so repeated invocations (bench loops, catalog
    re-runs, long sessions) don't accumulate cached partitions the way an
    unpaired persist() would.
    """
    pairs = pairs.localCheckpoint(eager=True)
    cand_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh_c = sh.join(F.broadcast(cand_ids), on="id", how="left_semi")
    sizes = sh_c.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh_c.alias("x")
        .join(sh_c.alias("y"), on="shingle")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs.join(inter, on=["id_a", "id_b"], how="inner")
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), on="id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), on="id_b")
        .select(
            "id_a", "id_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band → verify."""
    sh = shingles(df, text_col, id_col, n)
    sig = minhash_signatures(sh, k)
    pairs = lsh_bucket_pairs(sig, k, bands)
    return jaccard_on_pairs(pairs, sh).where(F.col("jaccard") >= threshold)


def _bit_weight(b: int) -> int:
    """2^b as a signed-64 term: bit 63 is the sign bit, so its weight is
    -2^63 (two's complement) — keeps the fingerprint inside BIGINT range
    in both Spark's ANSI mode and DuckDB."""
    return -(2 ** 63) if b == 63 else 2 ** b


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(id, simhash) — sign-sum fingerprint over token hashes.

    bit_b(doc) = 1 iff sum over tokens of (2*bit_b(hash(token)) - 1) > 0.
    Pure Column expressions; one explode + one aggregate.

    Default 64 bits: a 16-bit fingerprint space (65,536 values) saturates
    at corpus scale — hamming-banding buckets degenerate toward all-pairs
    once the corpus dwarfs the value space (VERDICT r2). The portable base
    hash carries 60 bits (15 md5 nibbles), so bits 60-63 come from a
    seeded second hash; bit 63 lands on the BIGINT sign bit via its two's
    complement weight. Width is parameterized; 16 stays tested as the
    regression width.
    """
    assert 1 <= bits <= 64
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_expr(text_col)).alias("tok"))
        .where(F.col("tok") != "")
    )
    h = phash(F.col("tok"))
    h_ext = phash(F.col("tok"), seed=1) if bits > 60 else None

    def bit(b):
        src, off = (h, b) if b < 60 else (h_ext, b - 60)
        return F.shiftright(src, off).bitwiseAND(F.lit(1))

    bit_sums = [
        F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"s{b}") for b in range(bits)
    ]
    per_doc = toks.groupBy("id").agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(_bit_weight(b))).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return per_doc.select("id", sim.cast("long").alias("simhash"))


def simhash_sql(
    bits: int = 64,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB rendering of :func:`simhash` — a SELECT yielding
    (id, simhash), bit-exact at any width ≤ 64 (same portable hashes,
    same two's-complement weight for bit 63)."""
    assert 1 <= bits <= 64
    h2 = f", {phash_sql('tok', seed=1)} AS h2" if bits > 60 else ""

    def bit(b):
        return f"((h >> {b}) & 1)" if b < 60 else f"((h2 >> {b - 60}) & 1)"

    bitsum = ", ".join(
        f"sum(CASE WHEN {bit(b)} = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(bits)
    )
    val = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {'(-9223372036854775807 - 1)' if b == 63 else 2 ** b} ELSE 0 END)"
        for b in range(bits)
    )
    return rf"""
    SELECT id, CAST({val} AS BIGINT) AS simhash FROM (
      SELECT id, {bitsum} FROM (
        SELECT id, {phash_sql('tok')} AS h{h2} FROM (
          SELECT {id_col} AS id,
                 unnest(regexp_split_to_array(lower(trim({text_col})), '\s+')) AS tok
          FROM {table}
        ) WHERE tok <> ''
      ) GROUP BY id
    )
    """


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Documents sharing a simhash bucket → near-dup groups (hamming-0).
    For hamming ≤ k neighbor search use :func:`simhash_hamming_pairs`."""
    s = simhash(df, text_col, id_col)
    return (
        s.groupBy("simhash")
        .agg(F.min("id").alias("keeper_id"), F.count("*").alias("group_size"))
        .where(F.col("group_size") > 1)
    )


def _hamming_blocks(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per block, splitting ``bits`` into max_hamming+1
    near-equal blocks. Pigeonhole: two fingerprints within hamming k agree
    exactly on at least one of k+1 disjoint blocks."""
    n_blocks = max_hamming + 1
    base, extra = divmod(bits, n_blocks)
    out, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ k via bit-block banding —
    the same banding trick as MinHash-LSH, applied to fingerprint bits:
    candidate pairs come only from block-bucket agreement (each self-join
    shuffles on (block_no, block_val), bounded per bucket — no all-pairs
    cross product), then exact popcount verifies. Scales like LSH."""
    s = simhash(df, text_col, id_col, bits)
    blocks = _hamming_blocks(bits, max_hamming)
    stacked = s.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("block_no"),
                    F.shiftright(F.col("simhash"), shift)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("block_val"),
                )
                for i, (shift, width) in enumerate(blocks)
            ])
        ).alias("b"),
    ).select("id", "simhash", "b.block_no", "b.block_val")
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(b, on=["block_no", "block_val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_hamming_sql(
    simhash_cte: str, bits: int = 64, max_hamming: int = 2
) -> str:
    """DuckDB rendering of :func:`simhash_hamming_pairs` given a CTE body
    ``simhash_cte`` that yields (id, simhash)."""
    blocks = _hamming_blocks(bits, max_hamming)
    stacked = " UNION ALL ".join(
        f"SELECT id, simhash, {i} AS block_no,"
        f" (simhash >> {shift}) & {(1 << width) - 1} AS block_val FROM s"
        for i, (shift, width) in enumerate(blocks)
    )
    return f"""
    WITH s AS ({simhash_cte}),
    stacked AS ({stacked}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM stacked a JOIN stacked b
        ON a.block_no = b.block_no AND a.block_val = b.block_val AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(bit_count(CAST(xor(sh_a, sh_b) AS BIGINT)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(CAST(xor(sh_a, sh_b) AS BIGINT)) <= {max_hamming}
    """
