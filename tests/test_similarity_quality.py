"""Quality checks for the approximate operators: LSH-ANN recall vs brute
force, MinHash-LSH vs exact Jaccard ground truth, W1 UDF ≡ relational."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.functions.extract import scan_sections
from read_comp_data_pipeline_spark.operators.dedup import (
    jaccard_on_pairs,
    lsh_bucket_pairs,
    minhash_near_dups,
    minhash_signatures,
    shingles,
)
from read_comp_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_ann_topk,
)
from read_comp_data_pipeline_spark.plans.relational_w1 import relational_sections
from read_comp_data_pipeline_spark.sources.tables import load


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 16)
    exact = brute_force_topk(emb, q, k=5)
    # fewer planes → bigger buckets → higher recall; this synthetic corpus
    # is weakly clustered (max pairwise cosine ≈ 0.45), so 4 planes
    approx = lsh_ann_topk(emb, q, k=5, n_planes=4, dim=64)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"recall@5 {recall}"


def _py_jaccard(t1: str, t2: str, n=5):
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    a, b = sh(t1), sh(t2)
    return len(a & b) / len(a | b) if a | b else 0.0


def test_minhash_finds_planted_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = [
        (0, base),
        (1, base.replace("dog", "cat", 1)),          # near-dup of 0
        (2, base),                                    # exact dup of 0
        (3, "completely different words entirely unrelated content here " * 6),
        (4, "another unrelated document with its own vocabulary set " * 6),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    found = minhash_near_dups(df, n=5, k=16, bands=4, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in found.collect()}
    # guarded (default) contract: exact dup 2 links to keeper 0 via a star
    # edge; (1, 2) is implied transitively, not emitted
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)
    # unguarded mode restores raw all-pairs output
    raw = minhash_near_dups(df, n=5, k=16, bands=4, threshold=0.5, collapse=False)
    raw_pairs = {(r["id_a"], r["id_b"]) for r in raw.collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= raw_pairs


def test_lsh_jaccard_matches_exact_python(spark):
    texts = [
        (i, f"shared prefix tokens for all documents here variant {i % 3} "
            "middle section common words across docs "
            f"tail part {i} unique ending tokens {i * 7}")
        for i in range(8)
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    sh = shingles(df, n=5)
    sig = minhash_signatures(sh, k=16)
    pairs = lsh_bucket_pairs(sig, k=16, bands=4)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_on_pairs(pairs, sh).collect()}
    texts_d = dict(texts)
    for (a, b), got in j.items():
        assert got == pytest.approx(_py_jaccard(texts_d[a], texts_d[b]), abs=1e-9)


# ---------------------------------------------------------------------------
# W1: pandas-scan implementation ≡ relational implementation on a battery of
# adversarial documents covering every quirk of the reference loop.
# ---------------------------------------------------------------------------
TRICKY_DOCS = [
    "",                                        # empty → single flush of ''? (no: desc '' stays empty... covered)
    "plain text only",
    "== A ==",                                 # header, nothing else
    "text == mid == marker",                   # marker mid-line
    "====== deep first ======\nx",             # h6 before any h2
    "===== five =====\nbody\n== two ==\ny",    # h5 replace quirk then h2
    "== References ==\nhidden",                # instant break
    "a\n=== References are deep ===\nb\n== Notes ==\nc",
    "== A ==\n=== B ===\n==== C ====\n===== D =====\n====== E ======\nz",
    "== A ==\n\n\n== B ==\nbody",              # empty lines accumulate
    "intro\n== A ==\nbody\n=== B ===\n==== C ====\n=== D ===\ntail",
]


def test_w1_udf_equals_relational_on_tricky_docs(spark):
    rows = [(i, f"T{i}", d) for i, d in enumerate(TRICKY_DOCS)]
    docs = spark.createDataFrame(rows, ["doc_id", "title", "content"])
    rel = relational_sections(docs)
    got_rel = {
        (r["doc_id"], r["section_no"], r["heading"], r["text"])
        for r in rel.collect()
    }
    got_udf = set()
    for i, d in enumerate(TRICKY_DOCS):
        for n, (h, t) in enumerate(scan_sections(f"T{i}", d), start=1):
            got_udf.add((i, n, h, t))
    assert got_rel == got_udf


def test_w1_python_scan_brute_force_grammar(spark):
    """Deterministic pseudo-random doc grammar sweep: relational == scan
    for 40 generated documents mixing all marker levels and edge shapes."""
    import hashlib

    def gen(seed: int) -> str:
        h = hashlib.md5(str(seed).encode()).digest()
        lines = []
        for i, byte in enumerate(h):
            kind = byte % 9
            word = f"w{byte}"
            if kind == 0:
                lines.append(f"== {word} ==")
            elif kind == 1:
                lines.append(f"=== {word} ===")
            elif kind == 2:
                lines.append(f"==== {word} ====")
            elif kind == 3:
                lines.append(f"===== {word} =====")
            elif kind == 4:
                lines.append(f"====== {word} ======")
            elif kind == 5:
                lines.append(f"text with == {word} == inside")
            elif kind == 6:
                lines.append("")
            elif kind == 7 and byte % 2:
                lines.append("== References ==")
            else:
                lines.append(f"plain {word} line {i}")
        return "\n".join(lines)

    docs = [(i, f"T{i}", gen(i)) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "title", "content"])
    got_rel = {
        (r["doc_id"], r["section_no"], r["heading"], r["text"])
        for r in relational_sections(df).collect()
    }
    got_py = set()
    for i, _, content in docs:
        for n, (h, t) in enumerate(scan_sections(f"T{i}", content), start=1):
            got_py.add((i, n, h, t))
    assert got_rel == got_py


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    from read_comp_data_pipeline_spark.operators.similarity import ivf_ann_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 16)
    exact = brute_force_topk(emb, q, k=5)
    approx = ivf_ann_topk(emb, q, k=5, n_centroids=16, n_probe=8)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # metric-matched probe ranking (squared L2, same as the KMeans
    # assignment) at n_probe=8: floor 0.8 — a regression toward random
    # cell assignment or mismatched probe ranking trips this
    assert recall >= 0.8, f"recall@5 {recall}"


def test_winnowing_robust_to_local_edits(spark):
    """An edit in the middle of a document perturbs only overlapping
    windows: most fingerprints survive (the property exact hashing lacks)."""
    from read_comp_data_pipeline_spark.operators.textstats import winnowing_fingerprints

    base = " ".join(f"tok{i}" for i in range(120))
    edited = base.replace(" tok60 ", " EDITED ")
    df = spark.createDataFrame([(0, base), (1, edited)], ["doc_id", "text"])
    fps = winnowing_fingerprints(df)
    a = {r["fp"] for r in fps.where("doc_id = 0").collect()}
    b = {r["fp"] for r in fps.where("doc_id = 1").collect()}
    overlap = len(a & b) / len(a)
    assert overlap > 0.8, f"fingerprint survival {overlap}"
    assert a != b  # the edit is still detectable


def test_simhash_hamming_pairs_find_planted_bit_flips(spark):
    """Documents edited just enough to flip 1-2 simhash bits must surface
    as hamming<=2 pairs; unrelated documents must not. Pinned to the
    16-bit regression width (the edits were calibrated to flip ≤2 of 16
    bits; at 64 bits the same edits flip more — covered by the 64-bit
    tests below)."""
    from read_comp_data_pipeline_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    docs = [
        (0, base),
        (1, base + " lambda"),                 # tiny suffix edit
        (2, base.replace("kappa", "kappa2", 2)),  # small token change
        (3, "totally different vocabulary with nothing shared at all " * 8),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sh = {r["id"]: r["simhash"] for r in simhash(df, bits=16).collect()}
    ham = lambda a, b: bin(sh[a] ^ sh[b]).count("1")  # noqa: E731
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(df, bits=16, max_hamming=2).collect()
    }
    # every true hamming<=2 pair is found with the exact distance, none missed
    for a in range(4):
        for b in range(a + 1, 4):
            if ham(a, b) <= 2:
                assert pairs.get((a, b)) == ham(a, b), (a, b, ham(a, b), pairs)
            else:
                assert (a, b) not in pairs
    # the planted near-dups really are near (and the outlier is not)
    assert ham(0, 1) <= 2 and ham(0, 2) <= 2
    assert ham(0, 3) > 2


def test_simhash64_banding_is_exact_for_hamming_k(spark):
    """At the 64-bit engine default, the bit-block banding must find
    exactly the true hamming<=2 pairs (pigeonhole completeness + popcount
    verification), including hamming-0 exact duplicates, and nothing else."""
    from read_comp_data_pipeline_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    docs = [
        (0, base),
        (1, base),  # exact duplicate → hamming 0
        (2, base + " lambda mu"),
        (3, "totally different vocabulary with nothing shared at all " * 8),
        (4, "yet another unrelated block of words entirely disjoint too " * 8),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sh = {r["id"]: r["simhash"] for r in simhash(df, bits=64).collect()}
    ham = lambda a, b: bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1")  # noqa: E731
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(df, bits=64, max_hamming=2).collect()
    }
    for a in range(5):
        for b in range(a + 1, 5):
            if ham(a, b) <= 2:
                assert pairs.get((a, b)) == ham(a, b), (a, b, ham(a, b), pairs)
            else:
                assert (a, b) not in pairs
    assert pairs[(0, 1)] == 0  # the exact dup is guaranteed found


def test_simhash64_desaturates_candidate_set(spark, sf_dir):
    """The reason 64-bit is the default (VERDICT r2): on the same corpus
    the 16-bit width's hamming<=2 'near-dup' set is dominated by value-
    space collisions; 64 bits shrinks it by orders of magnitude while
    keeping the genuinely identical/near-identical documents."""
    from read_comp_data_pipeline_spark.operators.dedup import simhash_hamming_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n16 = simhash_hamming_pairs(docs, bits=16, max_hamming=2).count()
    n64 = simhash_hamming_pairs(docs, bits=64, max_hamming=2).count()
    assert n64 * 50 <= n16, (n16, n64)  # ≥ 50× drop on the same corpus
    assert n64 >= 0  # sanity; exactness is covered by the oracle entry


def test_ivf_cells_partition_prune_on_disk(spark, sf_dir, tmp_path):
    """The IVF scale claim in ivf_ann_topk's docstring, made real: the
    corpus written bucketed by cell, a probe reading only its cells via
    partition pruning — PartitionFilters in the plan, and only the probed
    cells' rows scanned."""
    import contextlib
    import io

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings")
    data = emb.withColumn(
        "_feat", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=8, seed=42, featuresCol="_feat", predictionCol="cell").fit(data)
    assigned = model.transform(data).select("vec_id", "embedding", "cell")
    path = str(tmp_path / "ivf_cells")
    assigned.write.partitionBy("cell").parquet(path)

    probe_cells = [1, 3]
    scan = spark.read.parquet(path).where(F.col("cell").isin(probe_cells))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan

    expect = assigned.where(F.col("cell").isin(probe_cells)).count()
    assert scan.count() == expect
    assert scan.count() < assigned.count()  # pruning is real, not a full scan
