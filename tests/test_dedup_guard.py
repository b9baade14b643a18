"""Duplicate-cluster hot-bucket guard for the near-dup LSH family.

The scale pathology (VERDICT r3 #1): m byte-identical documents agree on
every LSH band, so one band bucket yields m(m-1)/2 candidate pairs —
10^6 copies of a license file → 10^12 pairs from one key. Source-code
corpora (this engine's domain) guarantee million-copy boilerplate, so the
guard collapses exact duplicates to one representative BEFORE banding and
re-links members with linear star edges.

These tests plant exactly that cluster and assert:
  * candidate-pair volume is O(N) post-guard vs O(N²) unguarded,
  * recall is preserved (identical + near-dup docs form one connected
    component over the guarded edge set),
  * the secondary per-bucket cap bounds near-identical (non-exact)
    clusters and reports its drop count via Observation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.operators.dedup import (
    collapse_exact,
    lsh_bucket_pairs,
    minhash_near_dups,
    minhash_signatures,
    shingles,
    simhash_hamming_pairs,
)
from read_comp_data_pipeline_spark.operators.similarity import embedding_near_dup_lsh

BASE = " ".join(f"tok{i}" for i in range(60))  # 60-word base doc
N_COPIES = 200


def _variant(word_idx: int, repl: str) -> str:
    toks = BASE.split()
    toks[word_idx] = repl
    return " ".join(toks)


@pytest.fixture(scope="module")
def planted(spark):
    """200 identical copies of BASE + 3 one-word near-dup variants +
    40 distinct unrelated docs."""
    rows = [(i, BASE) for i in range(N_COPIES)]
    rows += [
        (N_COPIES, _variant(10, "changed")),
        (N_COPIES + 1, _variant(30, "mutated")),
        (N_COPIES + 2, _variant(50, "edited")),
    ]
    rows += [
        (300 + i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _components(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {n: find(n) for n in nodes}


def test_candidate_pairs_linear_not_quadratic(spark, planted):
    """Guarded banding sees one representative per distinct text: the
    candidate set is tiny, while the unguarded path blows up O(N²)."""
    reps, _ = collapse_exact(planted, "text", "doc_id")
    sh = shingles(reps, "text", "doc_id", n=5)
    guarded_pairs = lsh_bucket_pairs(minhash_signatures(sh, 16), 16, 4).count()
    # distinct texts: 1 base + 3 variants + 40 unrelated = 44 → pairs bounded
    # by 44*43/2 even in the worst case; actual band agreement keeps it tiny.
    assert guarded_pairs <= 44 * 43 // 2
    assert guarded_pairs < 100

    sh_raw = shingles(planted, "text", "doc_id", n=5)
    unguarded_pairs = lsh_bucket_pairs(minhash_signatures(sh_raw, 16), 16, 4).count()
    assert unguarded_pairs >= N_COPIES * (N_COPIES - 1) // 2  # the blowup is real


def test_minhash_guard_preserves_recall(spark, planted):
    """All 203 copies+variants form ONE connected component over the
    guarded edge set (star edges + rep-level near-dup edges)."""
    out = minhash_near_dups(planted, "text", "doc_id", n=5, k=16, bands=4, threshold=0.7)
    rows = out.collect()
    # linear edge volume: 199 star edges + a handful of rep edges
    assert len(rows) < N_COPIES + 50
    edges = [(r.id_a, r.id_b) for r in rows]
    nodes = set(range(N_COPIES + 3)) | {300 + i for i in range(40)}
    comp = _components(edges, nodes)
    family = {comp[i] for i in range(N_COPIES + 3)}
    assert len(family) == 1, "identical cluster + near-dup variants must connect"
    # unrelated docs stay out of the family component
    assert all(comp[300 + i] not in family for i in range(40))
    # star edges carry jaccard exactly 1.0
    star = [r for r in rows if r.id_a == 0 and r.id_b < N_COPIES]
    assert len(star) == N_COPIES - 1
    assert all(r.jaccard == 1.0 for r in star)


def test_simhash_guard_is_linear_and_connected(spark, planted):
    out = simhash_hamming_pairs(planted, "text", "doc_id", bits=64, max_hamming=2)
    rows = out.collect()
    assert len(rows) < N_COPIES + 250  # linear, not 200*199/2 ≈ 19,900
    edges = [(r.id_a, r.id_b) for r in rows]
    nodes = set(range(N_COPIES + 3)) | {300 + i for i in range(40)}
    comp = _components(edges, nodes)
    assert len({comp[i] for i in range(N_COPIES)}) == 1
    zero = [r for r in rows if r.id_b < N_COPIES and r.id_a == 0]
    assert all(r.hamming == 0 for r in zero)


def test_embedding_lsh_guard_is_linear(spark):
    m = 100
    base = [float(i % 7) - 3.0 for i in range(16)]
    rows = [(i, base) for i in range(m)]
    rows += [(1000 + i, [((i * 31 + j * 17) % 11) - 5.0 for j in range(16)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = embedding_near_dup_lsh(emb, threshold=0.99, n_planes=6, dim=16).collect()
    star = [r for r in out if r.id_b < m]
    assert len(star) == m - 1  # star edges, not m(m-1)/2 = 4950
    assert all(r.id_a == 0 and r.cosine == 1.0 for r in star)
    assert len(out) < m + 100


def test_bucket_cap_bounds_near_identical_cluster(spark):
    """Non-exact near-identical cluster (every doc differs by one word —
    collapse is a no-op) is bounded by the per-bucket cap, and the drop
    count is observable without an extra job."""
    rows = [(i, _variant(i % 55, f"mut{i}")) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sh = shingles(df, "text", "doc_id", n=5)
    sig = minhash_signatures(sh, 16)

    uncapped = lsh_bucket_pairs(sig, 16, 4).count()
    assert uncapped > 2000  # collapse can't help here; the blowup exists

    obs = Observation("lsh_cap")
    capped = lsh_bucket_pairs(sig, 16, 4, bucket_cap=8, observation=obs)
    n = capped.count()
    # ≤ 4 bands × (8 choose 2) pairs per hot bucket, plus slack for
    # partial-agreement buckets
    assert n <= 4 * 28 + 200
    assert obs.get["capped_drop_rows"] > 0


def test_guard_noop_on_duplicate_free_corpus(spark, sf_dir):
    """On the synthetic corpus (no exact dups) the guarded pipeline returns
    exactly the unguarded result — the guard costs one extra no-op
    aggregate, never answers."""
    from read_comp_data_pipeline_spark.sources.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    a = minhash_near_dups(d, threshold=0.4, collapse=True)
    b = minhash_near_dups(d, threshold=0.4, collapse=False)
    got = sorted((r.id_a, r.id_b, round(r.jaccard, 9)) for r in a.collect())
    exp = sorted((r.id_a, r.id_b, round(r.jaccard, 9)) for r in b.collect())
    assert got == exp


def test_connected_components_chain_clique_singleton(spark):
    """Exact components on a planted graph: a 4-chain (diameter forces
    multiple propagation rounds), a triangle, an isolated pair, and
    singletons."""
    from read_comp_data_pipeline_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain: min 1
         (10, 11), (11, 12), (10, 12),  # triangle: min 10
         (20, 21)],                     # pair: min 20
        "id_a int, id_b int",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 30, 31]], "doc_id int"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in
           connected_components(edges, nodes, "doc_id").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20, 30: 30, 31: 31}


def test_connected_components_string_ids_deep_chain(spark):
    """String/UUID-style ids (the common doc-id shape) on a diameter-4
    chain: convergence must be type-agnostic. The old label-sum signal
    cast labels to decimal — CAST_INVALID_INPUT under ANSI, or a silent
    one-round NULL==NULL stop (wrong clusters for any diameter ≥ 2) on
    non-ANSI configs (ADVICE r4)."""
    from read_comp_data_pipeline_spark.operators.dedup import connected_components

    # chain e-d-c-b-a: label 'a' must propagate 4 hops
    edges = spark.createDataFrame(
        [("doc-e", "doc-d"), ("doc-d", "doc-c"), ("doc-c", "doc-b"),
         ("doc-b", "doc-a"), ("zzz-1", "zzz-2")],
        "id_a string, id_b string",
    )
    nodes = spark.createDataFrame(
        [(x,) for x in ["doc-a", "doc-b", "doc-c", "doc-d", "doc-e",
                        "zzz-1", "zzz-2", "lone"]],
        "doc_id string",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in
           connected_components(edges, nodes, "doc_id").collect()}
    assert got == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
                   "doc-d": "doc-a", "doc-e": "doc-a",
                   "zzz-1": "zzz-1", "zzz-2": "zzz-1", "lone": "lone"}


def test_connected_components_on_guarded_star_edges(spark, planted):
    """End-to-end: guarded near-dup edges from the 200-copy planted
    corpus collapse to ONE cluster (keeper 0) covering copies + variants;
    unrelated docs stay singletons. Converges in a handful of rounds on
    the star topology."""
    from read_comp_data_pipeline_spark.operators.dedup import (
        connected_components,
        minhash_near_dups,
    )

    edges = minhash_near_dups(planted, "text", "doc_id", threshold=0.7).select(
        "id_a", "id_b"
    )
    nodes = planted.select("doc_id")
    got = {r["doc_id"]: r["cluster_id"] for r in
           connected_components(edges, nodes, "doc_id").collect()}
    for i in range(N_COPIES + 3):
        assert got[i] == 0, (i, got[i])
    for i in range(40):
        assert got[300 + i] == 300 + i


def test_simhash_bucket_cap_and_observation(spark):
    """Distinct-but-close fingerprints (not collapsible) are bounded by
    the per-block bucket cap with an observable drop count."""
    # 150 docs, one word mutated each → distinct simhashes clustered close
    rows = [(i, _variant(i % 55, f"m{i}")) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    uncapped = simhash_hamming_pairs(df, bits=64, max_hamming=2).count()
    obs = Observation("sh_cap")
    capped = simhash_hamming_pairs(
        df, bits=64, max_hamming=2, bucket_cap=8, observation=obs
    )
    n = capped.count()
    assert n <= uncapped
    assert obs.get["capped_drop_rows"] >= 0  # observable without extra job


def test_embedding_bucket_cap_bounds_pairs(spark):
    """Near-identical (non-equal) vectors land in one plane bucket; the
    cap bounds the self-join and reports drops."""
    base = [float((i * 13) % 17) - 8.0 for i in range(16)]
    rows = []
    for i in range(100):
        v = list(base)
        v[i % 16] += 0.001 * (i + 1)  # tiny distinct perturbations
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    uncapped = embedding_near_dup_lsh(
        emb, threshold=0.0, n_planes=6, dim=16, collapse=False
    ).count()
    assert uncapped == 100 * 99 // 2  # all in one bucket: the blowup

    obs = Observation("emb_cap")
    capped = embedding_near_dup_lsh(
        emb, threshold=0.0, n_planes=6, dim=16, collapse=False,
        bucket_cap=10, observation=obs,
    ).count()
    assert capped == 10 * 9 // 2
    assert obs.get["capped_drop_rows"] == 90


def test_duplicate_ngram_spans_planted(spark):
    """Substring-level dedup: planted shared boilerplate is detected
    span-exactly; unique text contributes zero duplicate spans."""
    from read_comp_data_pipeline_spark.operators.dedup import duplicate_ngram_spans

    boiler = "licensed under the apache license version two zero see notice"  # 10 toks
    uniq1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"  # 10 toks
    uniq2 = "kilo lima mike november oscar papa quebec romeo sierra tango"     # 10 toks
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq1}"),          # 20 toks -> 17 4-gram spans
            (2, f"{boiler} {uniq2}"),          # 20 toks -> 17 spans
            (3, uniq1 + " extra"),             # overlaps doc1's unique tail
            (4, "short text"),                 # < n tokens: excluded
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in duplicate_ngram_spans(docs, n=4).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["n_spans"] == 17 and got[2]["n_spans"] == 17
    # doc1 vs doc2 share the 7 fully-inside-boilerplate grams (boundary
    # grams differ); doc1 vs doc3 share uniq1's 7 internal grams
    assert got[1]["n_dup_spans"] == 7 + 7
    assert got[2]["n_dup_spans"] == 7
    assert got[3]["n_dup_spans"] == 7
    assert abs(got[2]["dup_span_fraction"] - round(7 / 17, 6)) < 1e-9


def test_duplicate_ngram_spans_within_doc_repeat(spark):
    """A span repeated WITHIN one document counts as duplicated (every
    occurrence counts — non-distinct spans)."""
    from read_comp_data_pipeline_spark.operators.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [(1, "a b c d x y z a b c d")],  # "a b c d" occurs twice
        "doc_id int, text string",
    )
    r = duplicate_ngram_spans(docs, n=4).collect()[0]
    assert r["n_spans"] == 8
    assert r["n_dup_spans"] == 2


def test_shingles_short_docs_yield_empty_not_crash(spark):
    """Regression (r5): Catalyst's Generate-inferred filters evaluate the
    shingle transform alongside the size guard, so an unguarded
    sequence(0, size-n) crashed on <n-token docs with slice(start=0)."""
    from read_comp_data_pipeline_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, None),
         (4, "five proper tokens right here")],
        "doc_id int, text string",
    )
    got = shingles(docs, n=5).collect()
    assert {r["id"] for r in got} == {4}
