"""connected_components (large-star/small-star) vs a python union-find.

Shapes chosen to break naive implementations: a long PATH (diameter =
n — label propagation would need n rounds; large/small-star must converge
in O(log²)), a high-degree HUB (adjacency must never be collected into an
array), and multiple components with singletons.
"""

import random

from pyspark.sql import functions as F

from image_search_indexing_spark.operators.dedup import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min reachable id
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def _check(spark, n_nodes, edges, max_iter=30):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.range(n_nodes).select(F.col("id").alias("vec_id"))
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, nodes=nodes, node_col="vec_id", max_iter=max_iter
        ).collect()
    }
    assert got == _union_find(n_nodes, edges)


def test_path_graph_converges_fast(spark):
    """A 64-node path: diameter 63, but star alternation needs ≲ log² rounds
    (max_iter=12 would fail a diameter-bound algorithm)."""
    edges = [(i, i + 1) for i in range(63)]
    _check(spark, 70, edges, max_iter=12)  # 64..69 are singletons


def test_hub_and_multi_components(spark):
    edges = [(0, i) for i in range(1, 40)]  # hub at 0
    edges += [(50, 51), (51, 52), (52, 50)]  # triangle
    edges += [(60, 61)]
    _check(spark, 65, edges)


def test_random_graph_matches_union_find(spark):
    rnd = random.Random(7)
    n = 120
    edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, n, edges)


def test_empty_pairs_all_singletons(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.range(5).select(F.col("id").alias("vec_id"))
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs, nodes=nodes, node_col="vec_id").collect()
    }
    assert got == {i: i for i in range(5)}


def test_minhash_pairs_equal_bucket_pairs(spark):
    """The skew-safe pair-emitting LSH must induce exactly the
    COLLAPSED view of the pairs the bucket-listing variant describes:
    exact-text duplicates appear as star edges to the group-min
    representative, representatives pair via the band buckets — and the
    connected components of the two graphs are identical."""
    import hashlib
    from itertools import combinations

    from image_search_indexing_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_lsh_buckets,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # seed exact-text duplicates (sf0.001 has none) so the collapse path
    # is genuinely exercised: every 25th doc gets a re-keyed identical copy
    import pyspark.sql.functions as F

    dups = base.where(F.col("doc_id") % 25 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    docs = base.unionByName(dups)
    got = {
        (r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(docs).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    by_text = {}
    for d, t in texts.items():
        by_text.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(d)
    rep = {d: min(mem) for mem in by_text.values() for d in mem}
    stars = {(rep[d], d) for d in texts if rep[d] != d}
    bucket_pairs = set()
    for r in minhash_lsh_buckets(docs).collect():
        bucket_pairs |= set(combinations(sorted(r["doc_ids"]), 2))
    want = stars | {
        (a, b) for a, b in bucket_pairs if rep[a] == a and rep[b] == b
    }
    assert got == want and len(got) > 0 and stars  # corpus HAS exact dups

    # connectivity equivalence: components over the un-collapsed bucket
    # graph == components over the collapsed graph
    def components(pairs):
        parent = {d: d for d in texts}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {d: find(d) for d in texts}

    assert components(bucket_pairs | stars) == components(got)


def test_text_dup_groups_shape(spark):
    """Groups are well-formed: every doc assigned, group_id is the min
    member, and grouped docs really verify above the Jaccard threshold."""
    from image_search_indexing_spark.operators.dedup import text_dup_groups

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = text_dup_groups(docs, threshold=0.5).collect()
    assert len(out) == docs.count()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], []).append(r["doc_id"])
    assert all(g == min(members) for g, members in by_group.items())
    multi = [m for m in by_group.values() if len(m) > 1]
    assert multi  # corpus has near-dups at threshold 0.5


def test_simhash_pairs_equal_bucket_pairs(spark):
    """Pair-emitting SimHash == the COLLAPSED view of the bucket-listing
    pairs (same 60-bit md5 construction): identical-SimHash docs appear
    as star edges to the group-min representative, representatives pair
    via the prefix bucket; components are unchanged; the hamming gate
    filters monotonically (star edges are hamming 0, never gated)."""
    from itertools import combinations

    from image_search_indexing_spark.operators.dedup import (
        simhash_buckets_md5,
        simhash_candidate_pairs,
        simhash_frame,
    )

    import pyspark.sql.functions as F

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # seed exact-text duplicates (identical SimHash by construction) so
    # the identical-hash collapse path is exercised
    docs = base.unionByName(
        base.where(F.col("doc_id") % 25 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
    )
    ungated = {
        (r["id_a"], r["id_b"])
        for r in simhash_candidate_pairs(docs, max_hamming=None).collect()
    }
    sims = {r["doc_id"]: r["simhash"] for r in simhash_frame(docs).collect()}
    by_sim = {}
    for d, s in sims.items():
        by_sim.setdefault(s, []).append(d)
    rep = {d: min(mem) for mem in by_sim.values() for d in mem}
    stars = {(rep[d], d) for d in sims if rep[d] != d}
    bucket_pairs = set()
    for r in simhash_buckets_md5(docs).collect():
        bucket_pairs |= set(combinations(sorted(r["doc_ids"]), 2))
    want = stars | {
        (a, b) for a, b in bucket_pairs if rep[a] == a and rep[b] == b
    }
    assert ungated == want and len(ungated) > 0 and stars

    gated = simhash_candidate_pairs(docs, max_hamming=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in gated} <= ungated
    assert all(r["hamming"] <= 10 for r in gated)
    assert stars <= {(r["id_a"], r["id_b"]) for r in gated}  # hamming-0 edges survive


def test_connected_components_rejects_string_ids(spark):
    """String node ids would cast to NULL and collapse components; the
    operator must refuse them loudly."""
    import pytest

    from image_search_indexing_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(TypeError, match="integral"):
        connected_components(pairs)


def test_hash_sample_deterministic_and_partition_invariant(spark):
    """Sampling is a pure pushed-down filter: membership is identical at
    any partitioning (unlike df.sample's partition-seeded RNG), rates are
    honored within binomial noise, salts draw independent samples, and
    the plan contains no Exchange."""
    from image_search_indexing_spark.operators.sampling import hash_sample

    docs = spark.range(20_000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="a").collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs.repartition(13), 0.3, salt="a").collect()}
    assert s1 == s2
    assert abs(len(s1) / 20_000 - 0.3) < 0.02
    other = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="b").collect()}
    assert other != s1
    assert abs(len(s1 & other) / 20_000 - 0.09) < 0.02  # independent draws
    assert hash_sample(docs, 1.0).count() == 20_000
    assert hash_sample(docs, 0.0).count() == 0
    plan = hash_sample(docs, 0.3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_rates(spark):
    """Per-stratum thresholds: each language keeps ~its own rate, and the
    union equals per-stratum hash_sample membership (same key+salt)."""
    from image_search_indexing_spark.operators.sampling import hash_sample, stratified_sample

    docs = spark.range(30_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("pt"), F.lit("zh")), (F.col("id") % 3 + 1).cast("int")
        ).alias("lang"),
    )
    out = stratified_sample(docs, "lang", {"en": 0.6, "pt": 0.2}, default_rate=0.05, salt="q")
    got = out.groupBy("lang").count().collect()
    rates = {r["lang"]: r["count"] / 10_000 for r in got}
    assert abs(rates["en"] - 0.6) < 0.03
    assert abs(rates["pt"] - 0.2) < 0.03
    assert abs(rates.get("zh", 0.0) - 0.05) < 0.02
    # equivalence with per-stratum hash_sample (same selector)
    en_only = {r["doc_id"] for r in hash_sample(
        docs.where(F.col("lang") == "en"), 0.6, salt="q").collect()}
    assert {r["doc_id"] for r in out.where(F.col("lang") == "en").collect()} == en_only


def test_simhash_xx_frame_equals_hof(spark):
    """The PRODUCTION xxhash64 simhash_frame (explode + codegen agg,
    bits=63) must equal the interpreted per-row HOF fold simhash64
    bit-for-bit — same tokens, same hash, same sign-sum tie rule."""
    from image_search_indexing_spark.operators.dedup import simhash64, simhash_frame

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    frame = {
        r["doc_id"]: r["simhash"]
        for r in simhash_frame(docs, bits=63, token_hash="xxhash64").collect()
    }
    hof = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", simhash64(F.col("text")).alias("sh")).collect()
    }
    assert frame == hof and len(frame) > 0


def test_simhash_pair_contract_md5_vs_xx(spark):
    """The xxhash64 production pair variant honors the SAME contract the
    md5 twin proved against the oracle: id_a < id_b, hamming == exact
    bit_count(sim_a XOR sim_b), gate filters monotonically — and both
    variants recover seeded near-identical documents."""
    from image_search_indexing_spark.operators.dedup import (
        simhash_candidate_pairs,
        simhash_frame,
    )

    base = [
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while morning light settles across the quiet valley floor",
        "stock markets rallied sharply today as investors digested the "
        "central bank announcement about interest rate policy changes",
        "researchers published a detailed study on coral reef recovery "
        "patterns following repeated marine heatwave events this decade",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((10 * i, t))
        rows.append((10 * i + 1, t + " extra"))  # near-dup of each base doc
    # unrelated filler
    for j in range(40):
        rows.append((1000 + j, f"totally unrelated filler number {j} with words "
                               f"alpha{j} beta{j} gamma{j} delta{j} epsilon{j}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from itertools import combinations

    for kw, bits in ((dict(token_hash="md5", bits=60), 60),
                     (dict(token_hash="xxhash64", bits=63), 63)):
        sims = {r["doc_id"]: r["simhash"]
                for r in simhash_frame(docs, **kw).collect()}
        pairs = simhash_candidate_pairs(docs, max_hamming=None, **kw).collect()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        assert all(a < b for a, b in got)
        for (a, b), ham in got.items():
            assert ham == bin(sims[a] ^ sims[b]).count("1")
        # complete characterization: emitted pairs are EXACTLY the
        # same-prefix-bucket pairs, under both hashes
        buckets = {}
        for d, s in sims.items():
            buckets.setdefault(s >> (bits - 16), []).append(d)
        expected = {p for ids in buckets.values()
                    for p in combinations(sorted(ids), 2)}
        assert set(got) == expected, kw
        # SimHash property: seeded near-identical docs have tiny
        # hamming distance under BOTH hashes (recall through a single
        # prefix band is probabilistic — checked on sims, not pairs)
        for i in range(len(base)):
            a, b = 10 * i, 10 * i + 1
            assert bin(sims[a] ^ sims[b]).count("1") <= 8, (kw, a, b)
        gated = simhash_candidate_pairs(docs, max_hamming=6, **kw).collect()
        gset = {(r["id_a"], r["id_b"]) for r in gated}
        assert gset <= set(got) and all(r["hamming"] <= 6 for r in gated)


def test_group_split_leakage_safe(spark):
    """group_split assigns by GROUP, not row: every member of a group
    gets the same side (the leakage guarantee), buckets are the exact
    xxhash64 pmod (deterministic, partition-invariant), val fraction
    tracks val_pct over many groups, and the projection adds no
    Exchange beyond what produced the groups."""
    from image_search_indexing_spark.operators.sampling import group_split

    rows = [(i, i % 500) for i in range(5_000)]  # 500 groups of 10
    groups = spark.createDataFrame(rows, "doc_id long, group_id long")
    out = group_split(groups, "group_id", val_pct=10).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # group-atomic
    val_groups = sum(1 for g in by_group.values() if g == {"val"})
    assert 25 <= val_groups <= 85, val_groups  # ~10% of 500 groups
    # deterministic + partition-invariant
    out2 = group_split(
        spark.createDataFrame(rows, "doc_id long, group_id long").repartition(17),
        "group_id", val_pct=10,
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in out} == {
        (r["doc_id"], r["split"]) for r in out2
    }
    # bucket is the exact Spark xxhash64 pmod
    expect = {
        r["group_id"]: r["b"]
        for r in groups.select(
            "group_id",
            F.pmod(
                F.xxhash64(F.concat(F.lit("split|"), F.col("group_id").cast("string"))),
                F.lit(100),
            ).cast("int").alias("b"),
        ).collect()
    }
    assert all(r["bucket"] == expect[r["group_id"]] for r in out)
    plan = (
        group_split(groups, "group_id")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
