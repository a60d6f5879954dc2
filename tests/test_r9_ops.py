"""Semantic properties of the r9 operators, beyond oracle hash parity:
vocabulary coverage curve, fertility-by-language, NN-descent refinement,
codebook OOD scoring, and the dup-cluster size histogram."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_vocab_coverage_curve_monotone(spark):
    from map_reduce_lite_spark.ops.text import COVERAGE_KS, vocab_coverage

    rows = {r["k"]: r for r in vocab_coverage(spark, SF_SMALL).collect()}
    assert sorted(rows) == sorted(COVERAGE_KS)
    prev_cov = -1
    total = next(iter(rows.values()))["total_tokens"]
    for k in sorted(rows):
        r = rows[k]
        assert r["total_tokens"] == total  # one corpus total, repeated
        assert r["covered_tokens"] >= prev_cov  # larger vocab covers more
        assert 0 < r["covered_tokens"] <= total
        assert 0 < r["coverage_bps"] <= 10000
        assert r["coverage_bps"] == (10000 * r["covered_tokens"]) // total
        prev_cov = r["covered_tokens"]


def test_fertility_totals_reconcile_with_token_stats(spark):
    """Language strata partition the corpus: per-language token totals must
    sum to the same corpus totals token_stats reports per source."""
    from map_reduce_lite_spark.ops.text import fertility_by_lang, token_stats

    fert = fertility_by_lang(spark, SF_SMALL).collect()
    ts = token_stats(spark, SF_SMALL).collect()
    assert sum(r["total_ws_tokens"] for r in fert) == sum(
        r["total_ws_tokens"] for r in ts
    )
    assert sum(r["total_bpe_tokens"] for r in fert) == sum(
        r["total_bpe_tokens"] for r in ts
    )
    for r in fert:
        # every whitespace word contains ≥1 regex token, so fertility ≥ 1×
        assert r["fertility_bps"] >= 10000, r


def test_nn_descent_never_degrades_the_graph(spark):
    """NN-descent reranks a SUPERSET of each node's current candidates, so
    at every (node, rank) the refined similarity must be ≥ the base
    graph's — the monotone-improvement property of the algorithm."""
    from map_reduce_lite_spark.ops.similarity import (
        similarity_knn_graph,
        similarity_nn_descent,
    )

    base = {
        (r["src_id"], r["rank"]): r["sim_e9"]
        for r in similarity_knn_graph(spark, SF_SMALL).collect()
    }
    refined = {
        (r["src_id"], r["rank"]): r["sim_e9"]
        for r in similarity_nn_descent(spark, SF_SMALL).collect()
    }
    assert base, "empty base graph"
    improved = 0
    for key, base_sim in base.items():
        assert key in refined, f"node lost neighbors: {key}"
        assert refined[key] >= base_sim, key
        improved += refined[key] > base_sim
    # the fixture's band blocking is lossy enough that NoN expansion must
    # actually find something strictly better somewhere
    assert improved > 0


def test_ood_score_one_row_per_vector(spark):
    from map_reduce_lite_spark.ops.similarity import (
        OOD_CODEBOOK_K,
        embedding_ood_score,
    )
    from map_reduce_lite_spark.relational.tables import load_table

    rows = embedding_ood_score(spark, SF_SMALL).collect()
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert len(rows) == n_vecs
    assert len({r["vec_id"] for r in rows}) == n_vecs
    cents = {r["best_centroid"] for r in rows}
    assert len(cents) <= OOD_CODEBOOK_K
    for r in rows:
        assert r["best_centroid"] != r["vec_id"]
        assert r["maxsim_e9"] <= 10**9


def test_cluster_sizes_reconcile_with_components(spark):
    from map_reduce_lite_spark.ops.dedup import (
        dedup_cluster_sizes,
        dedup_components,
    )

    hist = dedup_cluster_sizes(spark, SF_SMALL).collect()
    n_nodes = dedup_components(spark, SF_SMALL).count()
    assert sum(r["n_docs"] for r in hist) == n_nodes
    for r in hist:
        assert r["cluster_size"] >= 2  # components only contain paired nodes
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_hubness_histogram_reconciles_with_graph(spark):
    """Node mass must equal the corpus and edge mass must equal the
    k-NN graph's edge count — including the in-degree-0 (anti-hub) row."""
    from map_reduce_lite_spark.ops.similarity import (
        similarity_graph_hubness,
        similarity_knn_graph,
    )
    from map_reduce_lite_spark.relational.tables import load_table

    hist = similarity_graph_hubness(spark, SF_SMALL).collect()
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    n_edges = similarity_knn_graph(spark, SF_SMALL).count()
    assert sum(r["n_nodes"] for r in hist) == n_vecs
    assert sum(r["in_degree"] * r["n_nodes"] for r in hist) == n_edges
