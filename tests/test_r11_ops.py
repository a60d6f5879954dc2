"""r11 additions: reliable-checkpoint threading for every remaining
SF-proportional materialization (the test_knn_edges_reliable_checkpoint
pattern, one per family), and adaptive re-banding unit coverage beyond
the mega-bucket corpora in test_capcorpus.py.

Each checkpoint test proves the SAME VALUES come back with
``checkpoint_dir`` set (reliable checkpoint(), survives executor loss
on a real cluster) as with the default executor-local localCheckpoint,
and that the directory was actually written — a silent fallback to
local storage would pass the value check but fail the rglob."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _ckdir(tmp_path):
    d = tmp_path / "ck"
    d.mkdir()
    return d


def _assert_reliable(ckdir, plain_rows, ck_rows):
    assert plain_rows == ck_rows
    assert any(ckdir.rglob("*")), "reliable checkpoint dir must be written"


def test_minhash_pairs_reliable_checkpoint(spark, tmp_path):
    from map_reduce_lite_spark.ops.dedup import minhash_lsh_pairs
    from map_reduce_lite_spark.relational.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    ckdir = _ckdir(tmp_path)
    plain = {tuple(r) for r in minhash_lsh_pairs(docs).collect()}
    ck = {
        tuple(r)
        for r in minhash_lsh_pairs(docs, checkpoint_dir=str(ckdir)).collect()
    }
    _assert_reliable(ckdir, plain, ck)


def test_simhash_pairs_reliable_checkpoint(spark, tmp_path):
    from map_reduce_lite_spark.ops.dedup import simhash_pairs
    from map_reduce_lite_spark.relational.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    ckdir = _ckdir(tmp_path)
    plain = {tuple(r) for r in simhash_pairs(docs).collect()}
    ck = {
        tuple(r) for r in simhash_pairs(docs, checkpoint_dir=str(ckdir)).collect()
    }
    _assert_reliable(ckdir, plain, ck)


def test_leakage_split_reliable_checkpoint(spark, tmp_path):
    from map_reduce_lite_spark.ops.curation import leakage_safe_split

    ckdir = _ckdir(tmp_path)
    plain = {tuple(r) for r in leakage_safe_split(spark, SF_SMALL).collect()}
    ck = {
        tuple(r)
        for r in leakage_safe_split(
            spark, SF_SMALL, checkpoint_dir=str(ckdir)
        ).collect()
    }
    _assert_reliable(ckdir, plain, ck)


def test_triangles_reliable_checkpoint(spark, tmp_path):
    from map_reduce_lite_spark.ops.graph import triangle_parts

    ckdir = _ckdir(tmp_path)
    plain = {tuple(r) for r in triangle_parts(spark, SF_SMALL).collect()}
    ck = {
        tuple(r)
        for r in triangle_parts(
            spark, SF_SMALL, checkpoint_dir=str(ckdir)
        ).collect()
    }
    _assert_reliable(ckdir, plain, ck)


def test_label_propagation_reliable_checkpoint(spark, tmp_path):
    from map_reduce_lite_spark.ops.graph import label_propagation_parts

    ckdir = _ckdir(tmp_path)
    plain = {
        tuple(r) for r in label_propagation_parts(spark, SF_SMALL).collect()
    }
    ck = {
        tuple(r)
        for r in label_propagation_parts(
            spark, SF_SMALL, checkpoint_dir=str(ckdir)
        ).collect()
    }
    _assert_reliable(ckdir, plain, ck)


def test_kcore_reliable_checkpoint(spark, tmp_path):
    from map_reduce_lite_spark.ops.graph import kcore_parts

    ckdir = _ckdir(tmp_path)
    plain = {tuple(r) for r in kcore_parts(spark, SF_SMALL).collect()}
    ck = {
        tuple(r)
        for r in kcore_parts(spark, SF_SMALL, checkpoint_dir=str(ckdir)).collect()
    }
    _assert_reliable(ckdir, plain, ck)


def test_lsh_refine_matches_lsh_when_dormant(spark):
    """When no band bucket exceeds the cap (the driver fixtures), the
    three lsh variants are the identical plain band join — the refined
    method must be value-identical to method="lsh"."""
    from map_reduce_lite_spark.ops.dedup import embedding_near_dup_pairs
    from map_reduce_lite_spark.ops.similarity import EMB_DIM
    from map_reduce_lite_spark.relational.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    lsh = {
        tuple(r)
        for r in embedding_near_dup_pairs(emb, method="lsh", dim=EMB_DIM).collect()
    }
    refined = {
        tuple(r)
        for r in embedding_near_dup_pairs(
            emb, method="lsh_refine", dim=EMB_DIM
        ).collect()
    }
    assert lsh == refined and len(lsh) > 0
