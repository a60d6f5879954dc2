"""r12 additions: the REAL perceptual hash (multimodal_ppm_phash —
decode → canonical 8×8 NN resample → average-hash → group), plus the
corpus-snapshot builder facade (build_snapshot) unifying the three
staged build-once artifacts.

The phash tests pin the property the query exists for: value-identical
scenes ENCODED DIFFERENTLY (four resolutions per scene) collide on the
64-bit fingerprint, malformed payloads are flagged rows (never
exceptions), and the bit packing matches an independent by-hand replay
of the strict-mean threshold."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMALL


def _p6(w: int, h: int, px: np.ndarray) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _scene_payload(grp: int, s: int, grid: int = 8) -> bytes:
    """Replica of synthesize_ppm_variants' encoding rule for one member."""
    w, h = grid * (s + 1), grid * (s + 2)
    ys = (np.arange(h) * grid) // h
    xs = (np.arange(w) * grid) // w
    j = ys[:, None] * grid + xs[None, :]
    px = (grp * 31 + j[:, :, None] * 7 + np.arange(3)[None, None, :] * 11) % 256
    return _p6(w, h, px)


def test_ppm_phash_reencodings_collide(spark):
    """Four encodings of one scene at four resolutions → ONE hash
    group; a different scene does not join it."""
    from map_reduce_lite_spark.ops.multimodal import phash_ppm

    rows = [(s, _scene_payload(7, s)) for s in range(4)]
    rows += [(10 + s, _scene_payload(8, s)) for s in range(4)]
    out = phash_ppm(_media_df(spark, rows)).collect()
    assert all(r.ok for r in out)
    hashes = {(r.phash_hi, r.phash_lo) for r in out if r.media_id < 4}
    other = {(r.phash_hi, r.phash_lo) for r in out if r.media_id >= 10}
    assert len(hashes) == 1, "re-encodings of one scene must collide"
    assert len(other) == 1
    assert hashes != other, "distinct scenes must not share this hash"


def test_ppm_phash_matches_by_hand_bit_packing(spark):
    """Independent replay: decode the raster in the test, NN-resample
    to 8×8, strict-mean threshold, little-endian pack — must equal the
    engine's two halves bit for bit."""
    from map_reduce_lite_spark.ops.multimodal import phash_ppm

    rng = np.random.RandomState(42)
    w, h = 21, 13  # NOT multiples of 8: exercises the general NN map
    px = rng.randint(0, 256, size=(h, w, 3))
    [row] = phash_ppm(_media_df(spark, [(1, _p6(w, h, px))])).collect()
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    lumas = px[ys][:, xs].sum(axis=2).ravel().astype(np.int64)
    bits = (lumas * 64) > lumas.sum()
    lo = int((bits[:32] << np.arange(32)).sum())
    hi = int((bits[32:] << np.arange(32)).sum())
    assert row.ok and (row.phash_hi, row.phash_lo) == (hi, lo)


def test_ppm_phash_malformed_flagged_not_thrown(spark):
    """Truncated magic, short raster, NULL payload, and a tiny
    (sub-grid, canonicalized by index repetition) image all produce
    rows — malformed ones flagged with NULL halves."""
    from map_reduce_lite_spark.ops.multimodal import phash_ppm

    tiny = _p6(2, 2, np.arange(12).reshape(2, 2, 3))
    rows = [
        (1, b"P6"),
        (2, _p6(4, 4, np.zeros((4, 4, 3)))[:-5]),
        (3, None),
        (4, tiny),
    ]
    out = {r.media_id: r for r in phash_ppm(_media_df(spark, rows)).collect()}
    assert len(out) == 4
    assert not out[1].ok and out[1].phash_hi is None
    assert not out[2].ok
    assert not out[3].ok
    assert out[4].ok and out[4].phash_hi is not None


def test_ppm_phash_16bit_raster(spark):
    """maxval > 255 → big-endian u16 samples, same hash pipeline."""
    from map_reduce_lite_spark.ops.multimodal import phash_ppm

    w = h = 8
    vals = (np.arange(w * h * 3, dtype=np.int64) * 257) % 65536
    payload = b"P6\n8 8\n65535\n" + vals.astype(">u2").tobytes()
    [row] = phash_ppm(_media_df(spark, [(1, payload)])).collect()
    lumas = vals.reshape(h, w, 3).sum(axis=2).ravel()
    bits = (lumas * 64) > lumas.sum()
    lo = int((bits[:32] << np.arange(32)).sum())
    hi = int((bits[32:] << np.arange(32)).sum())
    assert row.ok and (row.phash_hi, row.phash_lo) == (hi, lo)


def test_ppm_phash_registered_query_groups_and_flags(spark):
    """The registered query over the real corpus: every non-corrupt
    scene-group collides into one row (n_copies ≥ members), corrupt
    payloads surface as flagged singletons with NULL halves."""
    import __spark_entry__ as e
    from map_reduce_lite_spark.ops.multimodal import PPM_CORRUPT_EVERY

    rows = e.queries()["multimodal_ppm_phash"](spark, SF_SMALL).collect()
    flagged = [r for r in rows if r.phash_hi is None]
    grouped = [r for r in rows if r.phash_hi is not None]
    assert flagged and all(r.n_copies == 1 for r in flagged)
    assert all(r.keep_media_id % PPM_CORRUPT_EVERY == 0 for r in flagged)
    assert any(r.n_copies >= 2 for r in grouped), "planted dups must group"


# --------------------------------------------------------------------------
# r12: star-only coverage metric (the ADVICE visibility fix)
# --------------------------------------------------------------------------


def test_refine_star_only_probe_clean_is_empty(spark):
    """Driver-fixture regime: no bucket oversized → the sizing probe
    short-circuits to an empty frame (metric provably zero)."""
    from map_reduce_lite_spark.ops.dedup import refine_star_only_ids
    from map_reduce_lite_spark.ops.similarity import EMB_DIM
    from map_reduce_lite_spark.relational.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    assert refine_star_only_ids(emb, dim=EMB_DIM).count() == 0


def test_refine_star_only_prebuilt_bands_parity(spark):
    """Passing a pre-materialized band table (the leakage_safe_split
    sharing path) must give the same ids as building inline."""
    from map_reduce_lite_spark.ops.dedup import (
        lsh_band_table,
        refine_star_only_ids,
    )
    from map_reduce_lite_spark.ops.similarity import EMB_DIM
    from map_reduce_lite_spark.relational.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    # tiny cap so the machinery engages on the fixture corpus
    inline = {
        r.vec_id for r in refine_star_only_ids(emb, dim=EMB_DIM, cap=2).collect()
    }
    bands = lsh_band_table(emb, dim=EMB_DIM)
    shared = {
        r.vec_id
        for r in refine_star_only_ids(
            emb, dim=EMB_DIM, cap=2, bands=bands
        ).collect()
    }
    assert inline == shared
