"""Multimodal plumbing: binary columns through Arrow batches, stub decode
metadata, and the embed→ANN retrieval path."""

from remine_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.01"


def test_decode_meta_schema_and_determinism(spark):
    a = {r.doc_id: (r.n_bytes, r.width, r.height) for r in
         mm.mm_decode_meta(spark, SF).collect()}
    b = {r.doc_id: (r.n_bytes, r.width, r.height) for r in
         mm.mm_decode_meta(spark, SF).collect()}
    assert a == b and len(a) == 500
    assert all(256 <= w < 512 for (_n, w, _h) in a.values())


def test_real_decoder_is_gated(spark):
    import pytest
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\x89PNG fake")


def test_embed_neighbors_end_to_end(spark):
    rows = mm.mm_embed_neighbors(spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, lst in by_q.items():
        assert len(lst) == 3
        cs = [r.cos for r in sorted(lst, key=lambda r: r.rnk)]
        assert cs == sorted(cs, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cs)
