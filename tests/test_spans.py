"""Interleaved-span packing and composition operators."""

import pytest

SCHEMA = (
    "doc_id long, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _doc(doc_id, spans):
    return (doc_id, [tuple(s) for s in spans])


def test_chunk_spans_greedy_golden(spark):
    from pprl_spark.operators.spans import chunk_spans

    # costs: text 8, text 8, image 16, text 8, text 1, image 16 @ B=24
    # greedy: [0,0] [1,1] (16+8=24 fits) [2,2] (1+16=17 fits)
    rows = [
        _doc(
            1,
            [
                ("text", "a b c d e f g h", None, 0),
                ("text", "i j k l m n o p", None, 2),
                ("image", None, "img://1/1", 3),
                ("text", "q r s t u v w x", None, 4),
                ("text", "y", None, 6),
                ("image", None, "img://1/3", 7),
            ],
        )
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r.offset, r.kind, r.cost, r.chunk_id)
        for r in chunk_spans(df, budget=24, media_cost=16).collect()
    )
    assert got == [
        (0, "text", 8, 0),
        (2, "text", 8, 0),
        (3, "image", 16, 1),
        (4, "text", 8, 1),
        (6, "text", 1, 2),
        (7, "image", 16, 2),
    ]


def test_chunk_spans_sorts_by_offset_and_handles_oversize(spark):
    from pprl_spark.operators.spans import chunk_spans

    # spans arrive offset-shuffled; the 40-cost video span exceeds the
    # budget alone and must occupy (and overflow) one chunk by itself
    rows = [
        _doc(
            7,
            [
                ("video", None, "vid://7", 1),
                ("text", "one two three", None, 0),
                ("text", "four five", None, 2),
            ],
        )
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r.offset, r.cost, r.chunk_id)
        for r in chunk_spans(df, budget=10, media_cost=40).collect()
    )
    # text(3) -> chunk 0; video(40) > 10 -> its own chunk 1; text(2) -> 2
    assert got == [(0, 3, 0), (1, 40, 1), (2, 2, 2)]


def test_chunk_spans_validation(spark):
    from pprl_spark.operators.spans import chunk_spans

    df = spark.createDataFrame([_doc(1, [("text", "a", None, 0)])], SCHEMA)
    with pytest.raises(ValueError):
        chunk_spans(df, budget=0)
    with pytest.raises(ValueError):
        chunk_spans(df, media_cost=-1)


def test_modality_profile_golden(spark):
    from pprl_spark.operators.spans import modality_profile

    rows = [
        _doc(
            1,
            [
                ("text", "a b c", None, 0),
                ("image", None, "i1", 1),
                ("audio", None, "a1", 2),
                ("image", None, "i2", 3),
                ("text", "d e", None, 4),
            ],
        ),
        _doc(2, [("text", "only text here", None, 0)]),
        _doc(3, []),  # zero spans -> excluded
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.doc_id: r for r in modality_profile(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1.n_spans, r1.n_text_spans, r1.n_media_spans) == (5, 2, 3)
    assert r1.n_text_tokens == 5
    assert r1.media_kinds == "audio,image"
    assert r1.text_span_share == 2.0 / 5.0
    r2 = got[2]
    assert (r2.n_spans, r2.n_media_spans, r2.media_kinds) == (1, 0, "")
    assert r2.text_span_share == 1.0


def test_chunk_spans_partitioning_independent(spark):
    import random

    from pprl_spark.operators.spans import chunk_spans

    rng = random.Random(19)
    rows = []
    for d in range(40):
        spans = []
        for i in range(rng.randrange(1, 12)):
            if rng.random() < 0.3:
                spans.append(("image", None, f"img://{d}/{i}", i))
            else:
                spans.append(
                    ("text", " ".join("w" * 1 for _ in range(rng.randrange(1, 9))), None, i)
                )
        rows.append(_doc(d, spans))
    df = spark.createDataFrame(rows, SCHEMA)
    one = sorted(
        tuple(r) for r in chunk_spans(df.repartition(1), budget=12).collect()
    )
    many = sorted(
        tuple(r) for r in chunk_spans(df.repartition(7), budget=12).collect()
    )
    assert one == many


def test_media_ref_audit_golden(spark):
    from pprl_spark.operators.spans import media_ref_audit

    docs = spark.createDataFrame(
        [
            _doc(
                1,
                [
                    ("text", "hello", None, 0),
                    ("image", None, "m1", 1),
                    ("image", None, "m2", 2),
                    ("image", None, "missing", 3),
                ],
            ),
            _doc(2, [("image", None, "m3", 0), ("audio", None, "m1", 1)]),
            _doc(3, [("text", "no media at all", None, 0)]),
        ],
        SCHEMA,
    )
    # m1 and m3 share a payload (re-upload); m2 unique; "missing" orphan
    media = spark.createDataFrame(
        [("m1", "hashA"), ("m2", "hashB"), ("m3", "hashA")],
        "media_ref string, payload_hash string",
    )
    got = {r.doc_id: r for r in media_ref_audit(docs, media).collect()}
    assert set(got) == {1, 2}  # doc 3 has no media spans
    assert (got[1].n_media_refs, got[1].n_orphan_refs, got[1].n_shared_refs) == (3, 1, 1)
    assert (got[2].n_media_refs, got[2].n_orphan_refs, got[2].n_shared_refs) == (2, 0, 2)


def test_span_operators_plan_shapes(spark):
    """chunk_spans / modality_profile are pure scans (the packing fold
    and composition report add NO Exchange of their own); the review
    sampler's per-bin top-k rides WindowGroupLimit (k-row buffers
    map-side, no full sort of the pair table)."""
    from pprl_spark.operators.sampling import pair_review_sample
    from pprl_spark.operators.spans import chunk_spans, modality_profile

    docs = spark.createDataFrame(
        [_doc(1, [("text", "a b", None, 0), ("image", None, "m", 1)])], SCHEMA
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "Exchange" not in plan(modality_profile(docs))
    assert "Exchange" not in plan(chunk_spans(docs, budget=8))
    pairs = spark.createDataFrame(
        [(1, 2, 0.5), (3, 4, 0.9)], "id1 long, id2 long, sim double"
    )
    assert "WindowGroupLimit" in plan(pair_review_sample(pairs, k_per_bin=2))
