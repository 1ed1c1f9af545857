"""Source readers: JSON round-trip, flat-CSV lift, synthetic generator."""

from pprl_spark.config import EmbedderConfig
from pprl_spark.operators.embedding import normalize_documents
from pprl_spark.sources.synthetic import synthesize_documents
from pprl_spark.sources.tables import (
    lift_flat_records,
    read_documents,
    write_documents,
)


def test_json_roundtrip(spark, tmp_path):
    docs = synthesize_documents(spark, 20, "A")
    path = str(tmp_path / "docs_json")
    write_documents(docs.select("doc_id", "spans"), path, fmt="json")
    back = read_documents(spark, path, fmt="json")
    a = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
         for r in docs.select("doc_id", "spans").collect()}
    b = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
         for r in back.collect()}
    assert a == b


def test_lift_flat_records(spark):
    flat = spark.createDataFrame(
        [("r1", "dave", "wilson", None), ("r2", "sally", "smith", "f")],
        "rec_id string, given_name string, surname string, sex string",
    )
    docs = lift_flat_records(flat, "rec_id", ["given_name", "surname", "sex"])
    cfg = EmbedderConfig(
        colspec={"given_name": "name", "surname": "name", "sex": "sex"}
    )
    norm = {r["doc_id"]: r for r in normalize_documents(docs, cfg).collect()}
    assert norm["r1"]["given_name"] == "dave"
    assert norm["r1"]["sex"] == ""  # null lifted to empty payload
    assert norm["r2"]["sex"] == "f"
    spans = norm["r1"]["spans"]
    assert [s["offset"] for s in sorted(spans, key=lambda s: s["offset"])] == [0, 1, 2]
