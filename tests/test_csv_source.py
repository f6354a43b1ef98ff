"""CSV batch source (S4) — reference seeds tables from CSV
(dataframe_to_postgresql.py:62-79, simple_submit.py:31-32)."""

from __future__ import annotations

from changedatacapture_spark.sources.csv import load_csv, write_csv


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "plain", 1.5), (2, 'has,comma and "quote"', -2.0), (3, None, 0.0)],
        "id long, name string, score double",
    )
    path = str(tmp_path / "seed")
    write_csv(df, path)
    back = load_csv(spark, path, schema="id long, name string, score double")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_csv_infer_schema_types(spark, tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("id,name,score\n1,a,1.5\n2,b,2.5\n")
    back = load_csv(spark, str(p))
    types = dict((f.name, f.dataType.simpleString()) for f in back.schema.fields)
    assert types == {"id": "int", "name": "string", "score": "double"}
    assert back.count() == 2


def test_csv_all_strings_without_inference(spark, tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("id,name\n1,a\n")
    back = load_csv(spark, str(p), infer_schema=False)
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "string",
        "string",
    ]
