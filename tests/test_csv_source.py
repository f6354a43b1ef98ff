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


def test_csv_default_scan_is_splittable(spark, tmp_path):
    """Default load (multiline off) must split one big file into many
    input partitions; multiLine parsing forces whole-file tasks."""
    p = tmp_path / "big.csv"
    with open(p, "w") as f:
        f.write("id,val\n")
        for i in range(20000):
            f.write(f"{i},{i * 2}\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try:
        schema = "id long, val long"
        n_default = load_csv(spark, str(p), schema=schema).rdd.getNumPartitions()
        n_multi = load_csv(
            spark, str(p), schema=schema, multiline=True
        ).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert n_default > 1
    assert n_multi == 1


def test_csv_multiline_optin_parses_embedded_newlines(spark, tmp_path):
    p = tmp_path / "ml.csv"
    p.write_text('id,name\n1,"line one\nline two"\n')
    back = load_csv(spark, str(p), schema="id long, name string", multiline=True)
    rows = back.collect()
    assert len(rows) == 1
    assert rows[0].name == "line one\nline two"


def test_orc_round_trip(spark, tmp_path):
    from changedatacapture_spark.sources.formats import load_orc, write_orc

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    write_orc(df, str(tmp_path / "orc"))
    back = load_orc(spark, str(tmp_path / "orc"), schema="id long, name string")
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_orc_filter_pushdown(spark, tmp_path):
    from changedatacapture_spark.plans.inspect import executed_plan
    from changedatacapture_spark.sources.formats import load_orc, write_orc
    from pyspark.sql import functions as F

    df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    write_orc(df, str(tmp_path / "orc"))
    out = load_orc(spark, str(tmp_path / "orc")).filter(F.col("id") > 990)
    out.collect()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,990)" in executed_plan(out)


def test_jsonl_round_trip_and_corrupt_line(spark, tmp_path):
    import os

    from changedatacapture_spark.sources.formats import load_jsonl, write_jsonl

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    write_jsonl(df, str(tmp_path / "j"))
    back = load_jsonl(spark, str(tmp_path / "j"), schema="id long, name string")
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]
    # corrupt line lands as nulls under PERMISSIVE, not an exception
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(f"{bad}/x.jsonl", "w") as f:
        f.write('{"id": 3, "name": "c"}\n{oops\n')
    got = load_jsonl(spark, bad, schema="id long, name string").collect()
    assert len(got) == 2 and {r.id for r in got} == {3, None}
