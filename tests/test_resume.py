"""Idempotent-resume semantics (FIXTURES.md §5 resume row; reference D3
skip-existing checks, extract_paragraphs_faster.py:20-26)."""

import pytest

from kgp.io import TableIO
from kgp.pipeline import run_pipeline
from kgp.pipeline.run import InjectedFailure


def test_kill_and_rerun_identical_and_no_recompute(spark, tiny_spark_inputs, tmp_path):
    t, v = tiny_spark_inputs
    out = str(tmp_path / "wh")

    # full clean run → record snapshot ids
    res1 = run_pipeline(spark, t, v, out, "resume:v1")
    io = TableIO(out)
    snaps1 = {n: io.manifest(n)["snapshot_id"] for n in
              ("ordered", "extracted", "entity_map", "triples", "nodes", "edges")}

    # fresh warehouse, crash after S2 commit
    out2 = str(tmp_path / "wh2")
    with pytest.raises(InjectedFailure):
        run_pipeline(spark, t, v, out2, "resume:v1", fail_after="extracted")
    io2 = TableIO(out2)
    assert io2.is_committed("ordered") and io2.is_committed("extracted")
    assert not io2.is_committed("triples")

    # rerun: committed stages are NOT recomputed; outputs content-identical
    res2 = run_pipeline(spark, t, v, out2, "resume:v1")
    assert "ordered" not in res2["recomputed"]
    assert "extracted" not in res2["recomputed"]
    snaps2 = {n: io2.manifest(n)["snapshot_id"] for n in snaps1}
    assert snaps1 == snaps2  # content-addressed snapshots identical


def test_fingerprint_mismatch_forces_recompute(spark, tiny_spark_inputs, tmp_path):
    t, v = tiny_spark_inputs
    out = str(tmp_path / "wh")
    run_pipeline(spark, t, v, out, "fp:v1")
    res = run_pipeline(spark, t, v, out, "fp:v2")  # new input fingerprint
    assert set(res["recomputed"]) == {"ordered", "extracted", "entity_map", "triples", "nodes", "edges"}


def test_tableio_snapshot_content_addressed(spark, tmp_path):
    import pandas as pd

    io = TableIO(str(tmp_path / "t"))
    pdf = pd.DataFrame({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    m1 = io.write(spark.createDataFrame(pdf), "tbl")
    # same content, different row order / partitioning → same snapshot_id
    m2 = io.write(spark.createDataFrame(pdf.iloc[::-1]).repartition(3), "tbl")
    assert m1["snapshot_id"] == m2["snapshot_id"]
    m3 = io.write(spark.createDataFrame(pdf.assign(a=[3, 1, 99])), "tbl")
    assert m3["snapshot_id"] != m1["snapshot_id"]


def test_tableio_read_requires_commit(spark, tmp_path):
    io = TableIO(str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        io.read(spark, "nope")
