"""End-to-end RFC stage pipeline (docs/rfc.md:148-152): source files →
documents → statements → merged entities as three file-coupled
availableNow streams. Asserts stream == batch equivalence, exactly-once
re-drain, and incremental processing of newly dropped files."""

from __future__ import annotations

import os


def _batch_entities(spark, source, dataset, tmp_path):
    """The batch-pipeline answer: crawl → project → explode → aggregate."""
    from ftm_datalake_spark.operators.statements import aggregate_statements
    from ftm_datalake_spark.pipelines.ingest import crawl, read_documents
    from ftm_datalake_spark.streaming.pipeline import documents_to_statements

    lake = str(tmp_path / "batch_lake")
    crawl(spark, source, dataset, lake)
    docs = read_documents(spark, lake, dataset)
    return aggregate_statements(documents_to_statements(docs))


def _entity_dicts(df):
    out = {}
    for r in df.collect():
        d = r.asDict(recursive=True)
        props = {k: sorted(v) for k, v in (d["properties"] or {}).items()}
        out[d["id"]] = (d["schema"], props, sorted(d["datasets"]))
    return out


def test_rfc_pipeline_stream_equals_batch(spark, tmp_path):
    from ftm_datalake_spark.streaming.pipeline import (
        read_entities,
        run_rfc_pipeline,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"alpha doc")
    (src / "b.pdf").write_bytes(b"%PDF bravo")
    (src / "sub").mkdir()
    (src / "sub" / "c.csv").write_bytes(b"x,y\n1,2")

    work = str(tmp_path / "stream")
    # maxFilesPerTrigger=1 chops the stream into per-file micro-batches,
    # exercising the incremental merge path, not one big batch
    counts = run_rfc_pipeline(
        spark, str(src), "ds1", work, max_files_per_trigger=1
    )
    assert counts["documents"] == 3
    assert counts["statements"] == 3 * 4  # 4 props per file entity
    assert counts["entities"] == 3

    got = _entity_dicts(read_entities(spark, os.path.join(work, "entities")))
    want = _entity_dicts(_batch_entities(spark, str(src), "ds1", tmp_path))
    assert got == want  # stream result == batch pipeline result

    # exactly-once: re-draining with the same checkpoints is a no-op
    counts2 = run_rfc_pipeline(
        spark, str(src), "ds1", work, max_files_per_trigger=1
    )
    assert counts2 == counts
    assert _entity_dicts(
        read_entities(spark, os.path.join(work, "entities"))
    ) == want


def test_rfc_pipeline_incremental_drop(spark, tmp_path):
    """Dropping one new file into the source and re-running processes
    ONLY the increment (stage outputs grow by exactly one file's rows)
    and converges to the full batch answer."""
    from ftm_datalake_spark.streaming.pipeline import (
        read_entities,
        run_rfc_pipeline,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"alpha doc")

    work = str(tmp_path / "stream")
    counts1 = run_rfc_pipeline(spark, str(src), "ds1", work)
    assert counts1 == {"documents": 1, "statements": 4, "entities": 1}

    (src / "late.html").write_bytes(b"<html>late arrival</html>")
    counts2 = run_rfc_pipeline(spark, str(src), "ds1", work)
    assert counts2 == {"documents": 2, "statements": 8, "entities": 2}

    got = _entity_dicts(read_entities(spark, os.path.join(work, "entities")))
    want = _entity_dicts(_batch_entities(spark, str(src), "ds1", tmp_path))
    assert got == want
