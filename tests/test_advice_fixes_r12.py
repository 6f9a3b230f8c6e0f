"""Laws for the round-12 ADVICE fixes (ADVICE r11 #3/#4; #1 lives in
test_archive_generic_distributed.py, #2 in test_streaming_cdc.py's
pointer-layout tests)."""

from __future__ import annotations

import zipfile

import pytest


@pytest.fixture()
def viewfs(spark, tmp_path):
    import uuid

    name = f"graft-{uuid.uuid4().hex[:8]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = f"fs.viewfs.mounttable.{name}.link./data"
    hconf.set(key, tmp_path.as_uri())
    yield f"viewfs://{name}/data"
    hconf.unset(key)


def test_zip_export_rel_paths_survive_unnormalized_root_spelling(
    spark, tmp_path, viewfs
):
    """ADVICE r11 #3: member names must come from the FS-qualified root,
    not a string-prefix match against the caller's spelling — a
    non-canonical input (trailing slashes, `.` segments) must still
    yield the full relative tree, never flattened bare names."""
    from ftm_datalake_spark import fsutil
    from ftm_datalake_spark.sources.sinks import export_dataset_zip

    files = {
        "index.json": b"{}",
        "sub/documents.csv": b"key\n1\n",
        "sub/deeper/statements.csv": b"id\n2\n",
    }
    for rel, content in files.items():
        d = f"{viewfs}/ds/{rel.rpartition('/')[0]}".rstrip("/")
        fsutil.mkdirs(spark, d)
        fsutil.write_bytes(spark, f"{viewfs}/ds/{rel}", content)

    for spelling in (f"{viewfs}/ds", f"{viewfs}/ds/", f"{viewfs}/ds//",
                     f"{viewfs}/./ds"):
        out = str(tmp_path / "out.zip")
        export_dataset_zip(spelling, out, spark=spark)
        with zipfile.ZipFile(out) as zf:
            got = {i.filename: zf.read(i) for i in zf.infolist()}
        assert got == files, f"tree mangled for spelling {spelling!r}"


def test_webdataset_generic_branch_uses_range_partitioning(spark, tmp_path, viewfs):
    """ADVICE r11 #4: the generic-scheme WebDataset publisher must not
    stack multiple tars into one driver fetch through hash-partition
    collisions. Range partitioning on distinct shard ids gives each
    output partition a contiguous span — verified here by publishing
    enough shards that hash collisions would be near-certain and
    checking every tar landed intact (the memory bound is behavioral;
    the layout equality is the observable)."""
    import hashlib
    import json as _json

    from ftm_datalake_spark import fsutil
    from ftm_datalake_spark.sources.sinks import write_webdataset_shards

    docs = spark.createDataFrame(
        [(str(i), f"text-{i}") for i in range(170)],
        "doc_id string, text string",
    )
    remote = f"{viewfs}/wds"
    fsutil.mkdirs(spark, remote)
    manifest = write_webdataset_shards(docs, remote, shard_size=10)
    assert len(manifest) == 17
    listed = _json.loads(fsutil.read_bytes(spark, f"{remote}/manifest.json"))
    assert listed == manifest
    for m in manifest:
        got = hashlib.sha256(fsutil.read_bytes(spark, m["path"])).hexdigest()
        assert got == m["sha256"]
