"""Round-13 ADVICE fixes, one law each.

1. (high) Pointer-CDC replay AFTER publish: a crash between the pointer
   flip and the streaming checkpoint commit re-delivers a batch whose
   generation the pointer already names — re-merging would overwrite
   the directory being lazily read (wedge or corruption). The fix
   detects the replay exactly (deterministic gen names) and skips.
2. (high) t-closeness must count sensitive values ABSENT from a group:
   TVD as the sum of POSITIVE deviations over present pairs equals the
   full-domain (1/2)*sum|P(s|g)-P(s)| exactly.
3. (low) The streaming WDS publisher must adopt a directory whose
   manifest a prior BATCH sink wrote (entries without batch_id).
4. (low) The generic-FS WDS tier must record manifest paths in the
   caller's URI form, not pyarrow's scheme-stripped root.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("val", T.StringType()),
    ]
)


def _write_feed(feed_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    with open(os.path.join(feed_dir, name), "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


def test_pointer_cdc_replay_after_publish_is_skipped(spark, tmp_path):
    """Crash window: pointer flipped, checkpoint commit lost. The
    re-delivered batch must return without re-merging (its generation
    is live) — the naive re-merge reads and overwrites the same path,
    which Spark rejects, permanently wedging the stream."""
    from ftm_datalake_spark.streaming.cdc import (
        init_pointer_snapshot,
        read_pointer_snapshot,
        run_cdc_upsert_stream_pointer,
    )

    base = str(tmp_path / "snapbase")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    init_pointer_snapshot(
        spark.createDataFrame([("a", "v1")], "key string, val string"), base
    )
    _write_feed(feed, "b1.json", [
        {"key": "a", "seq": 1, "op": "U", "val": "v1x"},
        {"key": "b", "seq": 1, "op": "I", "val": "v2"},
    ])
    stream = spark.readStream.schema(CHANGE_SCHEMA).json(feed)
    q = run_cdc_upsert_stream_pointer(stream, base, ckpt, ["key"])
    q.awaitTermination(120)
    want = {"a": "v1x", "b": "v2"}
    assert {
        r.key: r.val for r in read_pointer_snapshot(spark, base).collect()
    } == want

    # simulate the crash: the flip happened (pointer names gen-0) but
    # the checkpoint never recorded batch 0 as committed
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):  # ChecksumFS sidecar blocks the re-commit rename
        os.remove(crc)
    gen_dir = tmp_path / "snapbase" / "gen-000000000000"
    before = sorted(
        (p.name, p.stat().st_mtime_ns) for p in gen_dir.iterdir()
    )

    stream = spark.readStream.schema(CHANGE_SCHEMA).json(feed)
    q = run_cdc_upsert_stream_pointer(stream, base, ckpt, ["key"])
    q.awaitTermination(120)  # re-delivers batch 0; the guard skips it

    assert {
        r.key: r.val for r in read_pointer_snapshot(spark, base).collect()
    } == want
    after = sorted(
        (p.name, p.stat().st_mtime_ns) for p in gen_dir.iterdir()
    )
    assert after == before  # the live generation was never touched


def test_t_closeness_counts_absent_sensitive_values(spark):
    """ADVICE r12 #2's own example: 50/50 A/B corpus, each group fully
    revealing (one value only). True TVD is 0.5; the inner-join-of-
    present-pairs |·|/2 form reported 0.25 and passed t=0.3."""
    from ftm_datalake_spark.operators.privacy import t_closeness_audit

    df = spark.createDataFrame(
        [("g1", "A"), ("g1", "A"), ("g2", "B"), ("g2", "B")],
        "q string, s string",
    )
    rows = t_closeness_audit(df, ["q"], "s", t_ppm=300000).collect()
    assert {r["q"]: r["t_ppm"] for r in rows} == {
        "g1": 500000,
        "g2": 500000,
    }
    assert all(not r["close"] for r in rows)


def test_t_closeness_equals_full_domain_tvd(spark):
    """Property: the positive-deviation form equals the full-domain
    (1/2)*sum_s |P(s|g) - P(s)| computed independently in exact integer
    arithmetic over a randomized corpus."""
    import random
    from collections import Counter

    from ftm_datalake_spark.operators.privacy import t_closeness_audit

    rnd = random.Random(13)
    rows = [
        (f"g{rnd.randrange(4)}", f"s{rnd.randrange(5) * rnd.randrange(2)}")
        for _ in range(300)
    ]
    got = {
        r["q"]: r["t_ppm"]
        for r in t_closeness_audit(
            spark.createDataFrame(rows, "q string, s string"),
            ["q"],
            "s",
            t_ppm=100000,
        ).collect()
    }

    c = len(rows)
    c_s = Counter(s for _, s in rows)
    by_g: dict[str, Counter] = {}
    for g, s in rows:
        by_g.setdefault(g, Counter())[s] += 1
    for g, cnt in by_g.items():
        c_g = sum(cnt.values())
        # full-domain: every sensitive value in the corpus, including
        # ones absent from the group (|0 - P(s)| terms)
        num = sum(
            abs(cnt.get(s, 0) * c - c_s[s] * c_g) for s in c_s
        )
        assert got[g] == (num * 1000000) // (2 * c_g * c)


def test_streaming_wds_adopts_batch_sink_directory(spark, tmp_path):
    """First streaming batch into a directory a batch export already
    populated (manifest entries without batch_id) must merge, not
    KeyError (ADVICE r12 #3), preserving the batch-sink entries."""
    from ftm_datalake_spark.sources.sinks import write_webdataset_shards
    from ftm_datalake_spark.streaming.wds import (
        read_webdataset_manifest,
        stream_webdataset_publish,
    )

    out = str(tmp_path / "wds")
    os.makedirs(out)
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(15)], "doc_id long, text string"
    )
    write_webdataset_shards(docs, out, shard_size=10)  # manifest, no batch_id

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    with open(os.path.join(feed, "b0.json"), "w") as fh:
        for i in range(15, 27):
            fh.write(json.dumps({"doc_id": i, "text": f"text-{i}"}) + "\n")
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).json(feed)
    q = stream_webdataset_publish(
        stream, out, str(tmp_path / "ckpt"), shard_size=10
    )
    q.awaitTermination(120)

    manifest = read_webdataset_manifest(spark, out)
    batch_entries = [m for m in manifest if "batch_id" not in m]
    stream_entries = [m for m in manifest if "batch_id" in m]
    assert len(batch_entries) == 2 and len(stream_entries) == 2
    # adopted entries sort ahead of every streaming batch
    assert manifest[: len(batch_entries)] == batch_entries


def test_wds_generic_tier_manifest_paths_carry_callers_uri(spark, tmp_path):
    """pyarrow's from_uri strips the scheme; recorded paths must stay
    in the caller's URI form so manifest consumers can resolve them
    (ADVICE r12 #4)."""
    import pyarrow.fs as pafs

    from ftm_datalake_spark.sources.sinks import write_webdataset_shards

    store = tmp_path / "store"
    (store / "lake").mkdir(parents=True)

    def factory(uri: str):
        assert uri.startswith("fakefs://")
        return pafs.SubTreeFileSystem(str(store), pafs.LocalFileSystem()), "lake"

    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(12)], "doc_id long, text string"
    )
    entries = write_webdataset_shards(
        docs,
        "fakefs://store/lake",
        shard_size=10,
        task_fs_factory=factory,
        write_manifest=False,
    )
    assert len(entries) == 2
    for e in entries:
        assert e["path"].startswith("fakefs://store/lake/shard-")
        name = e["path"].rsplit("/", 1)[1]
        assert (store / "lake" / name).is_file()
