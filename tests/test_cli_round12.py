"""Round-12 CLI verbs: cdc-apply --layout pointer round-trip through
_dispatch (the object-store-safe pointer-manifest snapshot as a
product verb)."""

from __future__ import annotations

import argparse
import json


def test_cdc_apply_cli_pointer_layout(spark, capsys, tmp_path):
    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.streaming.cdc import (
        init_pointer_snapshot,
        read_pointer_snapshot,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    changes = [
        {"key": "a", "seq": 1, "op": "U", "val": "v1x"},
        {"key": "b", "seq": 1, "op": "D", "val": None},
        {"key": "d", "seq": 1, "op": "I", "val": "v4"},
    ]
    (feed / "b1.json").write_text(
        "\n".join(json.dumps(c) for c in changes) + "\n"
    )
    base = str(tmp_path / "snapbase")
    init_pointer_snapshot(
        spark.createDataFrame(
            [("a", "v1"), ("b", "v2"), ("c", "v3")], "key string, val string"
        ),
        base,
    )
    args = argparse.Namespace(
        cmd="cdc-apply", snapshot=base, feed=str(feed),
        checkpoint=str(tmp_path / "ck"), keys="key",
        schema="key string, seq long, op string, val string",
        buckets=None, layout="pointer",
    )
    assert _dispatch(spark, args) in (0, None)
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {"snapshot": base, "rows": 3, "mode": "pointer"}
    got = {
        r.key: r.val for r in read_pointer_snapshot(spark, base).collect()
    }
    assert got == {"a": "v1x", "c": "v3", "d": "v4"}
    # the pointer file names a generation; gen-init still on disk (keep=2)
    assert (tmp_path / "snapbase" / "SNAPSHOT").read_text().strip().startswith(
        "gen-"
    )


def test_cdc_apply_cli_pointer_rejects_buckets(spark, tmp_path):
    from ftm_datalake_spark.__main__ import _dispatch

    import pytest

    args = argparse.Namespace(
        cmd="cdc-apply", snapshot=str(tmp_path / "x"), feed=str(tmp_path),
        checkpoint=str(tmp_path / "ck"), keys="key",
        schema="key string, seq long, op string, val string",
        buckets=4, layout="pointer",
    )
    with pytest.raises(SystemExit):
        _dispatch(spark, args)
