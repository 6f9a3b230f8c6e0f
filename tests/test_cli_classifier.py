"""The `classifier` CLI verb through _dispatch (in-session): build →
append → model → compact → predict round-trip, plus the idempotent
re-delivery contract surfaced at the CLI layer."""

from __future__ import annotations

import argparse
import json


def _args(**kw) -> argparse.Namespace:
    return argparse.Namespace(**kw)


def _clf_args(action, source, model, label_col="lang"):
    return _args(
        cmd="classifier",
        action=action,
        source=source,
        model=model,
        label_col=label_col,
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_classifier_cli_roundtrip(spark, tmp_path, capsys):
    from ftm_datalake_spark.__main__ import _dispatch

    base = str(tmp_path / "base.parquet")
    delta = str(tmp_path / "delta.parquet")
    _docs(
        spark, [(1, "A", "alpha alpha beta"), (2, "B", "gamma gamma beta")]
    ).write.parquet(base)
    _docs(spark, [(10, "B", "alpha alpha alpha alpha")]).write.parquet(delta)
    model = str(tmp_path / "model")

    assert _dispatch(spark, _clf_args("build", base, model)) in (0, None)
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["built"] and built["rows"] == 4

    assert _dispatch(spark, _clf_args("append", delta, model)) in (0, None)
    appended = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not appended["skipped"] and appended["rows_appended"] == 1

    # re-delivery is a no-op, visible at the CLI layer
    _dispatch(spark, _clf_args("append", delta, model))
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["skipped"] and again["delta_id"] == appended["delta_id"]

    _dispatch(spark, _clf_args("model", None, model))
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    by_tok = {r["token"]: r for r in rows}
    # alpha: A has 2/3 (666666 ppm), B has 4/6 (666666 ppm) — tie -> A
    assert by_tok["alpha"]["label"] == "A"
    assert by_tok["gamma"]["label"] == "B"

    _dispatch(spark, _clf_args("compact", None, model))
    compacted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert compacted["compacted"]

    _dispatch(spark, _clf_args("predict", base, model))
    preds = {
        json.loads(x)["doc_id"]: json.loads(x)
        for x in capsys.readouterr().out.strip().splitlines()
    }
    assert preds[1]["predicted"] == "A"
    assert preds[2]["predicted"] == "B"


def test_classifier_cli_missing_source_errors(spark, tmp_path, capsys):
    from ftm_datalake_spark.__main__ import _dispatch

    rc = _dispatch(
        spark, _clf_args("build", None, str(tmp_path / "m"))
    )
    assert rc == 2


def test_classifier_stats_reports_drift_and_accretion(spark, tmp_path, capsys):
    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.pipelines.classifier_store import (
        append_classifier_model,
        build_classifier_model,
        classifier_model_stats,
        compact_classifier_ledger,
    )

    d = str(tmp_path / "m")
    build_classifier_model(
        spark, _docs(spark, [(1, "A", "x x x x x x x x")]), d
    )
    append_classifier_model(spark, _docs(spark, [(9, "B", "y y")]), d)
    s = classifier_model_stats(spark, d)
    assert s["token_mass"] == 10 and s["appended_mass"] == 2
    assert s["appended_fraction"] == 0.2
    assert s["generations"] == 2 and s["labels"] == 2 and s["vocab"] == 2

    # CLI surface
    _dispatch(
        spark, _clf_args("stats", None, d)
    )
    import json as _json

    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == s

    # compaction folds everything into base: accretion and drift reset
    compact_classifier_ledger(spark, d)
    s2 = classifier_model_stats(spark, d)
    assert s2["generations"] == 1 and s2["appended_fraction"] == 0.0
    assert s2["token_mass"] == 10
