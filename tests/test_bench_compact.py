"""Guard for the r12 evidence-pipeline regression (VERDICT r12 #1):
bench.py's stdout line must stay comfortably inside the ~2,000-char
tail the driver's permanent record keeps, whatever grows in the detail
artifact. A representative worst-case detail dict (16 long-named
queries, full canary series, errors) must compact to < 1,500 bytes and
still carry the raw total."""

from __future__ import annotations

import json
import sys


def test_compact_line_fits_driver_tail():
    sys.path.insert(0, "/root/repo")
    import bench

    queries = {
        f"statement_aggregation_wide_variant_{i:02d}": 12.345
        for i in range(16)
    }
    detail = {
        "metric": "headline_queries_total_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": queries,
        "queries_normalized": dict(queries),
        "spread": {k: {"min": 1.0, "max": 99.9, "n": 5} for k in queries},
        "canaries": [0.5] * 40,
        "canary_sec": 0.5,
        "canary_post_sec": 0.5,
        "canary_drift_ratio": 1.234,
        "canary_median_sec": 0.5,
        "ref_canary_sec": 0.491,
        "value_normalized": 130.0,
        "sf": 0.1,
        "errors": {"some_query": "X" * 500},
    }
    compact = bench.make_compact(detail)
    line = json.dumps(compact)
    assert len(line) < 1500, f"compact line grew to {len(line)} bytes"
    # the fields the permanent record must carry
    parsed = json.loads(line)
    assert parsed["value"] == 123.456
    assert parsed["metric"] == "headline_queries_total_sec"
    assert len(parsed["queries"]) == 16
    assert parsed["value_normalized"] == 130.0
    # detail-only bulk must NOT leak into the compact line
    assert "spread" not in parsed and "canaries" not in parsed
    assert all(len(v) <= 80 for v in parsed["errors"].values())
