"""Q3 JWT-scoped lookup tests, mirroring the reference's
tests/test_api.py:25-63 coverage: valid, expired, wrong-scope, garbage."""

from __future__ import annotations

import pytest

SECRET = "test-secret"


def _docs(spark):
    rows = [
        ("ds1", "a/b.txt", "hash1", 10),
        ("ds1", "c.txt", "hash2", 20),
        ("ds2", "a/b.txt", "hash3", 30),
    ]
    return spark.createDataFrame(
        rows, "dataset string, key string, content_hash string, size long"
    )


def test_valid_token_returns_file(spark):
    from ftm_datalake_spark.auth import create_access_token, lookup_file_scoped

    token = create_access_token("ds1", "a/b.txt", SECRET)
    info = lookup_file_scoped(_docs(spark), token, SECRET)
    assert info["content_hash"] == "hash1"
    assert info["dataset"] == "ds1"


def test_token_scope_is_exact(spark):
    """A valid token for one file cannot read another — the scope IS the
    token subject, including keys containing '/'."""
    from ftm_datalake_spark.auth import create_access_token, lookup_file_scoped

    token = create_access_token("ds2", "a/b.txt", SECRET)
    info = lookup_file_scoped(_docs(spark), token, SECRET)
    assert info["content_hash"] == "hash3"  # ds2's file, not ds1's


def test_expired_token_rejected(spark):
    from ftm_datalake_spark.auth import AuthError, create_access_token, lookup_file_scoped

    token = create_access_token("ds1", "a/b.txt", SECRET, _now=1000.0)
    with pytest.raises(AuthError):
        lookup_file_scoped(_docs(spark), token, SECRET, _now=1000.0 + 3601)


def test_tampered_and_garbage_tokens_rejected(spark):
    from ftm_datalake_spark.auth import (
        AuthError,
        create_access_token,
        lookup_file_scoped,
        verify_token,
    )

    good = create_access_token("ds1", "a/b.txt", SECRET)
    # wrong secret
    with pytest.raises(AuthError):
        verify_token(good, "other-secret")
    # tampered payload keeps old signature
    h, p, s = good.split(".")
    evil = create_access_token("ds1", "c.txt", SECRET).split(".")[1]
    with pytest.raises(AuthError):
        verify_token(f"{h}.{evil}.{s}", SECRET)
    # garbage
    for junk in ("", "abc", "a.b", "a.b.c.d"):
        with pytest.raises(AuthError):
            lookup_file_scoped(_docs(spark), junk, SECRET)


def test_valid_token_missing_file_is_none(spark):
    """404 for a well-scoped token whose file is gone; indistinguishable
    error class from auth failures is the caller's concern — the helper
    just returns None."""
    from ftm_datalake_spark.auth import create_access_token, lookup_file_scoped

    token = create_access_token("ds1", "nope.txt", SECRET)
    assert lookup_file_scoped(_docs(spark), token, SECRET) is None
