"""Q3: JWT-scoped file lookup (SURVEY §2.9).

Reference: ftm_datalake/api/auth.py:43-68 — HS256 tokens whose subject is
``"{dataset}/{key}"`` plus an ``exp`` claim; any failure (bad signature,
expired, malformed subject) raises ONE generic error so a probing client
cannot distinguish "no such file" from "not allowed" (404-hiding,
api/main.py:77-94 + tests/test_api.py:25-63).

Implemented with the stdlib (hmac + base64url): standard JWT wire format,
no external dependency. This is a pure-Python serving-layer helper around
the engine's ``lookup_file`` — no Spark involvement in token checks.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time

from pyspark.sql import DataFrame


class AuthError(Exception):
    """The single generic auth failure (reference DEFAULT_ERROR)."""


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def create_access_token(
    dataset: str,
    key: str,
    secret: str,
    expire_minutes: int = 60,
    _now: float | None = None,
) -> str:
    """HS256 JWT with sub="{dataset}/{key}" and exp, like
    create_access_token (reference api/auth.py:43-48)."""
    now = time.time() if _now is None else _now
    header = {"alg": "HS256", "typ": "JWT"}
    payload = {"sub": f"{dataset}/{key}", "exp": int(now + expire_minutes * 60)}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(payload, separators=(",", ":")).encode())
    )
    sig = hmac.new(secret.encode(), signing_input.encode(), hashlib.sha256).digest()
    return signing_input + "." + _b64url(sig)


def verify_token(token: str, secret: str, _now: float | None = None) -> tuple[str, str]:
    """Validate signature + expiry and split the scope; raises AuthError
    on ANY failure (reference ensure_token_context, api/auth.py:50-67)."""
    now = time.time() if _now is None else _now
    try:
        header_b64, payload_b64, sig_b64 = token.split(".")
        expect = hmac.new(
            secret.encode(), f"{header_b64}.{payload_b64}".encode(), hashlib.sha256
        ).digest()
        if not hmac.compare_digest(expect, _b64url_decode(sig_b64)):
            raise AuthError("invalid token")
        header = json.loads(_b64url_decode(header_b64))
        if header.get("alg") != "HS256":
            raise AuthError("invalid token")
        payload = json.loads(_b64url_decode(payload_b64))
        if int(payload["exp"]) < now:
            raise AuthError("invalid token")
        dataset, key = payload["sub"].split("/", 1)
        return dataset, key
    except AuthError:
        raise
    except Exception as exc:  # malformed b64/json/sub — same generic error
        raise AuthError("invalid token") from exc


def lookup_file_scoped(
    documents: DataFrame, token: str, secret: str, _now: float | None = None
) -> dict | None:
    """Token-scoped point lookup: the token IS the (dataset, key) scope —
    a valid token for another file cannot read this one by construction.
    Returns None for a valid token whose file is gone (404), raises
    AuthError for every token problem (404-hiding)."""
    from ftm_datalake_spark.serving import lookup_file

    dataset, key = verify_token(token, secret, _now=_now)
    return lookup_file(documents, dataset, key)
