"""The HTTP serving shell (SURVEY §2.9 Q1-Q3) — reference-parity routes
over the engine's documents table.

Mirrors ftm_datalake/api/main.py:35-94 + api/util.py:19-77 +
api/auth.py:43-68 with the standard library only (the container has no
FastAPI; the app is plain WSGI, mountable under any WSGI server and
testable over real HTTP via wsgiref):

- ``HEAD/GET /{dataset}/{key}``      public file: metadata headers / bytes
- ``HEAD/GET /file`` + Bearer token  private file, token carries the scope
- ``GET /{dataset}/{key}/token``     debug-only token mint (?exp=minutes)
- ``GET /``                          app info (the reference serves docs)

Error semantics are the reference's information-hiding contract
(api/util.py:44-57 Errors): outside debug mode EVERY failure — missing
file, bad token, expired token, malformed path — is the same bare 404.

The engine's role is keeping the documents table fresh; the app answers
point lookups through a pluggable ``lookup`` callable so deployments can
swap the Spark-backed lookup for a collected dict or external KV
projection without touching routes."""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable
from urllib.parse import parse_qs, unquote

from ftm_datalake_spark.auth import AuthError, create_access_token, verify_token

API_VERSION = "0.1.0"
BASE_HEADER = {"x-ftm-datalake-version": API_VERSION}


def get_file_header(info: dict) -> dict[str, str]:
    """Reference header derivation (api/util.py:19-31): the
    x-ftm-datalake-* metadata projection, clean_dict semantics — None /
    empty values dropped."""
    name = os.path.basename(str(info.get("key") or ""))
    candidates = {
        **BASE_HEADER,
        "x-ftm-datalake-dataset": info.get("dataset"),
        "x-ftm-datalake-key": info.get("key"),
        "x-ftm-datalake-sha1": info.get("content_hash"),
        "x-ftm-datalake-name": name,
        "x-ftm-datalake-size": (
            str(info["size"]) if info.get("size") is not None else None
        ),
        "x-mimetype": info.get("mimetype"),
        "content-type": info.get("mimetype"),
    }
    return {k: str(v) for k, v in candidates.items() if v not in (None, "")}


class DatalakeApi:
    """WSGI app. ``lookup(dataset, key) -> dict | None`` resolves file
    metadata; ``stream(info) -> Iterable[bytes]`` yields blob bytes."""

    def __init__(
        self,
        lookup: Callable[[str, str], dict | None],
        stream: Callable[[dict], Iterable[bytes]],
        secret: str,
        debug: bool = False,
    ) -> None:
        self.lookup = lookup
        self.stream = stream
        self.secret = secret
        self.debug = debug

    # ------------------------------------------------------------ WSGI
    def __call__(self, environ, start_response):
        method = environ["REQUEST_METHOD"]
        path = unquote(environ.get("PATH_INFO") or "/")
        query = parse_qs(environ.get("QUERY_STRING") or "")
        try:
            if method not in ("GET", "HEAD"):
                return self._error(start_response, "405 Method Not Allowed")
            if path == "/":
                return self._json(
                    start_response,
                    {"title": "ftm-datalake-spark", "version": API_VERSION},
                )
            if path == "/file":
                return self._file_by_token(environ, start_response, method)
            if self.debug and path.endswith("/token"):
                return self._mint_token(start_response, path, query)
            return self._public_file(start_response, path, method)
        except Exception:
            # 404 for information hiding on ANY failure (reference
            # Errors.__exit__, api/util.py:44-57)
            return self._error(start_response, "404 Not Found")

    # --------------------------------------------------------- helpers
    def _split(self, path: str) -> tuple[str, str]:
        dataset, _, key = path.strip("/").partition("/")
        if not dataset or not key:
            raise LookupError(path)
        return dataset, key

    def _resolve(self, dataset: str, key: str) -> dict:
        info = self.lookup(dataset, key)
        if info is None:
            raise LookupError(f"{dataset}/{key}")
        return info

    def _serve(self, start_response, info: dict, method: str):
        headers = get_file_header(info)
        if method == "HEAD":
            start_response("200 OK", list(headers.items()))
            return [b""]
        body = self.stream(info)
        start_response("200 OK", list(headers.items()))
        return body

    def _public_file(self, start_response, path: str, method: str):
        dataset, key = self._split(path)
        return self._serve(start_response, self._resolve(dataset, key), method)

    def _file_by_token(self, environ, start_response, method: str):
        authz = environ.get("HTTP_AUTHORIZATION") or ""
        scheme, _, token = authz.partition(" ")
        if scheme.lower() != "bearer" or not token:
            raise AuthError("no token")
        dataset, key = verify_token(token, self.secret)
        return self._serve(start_response, self._resolve(dataset, key), method)

    def _mint_token(self, start_response, path: str, query: dict):
        dataset, key = self._split(path[: -len("/token")])
        info = self._resolve(dataset, key)  # 404 for unknown files
        exp = int(query.get("exp", ["60"])[0])
        token = create_access_token(dataset, key, self.secret, expire_minutes=exp)
        return self._json(
            start_response,
            {"access_token": token, "token_type": "Bearer"},
            extra=get_file_header(info),
        )

    def _json(self, start_response, payload: dict, extra: dict | None = None):
        body = json.dumps(payload).encode()
        headers = {
            **(extra or {}),
            "content-type": "application/json",
            "content-length": str(len(body)),
        }
        start_response("200 OK", list(headers.items()))
        return [body]

    def _error(self, start_response, status: str):
        body = json.dumps({"detail": status.split(" ", 1)[1]}).encode()
        start_response(
            status,
            [("content-type", "application/json"),
             ("content-length", str(len(body)))],
        )
        return [body]


def build_app_from_documents(
    documents,
    archive_root: str,
    secret: str,
    debug: bool = False,
    lookup_mode: str = "auto",
    projection_dir: str | None = None,
    snapshot_max_rows: int | None = None,
) -> DatalakeApi:
    """Wire the WSGI app to a Spark documents DataFrame (Q1 point
    lookup) and the content-addressed blob layout (Q2, serving.py:160)
    — blob bytes stream straight from storage, never through Spark.

    The hot GET path runs NO Spark job by default: ``lookup_mode``

    - ``"auto"`` (default): ``projection_dir`` given → build the
      (dataset, shard)-partitioned parquet projection once and serve
      partition-pruned point reads (serving.py:85); otherwise collect a
      guarded in-memory dict snapshot (serving.py:121) — true O(1) per
      GET. If the table exceeds the snapshot guard the builder raises
      with instructions rather than silently degrading to a per-GET
      table scan.
    - ``"snapshot"`` / ``"projection"``: force one of the above.
    - ``"spark"``: the per-GET Spark scan (lookup_file, serving.py:21)
      — the explicit fallback for always-fresh reads over a mutating
      table, not a default.
    """
    from ftm_datalake_spark.serving import (
        DICT_SNAPSHOT_MAX_ROWS,
        blob_shard_uri,
        build_lookup_projection,
        lookup_file,
        make_dict_snapshot_lookup,
        make_projection_lookup,
    )

    if snapshot_max_rows is None:
        snapshot_max_rows = DICT_SNAPSHOT_MAX_ROWS
    if lookup_mode == "auto":
        lookup_mode = "projection" if projection_dir else "snapshot"

    if lookup_mode == "snapshot":
        try:
            lookup = make_dict_snapshot_lookup(documents, max_rows=snapshot_max_rows)
        except ValueError as exc:
            raise ValueError(
                f"{exc}; pass projection_dir= (O(1) partition-pruned parquet "
                "lookup) or lookup_mode='spark' (per-GET scan) explicitly"
            ) from exc
    elif lookup_mode == "projection":
        if not projection_dir:
            raise ValueError("lookup_mode='projection' requires projection_dir")
        build_lookup_projection(documents, projection_dir)
        lookup = make_projection_lookup(documents.sparkSession, projection_dir)
    elif lookup_mode == "spark":

        def lookup(dataset: str, key: str) -> dict | None:
            return lookup_file(documents, dataset, key)

    else:
        raise ValueError(f"unknown lookup_mode: {lookup_mode!r}")

    def stream(info: dict, chunk: int = 1 << 16) -> Iterable[bytes]:
        uri = blob_shard_uri(archive_root, info["dataset"], info["content_hash"])
        with open(uri, "rb") as fh:
            while True:
                block = fh.read(chunk)
                if not block:
                    return
                yield block

    return DatalakeApi(lookup, stream, secret, debug=debug)


def serve(app: DatalakeApi, host: str = "127.0.0.1", port: int = 8000):
    """Run under wsgiref (dev parity with the reference's uvicorn dev
    server); returns the server so callers control its lifecycle."""
    from wsgiref.simple_server import WSGIServer, make_server

    class _Quiet(WSGIServer):
        def handle_error(self, request, client_address):  # pragma: no cover
            pass

    return make_server(host, port, app, server_class=_Quiet)
