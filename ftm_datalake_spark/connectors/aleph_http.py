"""Aleph HTTP connector — the wire protocol of the reference's
alephclient-backed connector (ftm_datalake/connectors/aleph.py:20-120)
implemented over urllib so the sync pipelines can drive a REAL Aleph
API socket, not just an injected callable.

Public alephclient surface mirrored (all request shapes from the
alephclient OSS package):

- ``GET  /api/2/collections?filter:foreign_id=<fid>`` — lookup
- ``POST /api/2/collections``                          — create
- ``POST /api/2/collections/<id>/ingest``              — folder upload
  (multipart-free metadata-only variant: Aleph accepts a bare JSON
  ``meta`` payload for folders)
- ``POST /api/2/collections/<id>/_bulk``               — entity bulk load
- ``PUT  /api/2/collections/<id>``                     — metadata update

Spark split of responsibilities (same as the reference's worker):
- collection lookup/create + folder creation are DRIVER-side metadata
  calls (O(collections + folders), memoized create-once);
- entity/document pushes run TASK-side through
  ``push_in_batches`` — each executor partition opens its own
  connection, sends ≤batch_size rows per request, with partition
  concurrency capped at the reference's 10-thread pool limit
  (connectors/aleph.py:120).

The client is a plain picklable value object (base_url + api_key
strings); nothing holds sockets across pickling boundaries.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Any


class AlephHTTPClient:
    """Minimal Aleph API client over urllib (picklable)."""

    def __init__(self, base_url: str, api_key: str | None = None, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    # -- request plumbing ------------------------------------------------
    def _headers(self) -> dict[str, str]:
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"ApiKey {self.api_key}"
        return headers

    def _request(
        self, method: str, path: str, payload: Any | None = None
    ) -> dict | None:
        url = f"{self.base_url}{path}"
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(
            url, data=data, headers=self._headers(), method=method
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as res:  # noqa: S310
            body = res.read()
        return json.loads(body) if body else None

    # -- collections (driver-side metadata) ------------------------------
    def get_collection_by_foreign_id(self, foreign_id: str) -> dict | None:
        q = urllib.parse.quote(foreign_id, safe="")
        res = self._request("GET", f"/api/2/collections?filter:foreign_id={q}")
        results = (res or {}).get("results") or []
        return results[0] if results else None

    def create_collection(self, metadata: dict) -> dict:
        return self._request("POST", "/api/2/collections", metadata) or {}

    def load_collection_by_foreign_id(
        self, foreign_id: str, metadata: dict | None = None
    ) -> dict:
        """get-or-create, like alephclient's load_collection_by_foreign_id."""
        existing = self.get_collection_by_foreign_id(foreign_id)
        if existing is not None:
            return existing
        payload = {"foreign_id": foreign_id, "label": foreign_id}
        payload.update(metadata or {})
        return self.create_collection(payload)

    def update_collection(self, collection_id: str, metadata: dict) -> dict:
        return (
            self._request("PUT", f"/api/2/collections/{collection_id}", metadata)
            or {}
        )

    # -- ingest + bulk (folders driver-side; entity batches task-side) ---
    def ingest_upload(self, collection_id: str, metadata: dict) -> dict:
        return (
            self._request(
                "POST", f"/api/2/collections/{collection_id}/ingest", {"meta": metadata}
            )
            or {}
        )

    def write_entities(self, collection_id: str, entities: list[dict]) -> None:
        self._request(
            "POST", f"/api/2/collections/{collection_id}/_bulk", entities
        )


def make_folder_fn(client: AlephHTTPClient, collection_id: str):
    """Driver-side folder creator for ``sync_to_aleph``: one
    ingest_upload per folder path, metadata shaped like the reference's
    make_folders (connectors/aleph.py:62-74: file_name = last segment,
    foreign_id = full path, parent by id). Create-once memoization is
    enforced by aleph_folder_ids, which calls this exactly once per
    distinct folder, parents first."""

    def make_folder(path: str, parent_id: str | None) -> str:
        metadata: dict = {
            "file_name": path.rsplit("/", 1)[-1],
            "foreign_id": path,
        }
        if parent_id is not None:
            metadata["parent"] = {"id": parent_id}
        res = client.ingest_upload(collection_id, metadata)
        return str(res["id"])

    return make_folder


def make_bulk_sender(client: AlephHTTPClient, collection_id: str):
    """Task-side batch sender for ``push_in_batches``/``sync_to_aleph``:
    POSTs each ≤batch_size chunk to the collection's _bulk endpoint
    (reference: sync/aleph_entities.py:78-80, api.write_entities). The
    closure captures only strings, so it ships to executors cleanly."""
    base_url, api_key, timeout = client.base_url, client.api_key, client.timeout

    def send(batch: list[dict]) -> None:
        task_client = AlephHTTPClient(base_url, api_key, timeout)
        task_client.write_entities(collection_id, batch)

    return send


def sync_to_aleph_http(
    documents,
    base_url: str,
    foreign_id: str,
    api_key: str | None = None,
    batch_size: int = 1000,
    max_concurrency: int = 10,
    collection_metadata: dict | None = None,
) -> str:
    """End-to-end HTTP Aleph sync: get-or-create the collection, create
    the folder tree once (driver-side, parents first), push document
    rows task-side in ≤batch_size batches over ≤max_concurrency
    partitions. Returns the collection id."""
    from ftm_datalake_spark.pipelines.sync import sync_to_aleph

    client = AlephHTTPClient(base_url, api_key)
    collection = client.load_collection_by_foreign_id(
        foreign_id, collection_metadata
    )
    collection_id = str(collection["id"])
    sync_to_aleph(
        documents,
        make_folder_fn(client, collection_id),
        make_bulk_sender(client, collection_id),
        batch_size=batch_size,
        max_concurrency=max_concurrency,
    )
    return collection_id
