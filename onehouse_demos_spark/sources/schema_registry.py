"""Confluent Schema Registry client for the CDC decode path
(reference S2: `mysql-debezium/register-mysql-avro.json:20-24` wires
Debezium's AvroConverter to `http://schema-registry:8081` with
USER_INFO basic auth; the consumer resolves each record's WRITER
schema from the 4-byte id in the Confluent wire frame).

Speaks the public Schema Registry REST protocol
(GET /schemas/ids/{id}, GET /subjects/{subject}/versions/{v},
POST /subjects/{subject}/versions) over an INJECTABLE transport: the
default fetcher uses urllib, and tests/offline environments supply a
callable `(url, headers) -> (status, body_bytes)` — typically
`dict_fetcher` over recorded responses — so the whole protocol layer
(URL shapes, auth header, id caching, error mapping) executes without
a network. The client is picklable and id→schema lookups are cached
per process (ids are immutable in the registry), so shipping it into
`mapInPandas` workers costs one fetch per schema id per worker.
"""

from __future__ import annotations

import base64
import json
import struct
import urllib.parse
from typing import Callable

#: Content type the registry speaks (public protocol constant).
CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"

Fetcher = Callable[[str, dict], tuple[int, bytes]]


class SchemaRegistryError(RuntimeError):
    """Registry returned an error (non-2xx status or protocol error)."""

    def __init__(self, status: int, url: str, detail: str = ""):
        super().__init__(f"schema registry {status} for {url}: {detail}")
        self.status = status
        self.url = url


def _urllib_fetcher(url: str, headers: dict) -> tuple[int, bytes]:
    """Default network transport. Import-light so the module stays
    usable in sandboxes; only called when a real registry is reachable."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as exc:  # pragma: no cover - network
        return exc.code, exc.read()


def dict_fetcher(responses: dict[str, dict]) -> Fetcher:
    """Offline transport over recorded responses: path → JSON object.
    Unknown paths return 404 with the registry's error shape."""

    def fetch(url: str, headers: dict) -> tuple[int, bytes]:
        path = urllib.parse.urlparse(url).path
        if path in responses:
            return 200, json.dumps(responses[path]).encode()
        return 404, json.dumps(
            {"error_code": 40403, "message": f"Schema not found: {path}"}
        ).encode()

    return fetch


class SchemaRegistryClient:
    """Minimal Schema Registry protocol client.

    `auth` mirrors the reference's `basic.auth.user.info` string
    ("user:pass", `register-mysql-avro.json:16-18`) or a (user, pass)
    tuple; it becomes the standard `Authorization: Basic ...` header.
    """

    def __init__(
        self,
        base_url: str,
        auth: str | tuple[str, str] | None = None,
        fetcher: Fetcher | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        if isinstance(auth, tuple):
            auth = ":".join(auth)
        self._auth = auth
        self._fetcher = fetcher or _urllib_fetcher
        self._by_id: dict[int, str] = {}

    # pickling ships the fetcher + auth to executors; the id cache
    # resets per worker (harmless — ids are immutable, refetch is one
    # GET per worker per id).
    def __getstate__(self):
        st = dict(self.__dict__)
        st["_by_id"] = {}
        return st

    def _headers(self) -> dict:
        h = {"Accept": CONTENT_TYPE}
        if self._auth:
            h["Authorization"] = "Basic " + base64.b64encode(
                self._auth.encode()
            ).decode()
        return h

    def _get(self, path: str) -> dict:
        url = self.base_url + path
        status, body = self._fetcher(url, self._headers())
        if status != 200:
            detail = ""
            try:
                detail = json.loads(body).get("message", "")
            except Exception:
                detail = body[:200].decode(errors="replace")
            raise SchemaRegistryError(status, url, detail)
        return json.loads(body)

    def get_schema_by_id(self, schema_id: int) -> str:
        """GET /schemas/ids/{id} → the schema text (cached)."""
        if schema_id not in self._by_id:
            self._by_id[schema_id] = self._get(f"/schemas/ids/{schema_id}")[
                "schema"
            ]
        return self._by_id[schema_id]

    def get_subject_version(
        self, subject: str, version: int | str = "latest"
    ) -> dict:
        """GET /subjects/{subject}/versions/{version} →
        {subject, id, version, schema}."""
        subj = urllib.parse.quote(subject, safe="")
        return self._get(f"/subjects/{subj}/versions/{version}")

    def latest_schema(self, subject: str) -> tuple[int, str]:
        info = self.get_subject_version(subject, "latest")
        return info["id"], info["schema"]


def parse_schema_id(raw: bytes) -> int:
    """Schema id from a Confluent-framed message (magic 0 + 4-byte
    big-endian id, the public wire format)."""
    if len(raw) < 5 or raw[0] != 0:
        raise ValueError(
            "not Confluent-framed: need magic byte 0 + 4-byte schema id"
        )
    return struct.unpack(">I", raw[1:5])[0]
