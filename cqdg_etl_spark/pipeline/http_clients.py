"""HTTP implementations of the external-service ports.

Live counterparts to the fixture/deterministic defaults in
``pipeline/clients.py`` for deployments that talk to the real services
(reference: clients/DictionaryClient.scala:23-85,
clients/IdServerClient.scala:16-31, clients/KeycloakClient.scala:28-44).

Design:
- stdlib ``urllib`` only (no extra deps in the engine image), wrapped in
  an injectable ``Transport`` so unit tests run against a recorded fake
  and deployments can swap in any HTTP stack;
- bounded retries with exponential backoff on 5xx/connection errors
  (the reference's BaseHttpClient has no retry — a transient Lectern
  blip kills a whole ETL run there);
- the ID-server path exists for reference parity but the engine default
  stays ``DeterministicIdResolver``: a per-row HTTP round trip (or the
  reference's collect-to-driver batch, PreProcessUtils.scala:93-100)
  is not a 100-TB pattern.
"""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Protocol

from cqdg_etl_spark.pipeline.models import Schema, sanitize


class Transport(Protocol):
    def request(
        self,
        method: str,
        url: str,
        headers: dict[str, str],
        body: bytes | None,
        timeout: float,
    ) -> tuple[int, str]:
        """Return (status_code, body_text)."""
        ...


class UrllibTransport:
    """Default stdlib transport. HTTP errors surface as (status, body)
    rather than exceptions so the retry policy can decide."""

    def request(self, method, url, headers, body, timeout):
        req = urllib.request.Request(url, data=body, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:  # non-2xx still has a body
            return e.code, e.read().decode("utf-8", errors="replace")


def _basic_auth(username: str, password: str) -> str:
    token = base64.b64encode(f"{username}:{password}".encode()).decode()
    return f"Basic {token}"


@dataclass
class RetryingHttp:
    """Shared request runner: JSON headers, basic auth, bounded
    exponential backoff on 5xx and connection errors."""

    transport: Transport = field(default_factory=UrllibTransport)
    retries: int = 3
    timeout: float = 30.0
    backoff: float = 0.5
    sleep: Callable[[float], None] = time.sleep

    def request(
        self,
        method: str,
        url: str,
        auth: str | None = None,
        body: str | None = None,
        content_type: str = "application/json",
    ) -> tuple[int, str]:
        headers = {"Content-Type": content_type}
        if auth:
            headers["Authorization"] = auth
        data = body.encode("utf-8") if body is not None else None
        last_exc: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                status, text = self.transport.request(
                    method, url, headers, data, self.timeout
                )
            except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
                last_exc = e
                status, text = -1, repr(e)
            if 0 <= status < 500:
                return status, text
            if attempt < self.retries:
                self.sleep(self.backoff * (2**attempt))
        if last_exc is not None and status == -1:
            raise RuntimeError(f"{method} {url} failed after retries: {last_exc}")
        return status, text


class HttpDictionary:
    """Lectern dictionary client (DictionaryClient.scala:23-85).

    ``load_schemas()``: GET ``dictionaries?name=<name>`` → one entry per
    published version, then GET ``dictionaries?name=<name>&version=<v>``
    per version; every entity keeps its generated
    ``internal_<entity>_id`` column and the ``file`` schema is appended
    client-side (both reference quirks, DictionaryClient.scala:66-78).
    """

    FILE_SCHEMA = Schema(
        "file",
        (
            "submitter_biospecimen_id", "submitter_donor_id", "study_id",
            "internal_file_id", "file_name", "data_category", "data_type",
            "is_harmonized", "experimental_strategy", "data_access",
            "file_format", "platform", "variant_class",
        ),
    )

    def __init__(
        self,
        endpoint: str,
        dictionary_name: str,
        username: str = "",
        password: str = "",
        http: RetryingHttp | None = None,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.name = dictionary_name
        self.auth = _basic_auth(username, password) if username else None
        self.http = http or RetryingHttp()

    def _get(self, suffix: str) -> tuple[int, str]:
        return self.http.request("GET", f"{self.endpoint}/{suffix}", self.auth)

    def load_schemas(self) -> dict[str, list[Schema]]:
        enc = urllib.parse.quote(self.name)
        status, body = self._get(f"dictionaries?name={enc}")
        if status != 200:
            raise RuntimeError(
                f"Failed to retrieve Lectern's versions for {self.name}.\n{body}"
            )
        out: dict[str, list[Schema]] = {}
        for entry in json.loads(body):
            version = entry["version"]
            out[version] = self._load_version(enc, version)
        return out

    def _load_version(self, enc_name: str, version: str) -> list[Schema]:
        status, body = self._get(f"dictionaries?name={enc_name}&version={version}")
        if status != 200:
            raise RuntimeError(
                f"Failed to retrieve Lectern's schemas for version {version} "
                f"of {self.name}.\n{body}"
            )
        schemas: list[Schema] = []
        for entry in json.loads(body):
            for js in entry["schemas"]:
                entity = sanitize(js["name"])
                cols = [f["name"] for f in js["fields"]]
                cols.append(f"internal_{entity}_id")
                schemas.append(Schema(entity, tuple(cols)))
        schemas.append(self.FILE_SCHEMA)
        return schemas


class HttpIdServer:
    """ID-server batch client (IdServerClient.scala:16-31):
    POST ``<endpoint>/batch`` with a JSON payload of business hashes,
    returning the hash→internal-id mapping as JSON text."""

    def __init__(
        self,
        endpoint: str,
        username: str = "",
        password: str = "",
        http: RetryingHttp | None = None,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.auth = _basic_auth(username, password) if username else None
        self.http = http or RetryingHttp()

    def get_cqdg_ids(self, payload: str) -> str:
        url = f"{self.endpoint}/batch"
        status, body = self.http.request("POST", url, self.auth, body=payload)
        if status != 200:
            raise RuntimeError(
                f"Failed to retrieve ids from id-service at {url}.\n{body}"
            )
        return body


class HttpIdResolver:
    """Reference-parity ID resolution through :class:`HttpIdServer`.

    Collects the DISTINCT business hashes per entity (bounded by entity
    cardinality, NOT corpus size), posts them in chunks, and broadcast-
    joins the returned mapping back — the Spark-shaped version of
    PreProcessUtils.scala:93-100 (which collects every row). For new
    deployments prefer ``DeterministicIdResolver``: no service, no
    driver round trip, same stability guarantee.
    """

    def __init__(self, server: HttpIdServer, chunk_size: int = 10_000):
        self.server = server
        self.chunk_size = chunk_size

    def resolve(self, df, entity: str):
        from pyspark.sql import functions as F

        hashes = [r[0] for r in df.select("cqdg_hash").distinct().collect()]
        mapping: dict[str, str] = {}
        for i in range(0, len(hashes), self.chunk_size):
            chunk = hashes[i : i + self.chunk_size]
            payload = json.dumps({h: entity for h in chunk})
            mapping.update(json.loads(self.server.get_cqdg_ids(payload)))
        spark = df.sparkSession
        map_df = spark.createDataFrame(
            list(mapping.items()), ["hash", "internal_id"]
        )
        return df.join(
            F.broadcast(map_df), df.cqdg_hash == map_df.hash, "left"
        ).drop("hash")


class HttpKeycloak:
    """Keycloak resource registration (KeycloakClient.scala:28-64).

    Client-credentials token from
    ``/realms/<realm>/protocol/openid-connect/token``, then one
    resource-set POST per file id against the protection API — the same
    (name, type, scope) triple the reference registers. Returns the
    count of successfully created resources; 409 (already exists) counts
    as success so re-runs are idempotent.

    Registration fans out over a BOUNDED thread pool, matching the
    reference's ``Future.traverse`` over its cached executor
    (processes/processes.scala:12-16) — per-resource POSTs are
    independent, so latency is pool-parallel while ``max_workers`` caps
    the concurrent load on the Keycloak server.
    """

    def __init__(
        self,
        auth_server_url: str,
        realm: str,
        client_id: str,
        secret: str,
        enabled: bool = True,
        http: RetryingHttp | None = None,
        max_workers: int = 8,
    ):
        self.base = auth_server_url.rstrip("/")
        self.realm = realm
        self.client_id = client_id
        self.secret = secret
        self.enabled = enabled
        self.http = http or RetryingHttp()
        self.max_workers = max_workers

    def is_enabled(self) -> bool:
        return self.enabled

    def _token(self) -> str:
        url = f"{self.base}/realms/{self.realm}/protocol/openid-connect/token"
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": self.client_id,
                "client_secret": self.secret,
            }
        )
        status, text = self.http.request(
            "POST", url, body=body,
            content_type="application/x-www-form-urlencoded",
        )
        if status != 200:
            raise RuntimeError(f"Keycloak token request failed ({status}).\n{text}")
        return json.loads(text)["access_token"]

    def _create_one(self, url: str, token: str, rid: str) -> None:
        body = json.dumps(
            {
                "name": rid,
                "type": "file",
                "ownerManagedAccess": True,
                "resource_scopes": ["read"],
            }
        )
        status, text = self.http.request(
            "POST", url, auth=f"Bearer {token}", body=body
        )
        if status not in (200, 201, 409):
            raise RuntimeError(
                f"Keycloak resource_set POST for {rid} failed ({status}).\n{text}"
            )

    def create_resources(self, ids: set[str]) -> int:
        from concurrent.futures import ThreadPoolExecutor

        token = self._token()
        url = f"{self.base}/realms/{self.realm}/authz/protection/resource_set"
        rids = sorted(ids)
        if not rids:
            return 0
        workers = min(self.max_workers, len(rids))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            # list() propagates the first failure, like Future.traverse
            list(pool.map(lambda rid: self._create_one(url, token, rid), rids))
        return len(rids)
