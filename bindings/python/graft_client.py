"""Pure-stdlib Python client for the graft HTTP server.

Mirrors the reference's Python binding surface (reference:
engine/test/bindings/python/test.py, concurrent_test.py — load_db /
use_db / create_table / insert / query / get / delete / drop_table /
unload_db, every call returning ``(status_code, response_dict)``) over
graft's endpoint shapes (GraftHttpServer.scala). No third-party
dependencies: ``urllib`` only, safe to vendor anywhere Python 3.8+ runs.

Two surfaces, like the reference binding:

- ``Client`` — explicit connection object::

      from graft_client import Client
      client = Client(host="localhost", port=8666)
      client.load_db(db_name="db", db_path="/data/db")
      client.use_db("db")
      status, resp = client.query(table_name="T", query_field="V",
                                  query_vector=[0.1, 0.2], limit=5)

- module-level functions bound to a default client (``connect`` then
  ``load_db`` / ``insert`` / ``query`` ... like the embedded reference
  module).
"""

import json
import threading
import urllib.error
import urllib.request

__all__ = [
    "Client", "connect", "load_db", "use_db", "unload_db", "drop_db",
    "create_table", "list_tables", "drop_table", "insert", "upsert",
    "insert_prepare", "query", "get", "delete", "rebuild", "statistics",
    "state", "describe_table", "dump_db", "release_db", "set_leader",
    "update_config", "load_csv", "rebuild_bm25_index",
]


class Client:
    """HTTP client for one graft server; thread-safe (the reference's
    concurrent_test drives one client from many threads)."""

    def __init__(self, host="localhost", port=8666, protocol="http",
                 db_name="default", timeout=120):
        self._base = "%s://%s:%d" % (protocol, host, port)
        self._db = db_name
        self._timeout = timeout

    # ---- plumbing ----

    def _request(self, method, path, body=None):
        data = None if body is None else json.dumps(body).encode("utf-8")
        req = urllib.request.Request(
            self._base + path, data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                raw = resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            raw = e.read().decode("utf-8") or json.dumps(
                {"statusCode": e.code, "message": str(e)})
        payload = json.loads(raw)
        return payload.get("statusCode", 500), payload

    # ---- server ----

    def state(self):
        """GET /state — (200, {...}) when the server is online."""
        return self._request("GET", "/state")

    # ---- databases ----

    def load_db(self, db_name, db_path=None):
        """POST /api/load — load (or create) a database by name."""
        body = {"name": db_name}
        if db_path is not None:
            body["path"] = db_path
        return self._request("POST", "/api/load", body)

    def use_db(self, db_name):
        """Route subsequent data-plane calls at this database."""
        self._db = db_name
        return 200, {"statusCode": 200, "message": "use %s" % db_name}

    def unload_db(self, db_name):
        """POST /api/{db}/unload — forget the database, keep its files."""
        return self._request("POST", "/api/%s/unload" % db_name)

    def drop_db(self, db_name):
        """DELETE /api/{db}/drop — unload AND delete files."""
        return self._request("DELETE", "/api/%s/drop" % db_name)

    # ---- tables ----

    def create_table(self, table_name, table_fields, table_indices=None):
        """POST /api/{db}/schema/tables.

        ``table_fields``: [{"name", "dataType", "primaryKey"?,
        "dimensions"?, "metricType"?}, ...] — reference field dicts.
        """
        body = {"name": table_name, "fields": table_fields}
        if table_indices is not None:
            body["indices"] = table_indices
        return self._request("POST", "/api/%s/schema/tables" % self._db, body)

    def list_tables(self):
        return self._request("GET", "/api/%s/schema/tables/show" % self._db)

    def drop_table(self, table_name):
        return self._request(
            "DELETE", "/api/%s/schema/tables/%s" % (self._db, table_name))

    # ---- data plane ----

    def insert(self, table_name, records, upsert=False):
        """POST /api/{db}/data/insert — first-wins; upsert=True last-wins."""
        body = {"table": table_name, "data": records}
        if upsert:
            body["upsert"] = True
        return self._request("POST", "/api/%s/data/insert" % self._db, body)

    def upsert(self, table_name, records):
        return self.insert(table_name, records, upsert=True)

    def insert_prepare(self, table_name, primary_keys):
        """POST /api/{db}/data/insertprepare — existence bitmask (bit
        CLEARED iff the pk already exists)."""
        return self._request(
            "POST", "/api/%s/data/insertprepare" % self._db,
            {"table": table_name, "primaryKeys": primary_keys})

    def query(self, table_name, query_field=None, query_vector=None,
              query_text=None, response_fields=None, limit=10,
              filter="", with_distance=False, facets=None, ann=False,
              serve=False, n_probe=None, unbounded=False,
              quantized=False, pq=False, certified=False,
              query_vectors=None, keywords=None, text_field=None,
              rrf_cut=None, recall_target=None):
        """POST /api/{db}/data/query — vector top-K.

        ``query_vector`` is a dense list OR a sparse dict
        ``{"indices": [...], "values": [...]}``; ``query_text`` routes
        through the table's embedding index (search-by-content);
        ``ann``/``serve`` pick the index / driver-resident serving paths.
        With ``serve``: ``quantized`` opts into the 16-bit code-resident
        tier, ``pq`` into the m-byte product-quantization tier (lossy
        ranking, marked in the response envelope), and ``certified``
        upgrades either to a proven-exact id set (ambiguous boundary
        float-reranked server-side, surfaced as ``reranked``).
        """
        body = {"table": table_name, "limit": limit}
        if query_field is not None:
            body["queryField"] = query_field
        if query_vector is not None:
            body["queryVector"] = query_vector
        if query_vectors is not None:
            # batch retrieval: response is {"results": [<single resp>, ...]}
            # in input order; with serve=True the server answers the batch
            # from the resident tier in one shared sweep
            body["queryVectors"] = query_vectors
        if keywords is not None:
            # hybrid retrieval: RRF fusion (k=60) of the dense ranking and
            # the BM25 keyword ranking over text_field's impact index;
            # response rows are {"__row_id", "rrf"}
            body["keywords"] = keywords
        if text_field is not None:
            body["textField"] = text_field
        if rrf_cut is not None:
            body["rrfCut"] = rrf_cut
        if query_text is not None:
            body["query"] = query_text
        if response_fields is not None:
            body["response"] = response_fields
        if filter:
            body["filter"] = filter
        if with_distance:
            body["withDistance"] = True
        if facets is not None:
            body["facets"] = facets
        if ann:
            body["ann"] = True
        if serve:
            body["serve"] = True
        if quantized:
            body["quantized"] = True
        if pq:
            body["pq"] = True
        if certified:
            body["certified"] = True
        if recall_target is not None:
            # ann path: auto-probe proving recall >= target (1.0 = exact);
            # serve path: the float tier's probe set becomes the proven
            # cover (declines to the job path when combined with a filter)
            body["recallTarget"] = float(recall_target)
        if n_probe is not None:
            body["nProbe"] = n_probe
        if unbounded:
            body["unbounded"] = True
        return self._request("POST", "/api/%s/data/query" % self._db, body)

    def get(self, table_name, response_fields=None, filter="", skip=None,
            limit=None, primary_keys=None, facets=None, unbounded=False):
        """POST /api/{db}/data/get — filtered scan / PK lookup."""
        body = {"table": table_name}
        if response_fields is not None:
            body["response"] = response_fields
        if filter:
            body["filter"] = filter
        if skip is not None:
            body["skip"] = skip
        if limit is not None:
            body["limit"] = limit
        if primary_keys is not None:
            body["primaryKeys"] = primary_keys
        if facets is not None:
            body["facets"] = facets
        if unbounded:
            body["unbounded"] = True
        return self._request("POST", "/api/%s/data/get" % self._db, body)

    def delete(self, table_name, primary_keys=None, filter=""):
        """POST /api/{db}/data/delete — tombstone by PK list and/or filter."""
        body = {"table": table_name}
        if primary_keys is not None:
            body["primaryKeys"] = primary_keys
        if filter:
            body["filter"] = filter
        return self._request("POST", "/api/%s/data/delete" % self._db, body)

    def rebuild(self):
        """POST /api/rebuild — rebuild vector indexes of every loaded db."""
        return self._request("POST", "/api/rebuild")

    def rebuild_bm25_index(self, table_name, field):
        """POST /api/{db}/bm25/rebuild — create-or-refresh the BM25 impact
        index over a STRING field (enables keyword/hybrid retrieval)."""
        return self._request("POST", "/api/%s/bm25/rebuild" % self._db,
                             {"table": table_name, "field": field})

    def statistics(self):
        return self._request("GET", "/api/%s/statistics" % self._db)

    def describe_table(self, table_name):
        """GET /api/{db}/schema/tables/{t}/describe — schema in the catalog
        JSON shape plus the on-disk index inventory."""
        return self._request(
            "GET", "/api/%s/schema/tables/%s/describe" % (self._db, table_name))

    def dump_db(self, db_name, path):
        """POST /api/dump — export the named db's current snapshot to path."""
        return self._request("POST", "/api/dump",
                             {"name": db_name, "path": path})

    def release_db(self, db_name=None):
        """POST /api/{db}/release — drop server-side in-memory residency;
        files stay, the next query reopens cold."""
        return self._request("POST", "/api/%s/release" % (db_name or self._db))

    def set_leader(self, leader):
        """POST /api/setleader — leader writes the catalog, followers don't."""
        return self._request("POST", "/api/setleader", {"leader": bool(leader)})

    def update_config(self, **kwargs):
        """POST /api/config — reference knobs (IntraQueryThreads, PreFilter,
        ...) plus graft-native serving caps (MaxServeRows/MaxServeBytes/
        MaxServeTailRows, ServeFilterColumns={table,field,columns})."""
        return self._request("POST", "/api/config", kwargs)

    def load_csv(self, table_name, path, upsert=False):
        """POST /api/{db}/data/load — header CSV into the table's scalar
        columns through the normal DML path (PK dedup applies)."""
        return self._request("POST", "/api/%s/data/load" % self._db,
                             {"table": table_name, "path": path,
                              "upsert": upsert})


# ---- module-level surface bound to a default client ----

_default = None
_default_lock = threading.Lock()


def connect(host="localhost", port=8666, protocol="http", db_name="default",
            timeout=120):
    """Bind the module-level functions to a server; returns the Client."""
    global _default
    with _default_lock:
        _default = Client(host, port, protocol, db_name, timeout)
    return _default


def _client():
    if _default is None:
        raise RuntimeError("call graft_client.connect(host, port) first")
    return _default


def state():
    return _client().state()


def load_db(db_name, db_path=None):
    return _client().load_db(db_name, db_path)


def use_db(db_name):
    return _client().use_db(db_name)


def unload_db(db_name):
    return _client().unload_db(db_name)


def drop_db(db_name):
    return _client().drop_db(db_name)


def create_table(table_name, table_fields, table_indices=None):
    return _client().create_table(table_name, table_fields, table_indices)


def list_tables():
    return _client().list_tables()


def drop_table(table_name):
    return _client().drop_table(table_name)


def insert(table_name, records, upsert=False):
    return _client().insert(table_name, records, upsert)


def upsert(table_name, records):
    return _client().upsert(table_name, records)


def insert_prepare(table_name, primary_keys):
    return _client().insert_prepare(table_name, primary_keys)


def query(table_name, **kw):
    return _client().query(table_name, **kw)


def get(table_name, **kw):
    return _client().get(table_name, **kw)


def delete(table_name, primary_keys=None, filter=""):
    return _client().delete(table_name, primary_keys, filter)


def rebuild():
    return _client().rebuild()


def rebuild_bm25_index(table_name, field):
    return _client().rebuild_bm25_index(table_name, field)


def statistics():
    return _client().statistics()


def describe_table(table_name):
    return _client().describe_table(table_name)


def dump_db(db_name, path):
    return _client().dump_db(db_name, path)


def release_db(db_name=None):
    return _client().release_db(db_name)


def set_leader(leader):
    return _client().set_leader(leader)


def update_config(**kwargs):
    return _client().update_config(**kwargs)


def load_csv(table_name, path, upsert=False):
    return _client().load_csv(table_name, path, upsert)
