#!/usr/bin/env python3
"""Smoke test for the Python binding, mirroring the reference's
engine/test/bindings/python/test.py flow: load_db -> create_table (three
metric fields) -> insert with a duplicate PK -> query each metric field
-> delete by PK -> re-query -> drop_table -> unload_db. Asserts on
status codes, first-wins dedup counters, nearest-neighbor order and the
delete mask; exits non-zero on any failure.

Usage: smoke_test.py --port <port> [--host localhost] [--db-path <dir>]
"""

import argparse
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import graft_client as graft


def check(cond, msg):
    if not cond:
        print("FAIL:", msg)
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--db-path", default=None)
    args = ap.parse_args()

    graft.connect(host=args.host, port=args.port)
    code, _ = graft.state()
    check(code == 200, "server state")

    db_path = args.db_path or tempfile.mkdtemp(prefix="graft_pybind_")
    code, resp = graft.load_db(db_name="db", db_path=db_path)
    check(code == 200, "load_db: %s" % resp)
    graft.use_db("db")

    code, resp = graft.create_table(
        table_name="MyTable",
        table_fields=[
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
            {"name": "EmbeddingEuclidean", "dataType": "VECTOR_FLOAT",
             "dimensions": 4, "metricType": "EUCLIDEAN"},
            {"name": "EmbeddingDotProduct", "dataType": "VECTOR_FLOAT",
             "dimensions": 4, "metricType": "DOT_PRODUCT"},
            {"name": "EmbeddingCosine", "dataType": "VECTOR_FLOAT",
             "dimensions": 4, "metricType": "COSINE"},
        ],
    )
    check(code == 200, "create_table: %s" % resp)

    cities = [
        (1, "Berlin", [0.05, 0.61, 0.76, 0.74]),
        (2, "London", [0.19, 0.81, 0.75, 0.11]),
        (3, "Moscow", [0.36, 0.55, 0.47, 0.94]),
        (4, "San Francisco", [0.18, 0.01, 0.85, 0.80]),
        (5, "Shanghai", [0.24, 0.18, 0.22, 0.44]),
        (1, "Berlin", [0.05, 0.61, 0.76, 0.74]),  # duplicate insertion
    ]
    records = [
        {"ID": i, "Doc": d, "EmbeddingEuclidean": v,
         "EmbeddingDotProduct": v, "EmbeddingCosine": v}
        for (i, d, v) in cities
    ]
    code, resp = graft.insert(table_name="MyTable", records=records)
    check(code == 200, "insert: %s" % resp)
    check(resp["result"]["inserted"] == 5 and resp["result"]["skipped"] == 1,
          "first-wins counters: %s" % resp["result"])

    qv = [0.35, 0.55, 0.47, 0.94]
    for field in ["EmbeddingEuclidean", "EmbeddingDotProduct", "EmbeddingCosine"]:
        code, resp = graft.query(
            table_name="MyTable",
            query_field=field,
            response_fields=["ID", "Doc", field],
            query_vector=qv,
            filter="ID < 6",
            limit=6,
            with_distance=True,
        )
        check(code == 200, "query %s: %s" % (field, resp))
        rows = resp["result"]
        check(len(rows) == 5, "query %s row count: %d" % (field, len(rows)))
        dists = [r["@distance"] for r in rows]
        check(dists == sorted(dists), "query %s distance order" % field)
        if field != "EmbeddingDotProduct":
            # the query IS Moscow's vector: nearest for L2 and cosine
            check(rows[0]["Doc"] == "Moscow",
                  "query %s nearest: %s" % (field, rows[0]))

    # batch retrieval: results in input order, each entry a full single
    # response; first vector IS Moscow's -> its nearest is Moscow
    code, resp = graft.query(table_name="MyTable",
                             query_field="EmbeddingEuclidean",
                             response_fields=["ID", "Doc"],
                             query_vectors=[qv, [0.2, 0.2, 0.2, 0.4]],
                             limit=3, with_distance=True)
    check(code == 200 and len(resp["results"]) == 2,
          "batch query shape: %s" % resp)
    check(resp["results"][0]["result"][0]["Doc"] == "Moscow",
          "batch entry 0 nearest: %s" % resp["results"][0])
    check(resp["results"][1]["result"][0]["Doc"] == "Shanghai",
          "batch entry 1 nearest: %s" % resp["results"][1])

    # scan with filter + projection
    code, resp = graft.get(table_name="MyTable",
                           response_fields=["ID", "Doc"], filter="ID >= 4")
    check(code == 200 and {r["ID"] for r in resp["result"]} == {4, 5},
          "get filter: %s" % resp)

    # insert_prepare bitmask: bit cleared iff pk exists
    code, resp = graft.insert_prepare(table_name="MyTable",
                                      primary_keys=[1, 2, 99])
    mask = resp["result"]["bitmask"][0]
    check(code == 200 and (mask & 1) == 0 and (mask & 2) == 0 and (mask & 4) != 0,
          "insert_prepare bitmask: %s" % resp)

    code, resp = graft.statistics()
    check(code == 200 and resp["result"][0]["totalRecords"] == 5,
          "statistics: %s" % resp)

    # delete the four nearest, re-query: Shanghai remains
    code, resp = graft.delete(table_name="MyTable", primary_keys=[1, 2, 3, 4])
    check(code == 200 and resp["result"]["deleted"] == 4, "delete: %s" % resp)
    code, resp = graft.query(table_name="MyTable",
                             query_field="EmbeddingEuclidean",
                             response_fields=["ID", "Doc"],
                             query_vector=qv, limit=10, with_distance=True)
    check(code == 200 and len(resp["result"]) == 1
          and resp["result"][0]["Doc"] == "Shanghai",
          "post-delete query: %s" % resp)

    # upsert (last-wins) replaces the surviving row's doc
    code, resp = graft.upsert(table_name="MyTable", records=[
        {"ID": 5, "Doc": "Shanghai v2", "EmbeddingEuclidean": [1, 1, 1, 1],
         "EmbeddingDotProduct": [1, 1, 1, 1], "EmbeddingCosine": [1, 1, 1, 1]}])
    check(code == 200, "upsert: %s" % resp)
    code, resp = graft.get(table_name="MyTable", response_fields=["Doc"],
                           primary_keys=[5])
    check(resp["result"][0]["Doc"] == "Shanghai v2", "upsert visible: %s" % resp)

    code, resp = graft.drop_table("MyTable")
    check(code == 200, "drop_table: %s" % resp)
    code, resp = graft.list_tables()
    check(code == 200 and resp["result"] == [], "tables empty: %s" % resp)

    code, resp = graft.unload_db("db")
    check(code == 200, "unload_db: %s" % resp)

    print("smoke_test OK")


if __name__ == "__main__":
    main()
