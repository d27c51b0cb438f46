#!/usr/bin/env python3
"""Index lifecycle through the Python binding: bulk insert past the
brute-force threshold, rebuild, ANN query, driver-served query, then an
insert AFTER the rebuild (ingest-time append) that must be visible on
the index path without another rebuild. Exits non-zero on any failure.

Usage: index_smoke.py --port <port> [--host localhost]
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
    args = ap.parse_args()

    graft.connect(host=args.host, port=args.port)
    graft.load_db(db_name="idxdb", db_path=tempfile.mkdtemp(prefix="graft_pyidx_"))
    graft.use_db("idxdb")
    code, resp = graft.create_table(
        table_name="Vecs",
        table_fields=[
            {"name": "ID", "dataType": "BIGINT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 4,
             "metricType": "EUCLIDEAN"},
        ],
    )
    check(code == 200, "create_table: %s" % resp)

    # 600 rows clears the brute-force threshold (512)
    words = ["spark", "vector", "join", "scan", "stream", "filter"]
    records = [{"ID": i,
                "Doc": "%s %s idx%d" % (words[i % 6], words[(i * 5) % 6], i),
                "V": [(i % 83) / 83.0, (i % 47) / 47.0,
                      (i % 29) / 29.0, (i % 13) / 13.0]}
               for i in range(600)]
    code, resp = graft.insert(table_name="Vecs", records=records)
    check(code == 200 and resp["result"]["inserted"] == 600, "bulk insert: %s" % resp)

    code, resp = graft.rebuild()
    check(code == 200, "rebuild: %s" % resp)

    qv = [0.5, 0.5, 0.5, 0.5]
    # exact top-1 as the oracle for the index paths
    code, resp = graft.query(table_name="Vecs", query_field="V",
                             query_vector=qv, limit=1,
                             response_fields=["ID"], with_distance=True)
    check(code == 200, "exact query: %s" % resp)
    nearest = resp["result"][0]["ID"]

    code, resp = graft.query(table_name="Vecs", query_field="V",
                             query_vector=qv, limit=1,
                             response_fields=["ID"], ann=True)
    check(code == 200 and resp["result"][0]["ID"] == nearest,
          "ann query disagrees with exact: %s" % resp)

    # driver-served: (__row_id, @distance) pairs, no Spark job warm
    code, resp = graft.query(table_name="Vecs", query_vector=qv,
                             limit=3, serve=True)
    check(code == 200 and resp.get("served") is True
          and len(resp["result"]) == 3
          and resp["result"][0]["@distance"] <= resp["result"][1]["@distance"],
          "served query: %s" % resp)

    # code-resident serving tiers: 16-bit and PQ, both certified — the
    # proven id set must agree with the exact serve's top hit, and the
    # envelope must mark the tier (never a silent downgrade)
    for tier_kw in ({"quantized": True}, {"pq": True}):
        code, resp = graft.query(table_name="Vecs", query_vector=qv,
                                 limit=3, serve=True, certified=True,
                                 **tier_kw)
        tier = list(tier_kw)[0]
        check(code == 200 and resp.get("served") is True
              and resp.get(tier) is True and resp.get("certified") is True
              and len(resp["result"]) == 3,
              "certified %s serve: %s" % (tier, resp))

    # insert AFTER the rebuild, exactly at the query point: ingest-time
    # append must make it the ANN top hit without another rebuild
    code, resp = graft.insert(table_name="Vecs",
                              records=[{"ID": 9000, "Doc": "fresh row", "V": qv}])
    check(code == 200 and resp["result"]["inserted"] == 1, "post-rebuild insert")
    code, resp = graft.query(table_name="Vecs", query_field="V",
                             query_vector=qv, limit=1,
                             response_fields=["ID"], ann=True)
    check(code == 200 and resp["result"][0]["ID"] == 9000,
          "appended row must win the ANN top-1: %s" % resp)
    code, resp = graft.query(table_name="Vecs", query_vector=qv,
                             limit=1, serve=True)
    check(code == 200 and resp.get("served") is True
          and abs(resp["result"][0]["@distance"]) < 1e-9,
          "appended row must serve at distance 0: %s" % resp)

    # hybrid retrieval: create the BM25 impact index over HTTP, then fuse
    # keywords with the dense ranking (RRF); rows carry (__row_id, rrf)
    code, resp = graft.rebuild_bm25_index("Vecs", "Doc")
    check(code == 200, "bm25 rebuild: %s" % resp)
    code, resp = graft.query(table_name="Vecs", query_field="V",
                             text_field="Doc", query_vector=qv,
                             keywords=["spark", "vector"], limit=5)
    check(code == 200 and resp.get("hybrid") is True
          and len(resp["result"]) == 5
          and all("rrf" in r for r in resp["result"])
          and resp["result"][0]["rrf"] >= resp["result"][-1]["rrf"],
          "hybrid query: %s" % resp)

    graft.drop_db("idxdb")
    print("index_smoke OK")


if __name__ == "__main__":
    main()
