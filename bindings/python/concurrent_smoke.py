#!/usr/bin/env python3
"""Concurrency test for the Python binding, mirroring the reference's
engine/test/bindings/python/concurrent_test.py: one shared client, 10
rounds x 10 threads of top-2 queries (the reference's executor pool runs
16 concurrent searches), with writer threads interleaved. Every response
must be 200 with exactly 2 ordered results; exits non-zero otherwise.

Usage: concurrent_smoke.py --port <port> [--host localhost]
"""

import argparse
import sys
import tempfile
import threading

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import graft_client as graft


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, required=True)
    args = ap.parse_args()

    graft.connect(host=args.host, port=args.port)
    graft.load_db(db_name="cdb", db_path=tempfile.mkdtemp(prefix="graft_pyconc_"))
    graft.use_db("cdb")
    code, resp = graft.create_table(
        table_name="MyTable",
        table_fields=[
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
            {"name": "Embedding", "dataType": "VECTOR_FLOAT", "dimensions": 4,
             "metricType": "EUCLIDEAN"},
        ],
    )
    assert code == 200, resp
    code, resp = graft.insert(table_name="MyTable", records=[
        {"ID": 1, "Doc": "Berlin", "Embedding": [0.05, 0.61, 0.76, 0.74]},
        {"ID": 2, "Doc": "London", "Embedding": [0.19, 0.81, 0.75, 0.11]},
        {"ID": 3, "Doc": "Moscow", "Embedding": [0.36, 0.55, 0.47, 0.94]},
        {"ID": 4, "Doc": "San Francisco", "Embedding": [0.18, 0.01, 0.85, 0.80]},
        {"ID": 5, "Doc": "Shanghai", "Embedding": [0.24, 0.18, 0.22, 0.44]},
    ])
    assert code == 200, resp

    failures = []
    lock = threading.Lock()

    def reader():
        code, resp = graft.query(
            table_name="MyTable", query_field="Embedding",
            response_fields=["Doc"], query_vector=[0.35, 0.55, 0.47, 0.94],
            limit=2, with_distance=True)
        ok = (code == 200 and len(resp.get("result", [])) == 2
              and resp["result"][0]["@distance"] <= resp["result"][1]["@distance"])
        if not ok:
            with lock:
                failures.append((code, resp))

    def writer(round_no):
        # unique new PKs so every round inserts fresh rows mid-queries
        base = 100 + round_no * 10
        code, resp = graft.insert(table_name="MyTable", records=[
            {"ID": base + j, "Doc": "w%d" % (base + j),
             "Embedding": [j * 0.1, 0.5, 0.5, 0.5]} for j in range(3)])
        if code != 200:
            with lock:
                failures.append((code, resp))

    for r in range(10):
        threads = [threading.Thread(target=reader) for _ in range(10)]
        threads.append(threading.Thread(target=writer, args=(r,)))
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    if failures:
        print("FAIL: %d bad responses, first: %s" % (len(failures), failures[0]))
        sys.exit(1)

    # all writer rows landed (10 rounds x 3 rows + 5 seed rows)
    code, resp = graft.statistics()
    total = resp["result"][0]["totalRecords"]
    if total != 35:
        print("FAIL: expected 35 rows after concurrent writes, got", total)
        sys.exit(1)

    graft.drop_db("cdb")
    print("concurrent_smoke OK")


if __name__ == "__main__":
    main()
