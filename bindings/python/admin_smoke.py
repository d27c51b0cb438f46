#!/usr/bin/env python3
"""Smoke test for the round-10 admin/parity routes through the Python
binding: describe_table, load_csv, dump_db, release_db, set_leader and
update_config (reference: web_controller.hpp DescribeSchema/DumpDB/
ReleaseDB/SetLeader/UpdateConfig/LoadCSV). Exits non-zero on failure.

Usage: admin_smoke.py --port <port> [--host localhost]
"""

import argparse
import os
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
    code, resp = graft.load_db(db_name="admindb",
                               db_path=tempfile.mkdtemp(prefix="graft_admin_"))
    check(code == 200, "load_db: %s" % resp)
    graft.use_db("admindb")

    code, resp = graft.create_table(
        table_name="T",
        table_fields=[
            {"name": "ID", "dataType": "BIGINT", "primaryKey": True},
            {"name": "Lang", "dataType": "STRING"},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 4,
             "metricType": "COSINE"}])
    check(code == 200, "create_table: %s" % resp)

    # describe: schema round-trips in the catalog shape
    code, resp = graft.describe_table("T")
    check(code == 200, "describe: %s" % resp)
    schema = resp["result"]["schema"]
    check(schema["name"] == "T", "describe name: %s" % resp)
    vec = [f for f in schema["fields"] if f["name"] == "V"][0]
    check(vec["dataType"] == "VECTOR_FLOAT" and vec["dimensions"] == 4
          and vec["metricType"] == "COSINE", "describe vector field: %s" % resp)
    check(resp["result"]["indexes"] == [], "no index yet: %s" % resp)

    # CSV load into the scalar columns (vector column stays null-free by
    # being absent from the CSV? -> vectors can't ride CSV; use a
    # scalar-only table for the load test)
    code, resp = graft.create_table(
        table_name="C",
        table_fields=[
            {"name": "ID", "dataType": "BIGINT", "primaryKey": True},
            {"name": "Lang", "dataType": "STRING"}])
    check(code == 200, "create_table C: %s" % resp)
    fd, csv_path = tempfile.mkstemp(suffix=".csv")
    with os.fdopen(fd, "w") as f:
        f.write("ID,Lang\n1,en\n2,de\n1,xx\n")
    code, resp = graft.load_csv("C", csv_path)
    check(code == 200 and resp["result"]["inserted"] == 2
          and resp["result"]["skipped"] == 1, "load_csv: %s" % resp)

    # dump: the exported snapshot lands under path
    out = tempfile.mkdtemp(prefix="graft_admin_dump_")
    code, resp = graft.dump_db("admindb", out)
    check(code == 200, "dump_db: %s" % resp)
    check(os.path.exists(os.path.join(out, "C", "schema.json")),
          "dump wrote schema.json")
    code, resp = graft.dump_db("ghost", out)
    check(code == 404, "dump unknown db must 404: %s" % resp)

    # release then re-query: cold reopen answers identically
    code, resp = graft.release_db("admindb")
    check(code == 200, "release_db: %s" % resp)
    code, resp = graft.get(table_name="C", response_fields=["ID", "Lang"],
                           filter="Lang = 'de'")
    check(code == 200 and len(resp["result"]) == 1
          and resp["result"][0]["ID"] == 2, "post-release get: %s" % resp)

    # leader flag + config (reference ranges enforced)
    code, resp = graft.set_leader(False)
    check(code == 200, "set_leader false: %s" % resp)
    code, resp = graft.set_leader(True)
    check(code == 200, "set_leader true: %s" % resp)
    code, resp = graft.update_config(IntraQueryThreads=8, PreFilter=True)
    check(code == 200, "update_config: %s" % resp)
    code, resp = graft.update_config(IntraQueryThreads=0)
    check(code == 500 and "valid range" in resp["message"],
          "out-of-range config must 500: %s" % resp)

    graft.drop_db("admindb")
    print("admin_smoke OK")


if __name__ == "__main__":
    main()
