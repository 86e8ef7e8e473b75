#!/usr/bin/env python3
"""Convert local_verify.py stdout into a committable JSON artifact.

Usage: python3 scripts/local_verify.py <sfDir> <outDir> [q ...] \
         | python3 scripts/verify_to_json.py <sfDir> > CORRECTNESS_sf01.json

The artifact records the scale dir, per-query pass/fail, and the counts,
so a committed sf0.1 oracle pass is interpretable from the file alone.
"""
import json
import sys

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ""
    queries = {}
    for line in sys.stdin:
        line = line.strip()
        for verdict in ("PASS", "FAIL"):
            if line.startswith(verdict + " "):
                queries[line.split()[1]] = verdict.lower()
    n_pass = sum(1 for v in queries.values() if v == "pass")
    print(json.dumps({
        "metric": "oracle_pass", "sf": sf_dir,
        "query_count": len(queries), "pass": n_pass,
        "fail": len(queries) - n_pass, "queries": queries,
    }, sort_keys=True))
    return 0 if queries and n_pass == len(queries) else 1

if __name__ == "__main__":
    sys.exit(main())
