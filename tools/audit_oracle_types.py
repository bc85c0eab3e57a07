"""Audit every registered oracle's DuckDB OUTPUT column types.

DuckDB types integer sums as HUGEINT (int128) and ships them to Arrow as
decimal128; Spark has no int128, so a HUGEINT output column hash-mismatches
against Spark's BIGINT even when every value is equal (CORRECTNESS_r01:
null_handling / json_funcs / json_struct_parse / case_when). Same risk for
DECIMAL outputs vs Spark DOUBLE. This script runs each oracle and flags
any output column whose DuckDB type is outside the safe set.

Usage: python tools/audit_oracle_types.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiny_mapreduce_rpc_server_spark.registry import all_queries  # noqa: E402
from tests.oracle_utils import duckdb_connect  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# DuckDB types that round-trip cleanly against Spark results through the
# driver's hasher. Anything else (HUGEINT, DECIMAL, UHUGEINT, ...) is flagged.
SAFE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}


def base_type(t: str) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t.endswith("[]"):
        return "LIST:" + base_type(t[:-2])
    return t


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR, help="testdata dir with the parquet tables")
    args = ap.parse_args()
    con = duckdb_connect(args.sf_dir)
    bad = 0
    checked = 0
    for name, spec in sorted(all_queries().items()):
        if spec.oracle is None:
            continue
        try:
            rel = con.sql(spec.oracle)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: {e}")
            bad += 1
            continue
        checked += 1
        flags = [
            (c, t)
            for c, t in cols
            if base_type(t) not in SAFE and not base_type(t).startswith("LIST:")
        ]
        list_flags = [
            (c, t)
            for c, t in cols
            if base_type(t).startswith("LIST:")
            and base_type(t)[5:] not in SAFE
        ]
        flags += list_flags
        if flags:
            bad += 1
            print(f"FLAG   {name}: " + ", ".join(f"{c}:{t}" for c, t in flags))
    print(f"-- audited {checked} oracles, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
