#!/usr/bin/env python
"""Static-ish lint for the DuckDB oracle strings: the HUGEINT class.

DuckDB's count_if() / sum(<integer>) return HUGEINT (int128), which
reaches the driver's Arrow hash as decimal128(38,0) while Spark emits
int64 — so value-identical results hash-mismatch (two round-2 gate
failures were exactly this). Every oracle must therefore cast such
aggregates to BIGINT/INTEGER explicitly.

This lint runs each registered oracle against the sf0.001 views and
fails if ANY output column materializes as hugeint/int128/decimal128 —
catching the class at commit time instead of at the driver gate. Pure
schema probe: each query runs once at the smallest SF (LIMIT 0 is not
used because DuckDB still types the full projection without it being
materially slower at this scale).

    python scripts/lint_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velox_hadoop_spark.catalog import TABLES  # noqa: E402
from velox_hadoop_spark.plans import registry  # noqa: E402

BAD_TYPES = ("hugeint", "int128", "decimal128(38, 0)", "decimal128(38,0)")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name, spec in registry.specs().items():
        if spec.oracle is None:
            continue
        try:
            schema = duck.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0").arrow().schema
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle does not parse: {str(exc)[:120]}")
            n_bad += 1
            continue
        bad = [
            f"{f.name}:{f.type}"
            for f in schema
            if any(b in str(f.type).lower() for b in BAD_TYPES)
        ]
        if bad:
            n_bad += 1
            print(f"FAIL  {name}: un-cast wide-integer columns {bad}")
    print(f"{'OK' if n_bad == 0 else 'BAD'}: {n_bad} oracles with HUGEINT-class outputs")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
