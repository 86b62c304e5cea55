#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle at the given
sf dir (default sf0.01 — the scale the driver verifies at), compares
row count, column names, and the order-insensitive value multiset, and
prints one line per query. Use before hand-off so scale-dependent
parity breaks (regex engines, rounding ties, convergence counts) never
reach the real gate.

    python scripts/local_gate.py [sf_dir] [only_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velox_hadoop_spark.catalog import TABLES  # noqa: E402
from velox_hadoop_spark.plans import registry  # noqa: E402
from velox_hadoop_spark.session import get_spark  # noqa: E402


# Spark simpleString dtype -> acceptable DuckDB/Arrow physical types.  The
# driver's value hash is type-sensitive (DuckDB HUGEINT arrives as
# decimal128(38,0) where Spark emits int64), so value-equal results can still
# hash-mismatch.  fetchall() erases that (both become Python int), which is
# how two HUGEINT oracles slipped past this gate in round 2 — compare the
# Arrow schema explicitly instead.
_ARROW_OK = {
    "bigint": {"int64"},
    "int": {"int32"},
    "smallint": {"int16"},
    "tinyint": {"int8"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32[day]"},
}


def _type_mismatches(sdf_dtypes, arrow_schema):
    duck_types = {f.name: str(f.type) for f in arrow_schema}
    bad = []
    for col, spark_t in sdf_dtypes:
        allowed = _ARROW_OK.get(spark_t)
        duck_t = duck_types.get(col)
        if allowed is not None and duck_t is not None and duck_t not in allowed:
            bad.append(f"{col}: spark={spark_t} duck={duck_t}")
    return bad


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple, dict)):
        # The DRIVER's pandas canonicalizer throws on unhashable list/dict
        # values (round-3 inverted_index_tokens red row); tupling them here
        # would make this gate more permissive than the real one. Fail the
        # query instead — repo convention is array_join to a CSV string.
        raise TypeError(
            f"top-level nested value {type(v).__name__} in result — driver"
            " canonicalizer cannot sort it; array_join to CSV instead"
        )
    return v


def _multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(row[i]) for i in idx) for row in rows), key=repr
    ), [cols[i] for i in idx]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="local-gate")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, spec in registry.specs().items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if spec.oracle is None:
                ok = len(srows) > 0
                n_rows_only += 1
                print(f"{'ROWS' if ok else 'FAIL'}  {name} (rows-only, {len(srows)} rows)")
                continue
            ddf = duck.sql(spec.oracle)
            arrow_schema = duck.sql(spec.oracle).arrow().schema
            drows = ddf.fetchall()
            dcols = [d[0] for d in ddf.description]
            s_set, s_cols = _multiset(scols, srows)
            d_set, d_cols = _multiset(dcols, drows)
            type_bad = _type_mismatches(sdf.dtypes, arrow_schema)
            if type_bad:
                n_fail += 1
                print(f"FAIL  {name}: type-class {type_bad}")
            elif s_cols != d_cols:
                n_fail += 1
                print(f"FAIL  {name}: cols spark={s_cols} duck={d_cols}")
            elif len(s_set) != len(d_set):
                n_fail += 1
                print(f"FAIL  {name}: rows spark={len(s_set)} duck={len(d_set)}")
            elif s_set != d_set:
                n_fail += 1
                diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:2]
                print(f"FAIL  {name}: values differ; first {diff}")
            else:
                n_pass += 1
                print(f"pass  {name} ({len(s_set)} rows)")
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL  {name}: {type(exc).__name__}: {str(exc)[:200]}")
        finally:
            spark.catalog.clearCache()
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
