"""Shared harness for the full-registry cross-engine sweeps.

scripts/empty_sweep.py and scripts/degenerate_sweep.py differ only in
the corpus they build and the documented known-divergent set; the
registry iteration, DuckDB view setup, multiset compare, and BAD
reporting live here so the two sweeps cannot drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from local_gate import _multiset  # noqa: E402

from velox_hadoop_spark.plans import registry  # noqa: E402

# The driver-table DDL the sweeps (and tests/test_round7_parity.py)
# build their synthetic corpora from. Canonical home is HERE, not the
# test module: importing a tests/ module from the sweep scripts would
# transitively import tests/conftest.py, whose VHS_ORACLE_LINT=1
# side effect makes registry loading schema-probe every oracle against
# /root/testdata — a cost (and testdata dependency) the standalone
# sweeps must not pay.
TABLE_SCHEMAS = {
    "region": "r_regionkey long, r_name string",
    "nation": "n_nationkey long, n_name string, n_regionkey long",
    "customer": "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    "supplier": "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    "part": "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    "orders": "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz"
    ),
    "events": "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    "documents": "doc_id long, text string, lang string, source string, n_chars long",
    "embeddings": "vec_id long, embedding array<float>, label int",
}


def fresh_dir(d: str) -> str:
    """Always rebuild the sweep corpus from scratch: a stale directory
    (edited ROWS, or a run interrupted mid-write) would otherwise be
    silently reused and green-light data that no longer matches the
    fixtures. The tables are tiny — regeneration costs seconds.
    Removal failures propagate (no ignore_errors): a partially-removed
    or irremovable corpus dir must abort the sweep loudly, not
    resurface as a misleading FileExistsError from makedirs."""
    if os.path.lexists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    return d


def run_sweep(spark, corpus_dir: str, table_names, known_divergent) -> int:
    """Run every oracled registry query cross-engine on ``corpus_dir``.

    One DuckDB connection serves the whole sweep (the views point at
    static parquet paths, and a failing query does not invalidate the
    connection), so no per-query connection can leak on the error path.
    Returns a process exit code: 0 iff no divergence outside
    ``known_divergent``.
    """
    con = duckdb.connect()
    try:
        for t in table_names:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"parquet_scan('{corpus_dir}/{t}.parquet/*.parquet')"
            )
        bad = []
        n_ok = n_known = 0
        for name, spec in sorted(registry.specs().items()):
            if spec.oracle is None:
                continue
            if name in known_divergent:
                n_known += 1
                continue
            try:
                sdf = spec.fn(spark, corpus_dir)
                srows = [tuple(r) for r in sdf.collect()]
                rel = con.sql(spec.oracle)
                drows = rel.fetchall()
                dcols = [dd[0] for dd in rel.description]
                s_set, s_cols = _multiset(sdf.columns, srows)
                d_set, d_cols = _multiset(dcols, drows)
                if s_cols != d_cols or s_set != d_set:
                    bad.append(
                        (name, "mismatch", f"spark n={len(s_set)} duck n={len(d_set)}")
                    )
                else:
                    n_ok += 1
            except Exception as e:  # noqa: BLE001
                bad.append((name, type(e).__name__, str(e).split(chr(10))[0][:160]))
    finally:
        con.close()

    print(f"{n_ok} ok, {n_known} known-divergent (documented), {len(bad)} BAD")
    for name, kind, detail in bad:
        print(f"BAD  {name}: {kind}: {detail}")
    return 1 if bad else 0
