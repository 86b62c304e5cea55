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


def fresh_dir(d: str) -> str:
    """Always rebuild the sweep corpus from scratch: a stale directory
    (edited ROWS, or a run interrupted mid-write) would otherwise be
    silently reused and green-light data that no longer matches the
    fixtures. The tables are tiny — regeneration costs seconds."""
    shutil.rmtree(d, ignore_errors=True)
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
