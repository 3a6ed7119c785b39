"""Local stand-in for the driver's correctness gate.

Runs every __ray_entry__ query and its DuckDB oracle on the same sf dir and
compares row count, column names, and order-insensitive values (sorted by
all columns). Usage: python scripts/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) in ("UInt64", "uint64"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    # unify integer dtypes
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    from ehr_relation_extraction_ray.functions import logquiet

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
            runtime_env=logquiet.runtime_env(),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # surface the real UDF exception instead of UserCodeException wrappers
    DataContext.get_current().raise_original_map_exception = True

    from ehr_relation_extraction_ray.functions import logquiet

    logquiet.install()

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = pd.DataFrame(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {exc!r}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {exc!r}")
            failures.append(name)
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            failures.append(name)
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            failures.append(name)
        elif not g.equals(e):
            neq = (g != e).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first:")
            print(pd.concat([g[neq].head(3), e[neq].head(3)], keys=["ray", "sql"]))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(g)} rows match ({dt:.1f}s)")

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
