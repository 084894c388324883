"""Local stand-in for the driver's correctness gate.

Runs each queries() callable at a given sf and compares against its
oracle_sql() (row count, schema names, order-insensitive value hash on
name-sorted columns) via DuckDB. Usage:

    python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(str)
    order = df.apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[order.argsort(kind="stable")].reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in normalize(df).itertuples(index=False):
        h.update("\x00".join(map(str, row)).encode())
        h.update(b"\x01")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                df = res.to_pandas()
            else:
                df = pd.DataFrame(res)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(df)} rows)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(df) != len(odf):
            problems.append(f"rows {len(df)} != {len(odf)}")
        if sorted(df.columns) != sorted(odf.columns):
            problems.append(f"schema {sorted(df.columns)} != {sorted(odf.columns)}")
        elif value_hash(df) != value_hash(odf):
            problems.append("value hash mismatch")
            a, b = normalize(df), normalize(odf)
            if len(a) == len(b):
                diff = (a != b).any(axis=1)
                idx = diff[diff].index[:3]
                for i in idx:
                    problems.append(f"  ray[{i}]={a.iloc[i].to_dict()}")
                    problems.append(f"  ora[{i}]={b.iloc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"     {p}")
            failures += 1
        else:
            print(f"ok   {name}: {len(df)} rows MATCH")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
