"""Local simulation of the driver's correctness gate: run each queries()
entry at sf0.01 and compare row count, schema, and order-insensitive value
hash against oracle_sql() via DuckDB.  Not part of the library."""

import hashlib
import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)].copy()
    # normalize types for hashing like the driver plausibly does
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()
    return len(df), tuple(df.columns), h


def main(sf_dir="/root/testdata/sf0.01", only=None):
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = pd.DataFrame(res)
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            fails += 1
            continue
        wall = time.time() - t0
        if name not in os_:
            print(f"ok?  {name}: rows={len(res)} (rows-only, no oracle) [{wall:.1f}s]")
            continue
        try:
            ora = con.execute(os_[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            fails += 1
            continue
        rn, rc, rh = canon(res)
        on, oc, oh = canon(ora)
        status = "PASS" if (rn, rc, rh) == (on, oc, oh) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"FAIL {name}: ray(rows={rn}, cols={rc}) vs oracle(rows={on}, cols={oc}) hash_eq={rh == oh}")
        else:
            print(f"PASS {name}: rows={rn} [{wall:.1f}s]")
    ray.shutdown()
    return fails


if __name__ == "__main__":
    only = set(sys.argv[1:]) or None
    sys.exit(1 if main(only=only) else 0)
