"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
exact equality). Stricter-or-equal to the driver's hash check — if this
passes, the driver's hash matches.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, spark_df, oracle_rows: pd.DataFrame) -> list[str]:
    errs = []
    sp = spark_df.toPandas()
    if len(sp) != len(oracle_rows):
        errs.append(f"row count: spark={len(sp)} oracle={len(oracle_rows)}")
    if sorted(sp.columns) != sorted(oracle_rows.columns):
        errs.append(f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_rows.columns)}")
    if errs:
        return errs
    a, b = _canon(sp), _canon(oracle_rows)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                import numpy as np

                ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            else:
                ok = av.where(~av.isna(), None).tolist() == bv.where(~bv.isna(), None).tolist()
        except Exception as e:  # noqa: BLE001
            ok, av, bv = False, av, bv
            errs.append(f"col {c}: compare error {e}")
            continue
        if not ok:
            mism = (av.astype(str) != bv.astype(str))
            idx = mism[mism].index[:3].tolist()
            errs.append(f"col {c}: value mismatch at sorted rows {idx}: spark={av.iloc[idx[0] if idx else 0]!r} oracle={bv.iloc[idx[0] if idx else 0]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from beholder_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            if sql is None:
                n = sdf.count()
                print(f"  {name}: OK(rows-only) rows={n}")
                continue
            odf = con.execute(sql).df()
            errs = compare(name, sdf, odf)
        except Exception as e:  # noqa: BLE001
            errs = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if errs:
            n_fail += 1
            print(f"  {name}: FAIL")
            for e in errs:
                print(f"    - {e}")
        else:
            print(f"  {name}: OK")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'} ({n_fail} failing)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
