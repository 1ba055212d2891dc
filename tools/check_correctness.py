"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB against the
same parquet tables, then compares row count, column names, and values
order-insensitively (exact for ints/strings/timestamps, bit-exact expected for
doubles thanks to the DECIMAL-cast discipline; any float divergence is
reported with max abs diff).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort")
    except Exception:
        df = df.sort_values(sort_cols, kind="mergesort", key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_df), normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv_f = sv.astype(float)
            ov_f = ov.astype(float)
            both_nan = sv_f.isna() & ov_f.isna()
            eq = (sv_f == ov_f) | both_nan
            if not eq.all():
                diff = (sv_f - ov_f).abs().max()
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, max abs diff {diff}")
        else:
            sv_n = sv.where(pd.notna(sv), None)
            ov_n = ov.where(pd.notna(ov), None)
            eq = (sv_n.astype(object) == ov_n.astype(object)) | (sv_n.isna() & ov_n.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {idx}: "
                    f"spark={sv_n.iloc[idx]!r} oracle={ov_n.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from milan_spark.catalog import oracle_sql, queries
    from milan_spark.session import get_spark, release_cached

    spark = get_spark("check_correctness")
    con = duckdb_con(sf_dir)
    qs, oracles = queries(), oracle_sql()

    failures = 0
    for name, build in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = build(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # multi-pass operators persist intermediates; don't let 68
            # queries' caches stack up in one session
            release_cached(spark)
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: rows={len(sdf)}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
