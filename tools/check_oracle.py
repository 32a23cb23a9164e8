#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
registered query on Spark AND its DuckDB oracle over the same parquet,
compare row count, schema width, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb


def normalize(rows) -> list[tuple]:
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(round(v, 6))
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import (
        TESTDATA_TABLES,
        build_session,
        table_path,
    )
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.queries import load_all

    spark = build_session(app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    registry = load_all()
    failures = []
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.builder(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            s_norm = normalize(
                [tuple(r[c] for c in scols) for r in srows]
            )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols_raw = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ocols = sorted(ocols_raw)
            idx = [ocols_raw.index(c) for c in ocols]
            o_norm = normalize([tuple(r[i] for i in idx) for r in orows])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={scols} duck={ocols}")
        elif len(s_norm) != len(o_norm):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_norm)} duck={len(o_norm)}")
        elif s_norm != o_norm:
            failures.append(name)
            diff = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
        else:
            print(f"ok   {name}: {len(s_norm)} rows match")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
