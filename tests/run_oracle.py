"""Run the full DuckDB-oracle gate locally (the driver's CORRECTNESS
check, replicated): every registry query at the given sf dir, Spark vs
oracle SQL. Usage: python tests/run_oracle.py [sf_dir] [name_filter...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    first_n = None
    if "--first" in args:
        i = args.index("--first")
        first_n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filters = args[1:]

    from oracle_harness import compare, duckdb_conn

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.session import (
        build_session,
    )

    spark = build_session(app_name="oracle-gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)

    specs = plans.all_specs()
    if first_n is not None:
        specs = dict(list(specs.items())[:first_n])
    if name_filters:
        specs = {
            n: s for n, s in specs.items() if any(f in n for f in name_filters)
        }
    n_ok = n_bad = n_rows_only = 0
    for name, spec in specs.items():
        t0 = time.perf_counter()
        try:
            df = spec.build(spark, sf_dir)
            if spec.oracle is None:
                cnt = df.count()
                status = f"rows-only ({cnt} rows)"
                n_rows_only += 1
                ok = cnt >= 0
            else:
                res = compare(name, df, con, spec.oracle)
                ok = res.strict_ok
                status = (
                    "OK"
                    if ok
                    else f"FAIL {res.detail[:250]} {('DTYPE ' + res.dtype_detail) if not res.dtypes_match else ''}"
                )
        except Exception as e:  # noqa: BLE001
            ok, status = False, f"ERROR {type(e).__name__}: {str(e)[:300]}"
        dt = time.perf_counter() - t0
        if ok:
            n_ok += 1
        else:
            n_bad += 1
        print(f"{'PASS' if ok else 'FAIL':4} {name:32} {dt:6.2f}s  {status}")
    print(
        f"\n{n_ok} pass ({n_rows_only} rows-only), {n_bad} fail, "
        f"{len(specs)} total at {sf_dir}"
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
