"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = _guess_sf(sf_dir)

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.session import (
        build_session,
    )

    spark = build_session(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in plans.all_specs().items() if s.bench}

    def force(df) -> None:
        # .count() lets Catalyst prune every unreferenced projection, so
        # projection-heavy queries would be under-measured. The noop sink
        # materializes every output column (full codegen + serialization)
        # while still writing nothing.
        df.write.format("noop").mode("overwrite").save()

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        clear_intermediate_cache,
    )

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        # Warm run first (JVM/codegen/parquet footers), then measure the
        # steady-state execution — what a resident cluster would see.
        # The dedup chain's session-persisted intermediates are cleared
        # before each run so every measurement pays the full cold cost
        # (numbers stay comparable with the pre-seam baselines).
        clear_intermediate_cache()
        force(spec.build(spark, sf_dir))
        clear_intermediate_cache()
        t0 = time.perf_counter()
        force(spec.build(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


def _guess_sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


if __name__ == "__main__":
    raise SystemExit(main())
