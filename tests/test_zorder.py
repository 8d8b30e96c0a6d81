"""Locality + data-skipping proofs for p19's Z-order clustering.

The oracle certifies the Morton curve bit-for-bit; what it cannot show
is that the curve buys anything. Pinned here:

- every top-6-bit z-bucket's envelope is a <= 512-wide rectangle in
  BOTH dimensions (the defining property of the curve: contiguous
  z-ranges are small axis-aligned boxes), while a 1-D customer sort's
  equal-count buckets span nearly the FULL ~2400-day date range;
- written as a z-clustered parquet layout, a predicate on the
  NON-LEADING dimension (a date band) prunes most files on FOOTER
  min/max stats alone — the exact mechanism row-group skipping uses —
  while the customer-sorted layout can prune none of them.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_ORACLE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import get_spec
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
    _z_value,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def _keyed_orders(spark):
    o = load_table(spark, SF_ORACLE, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    return o.select(
        (F.col("o_custkey") % 4096).cast("long").alias("ck"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1995-01-01").cast("date"),
            )
            % 4096
        )
        .cast("long")
        .alias("dy"),
    )


def test_zbuckets_are_small_rectangles_in_both_dims(spark):
    rows = get_spec("p19_zorder_clustering").build(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.max_ck - r.min_ck <= 512, f"bucket {r.bucket} ck span"
        assert r.max_day - r.min_day <= 512, f"bucket {r.bucket} day span"

    # the 1-D comparison: 64 equal-count buckets of the customer sort
    # cover narrow customers but (nearly) the whole date range each
    keyed = _keyed_orders(spark)
    oned = (
        keyed.withColumn(
            "bucket", F.ntile(64).over(Window.orderBy("ck", "dy"))
        )
        .groupBy("bucket")
        .agg((F.max("dy") - F.min("dy")).alias("day_span"))
        .collect()
    )
    wide = [r for r in oned if r.day_span >= 2000]
    assert len(wide) >= 0.9 * len(oned), (
        "customer-sorted buckets unexpectedly date-local — testdata changed?"
    )


def _footer_envelopes(path: str) -> list[dict[str, int]]:
    envs = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if name in ("ck", "dy") and st is not None:
                    lo[name] = min(lo.get(name, st.min), st.min)
                    hi[name] = max(hi.get(name, st.max), st.max)
        if lo:
            envs.append(
                {"ck_min": lo["ck"], "ck_max": hi["ck"],
                 "dy_min": lo["dy"], "dy_max": hi["dy"]}
            )
    return envs


def test_zorder_layout_prunes_on_footer_stats(spark, tmp_path):
    keyed = _keyed_orders(spark).withColumn(
        "z", _z_value(F.col("ck"), F.col("dy"))
    )
    zdir = str(tmp_path / "zsorted")
    cdir = str(tmp_path / "csorted")
    keyed.repartitionByRange(32, "z").sortWithinPartitions("z").write.mode(
        "overwrite"
    ).parquet(zdir)
    keyed.repartitionByRange(32, "ck", "dy").sortWithinPartitions(
        "ck", "dy"
    ).write.mode("overwrite").parquet(cdir)

    z_envs, c_envs = _footer_envelopes(zdir), _footer_envelopes(cdir)
    assert len(z_envs) >= 16 and len(c_envs) >= 16

    # date-band predicate on the NON-leading dim: dy in [512, 1023]
    def hit_fraction(envs, dy_lo=512, dy_hi=1023):
        hits = [e for e in envs if e["dy_max"] >= dy_lo and e["dy_min"] <= dy_hi]
        return len(hits) / len(envs)

    zf, cf = hit_fraction(z_envs), hit_fraction(c_envs)
    assert zf <= 0.5, f"z layout pruned nothing: {zf:.2f} of files hit"
    assert cf >= 0.9, f"1-D layout unexpectedly date-local ({cf:.2f})"

    # 2-D box: customers [0, 511] x days [512, 1023]
    def hit2d(envs):
        hits = [
            e
            for e in envs
            if e["dy_max"] >= 512
            and e["dy_min"] <= 1023
            and e["ck_max"] >= 0
            and e["ck_min"] <= 511
        ]
        return len(hits) / len(envs)

    assert hit2d(z_envs) <= 0.25, (
        f"2-D box should skip >75% of z files, hit {hit2d(z_envs):.2f}"
    )
