"""Layout sink proof: row-group min/max pruning measured from parquet
footers — the engine-neutral fact any pruner consumes."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.sinks.layout import (
    write_clustered,
    write_zordered,
)
from tdk_apache_log_etl_spark.sources.tables import load_table

from .conftest import SF_DIR_CORRECT

N_FILES = 16


def touched(path: str, col: str, lo, hi):
    """(row groups whose [min,max] intersects [lo,hi], total row groups)
    across every parquet part file under path."""
    ds = pq.ParquetDataset(path)
    hit = total = 0
    for frag in ds.fragments:
        md = frag.metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx[col]).statistics
            total += 1
            if st is None or not st.has_min_max:
                hit += 1  # no stats = can't prune = touched
            elif not (st.max < lo or st.min > hi):
                hit += 1
    return hit, total


@pytest.fixture(scope="module")
def facts(spark):
    ev = load_table(spark, SF_DIR_CORRECT, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .select(
            F.unix_date(F.to_date("ts")).cast("long").alias("day"),
            "value",
        )
    )


def _bounds(facts):
    r = facts.agg(
        F.min("value").alias("vlo"),
        F.max("value").alias("vhi"),
        F.min("day").alias("dlo"),
        F.max("day").alias("dhi"),
    ).collect()[0]
    return r["vlo"], r["vhi"], r["dlo"], r["dhi"]


def test_clustered_write_prunes_where_baseline_cannot(facts, tmp_path):
    vlo, vhi, _, _ = _bounds(facts)
    base, clus = str(tmp_path / "base"), str(tmp_path / "clustered")
    facts.repartition(N_FILES).write.mode("overwrite").parquet(base)
    write_clustered(facts, clus, "value", n_files=N_FILES)
    # a 2%-of-range value slice
    lo = vlo + 0.49 * (vhi - vlo)
    hi = vlo + 0.51 * (vhi - vlo)
    b_hit, b_tot = touched(base, "value", lo, hi)
    c_hit, c_tot = touched(clus, "value", lo, hi)
    assert b_hit == b_tot, "unsorted baseline should touch every row group"
    assert c_hit <= max(2, c_tot // 4), (c_hit, c_tot)
    # correctness: same rows come back from the clustered copy
    spark = facts.sparkSession
    n_src = facts.filter(F.col("value").between(lo, hi)).count()
    n_clus = (
        spark.read.parquet(clus)
        .filter(F.col("value").between(lo, hi))
        .count()
    )
    assert n_src == n_clus


def test_zorder_prunes_on_both_dimensions(facts, tmp_path):
    vlo, vhi, dlo, dhi = _bounds(facts)
    bysort, byz = str(tmp_path / "sorted_day"), str(tmp_path / "zorder")
    # single-column clustering on day: the layout that CANNOT prune value
    write_clustered(facts, bysort, "day", n_files=N_FILES)
    write_zordered(facts, byz, ["day", "value"], n_files=N_FILES)
    v_lo = vlo + 0.45 * (vhi - vlo)
    v_hi = vlo + 0.55 * (vhi - vlo)
    d_mid = (dlo + dhi) // 2
    # value predicate: day-sorted layout touches ~all, z-order must prune
    s_hit, s_tot = touched(bysort, "value", v_lo, v_hi)
    z_hit, z_tot = touched(byz, "value", v_lo, v_hi)
    assert s_hit >= s_tot - 1, "day-sort can't prune on value"
    assert z_hit <= (2 * z_tot) // 3, (z_hit, z_tot)
    # day predicate: z-order must still prune (unlike a value-only sort)
    zd_hit, zd_tot = touched(byz, "day", d_mid, d_mid + 1)
    assert zd_hit <= (2 * zd_tot) // 3, (zd_hit, zd_tot)
    # correctness round-trip on the 2-D slice
    spark = facts.sparkSession
    pred = F.col("value").between(v_lo, v_hi) & F.col("day").between(
        d_mid, d_mid + 1
    )
    assert (
        facts.filter(pred).count()
        == spark.read.parquet(byz).filter(pred).count()
    )
