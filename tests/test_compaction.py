"""Sink-side lake maintenance: compaction file counts, clustering
disjointness, content preservation."""

from __future__ import annotations

import glob

from etl_pack_spark.sinks.compaction import compact
from etl_pack_spark.sources.reader import read_table


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem")
    frag = str(tmp_path / "frag")
    li.repartition(40).write.parquet(frag)  # simulate many small appends
    out = str(tmp_path / "compacted")
    stats = compact(spark, frag, out, target_file_mb=256)
    assert stats.in_files == 40
    assert stats.out_files < 40
    assert spark.read.parquet(out).count() == li.count()


def test_compact_clustering_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem")
    frag = str(tmp_path / "frag")
    li.repartition(16).write.parquet(frag)
    out = str(tmp_path / "clustered")
    compact(spark, frag, out, target_file_mb=0.05, cluster_by=["l_shipdate"])
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 2
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(
            {"l_shipdate": "min"}
        ).collect()[0][0], spark.read.parquet(f).agg({"l_shipdate": "max"}).collect()[0][0]
        ranges.append(r)
    ranges.sort()
    # range clustering ⇒ per-file key ranges overlap at most at boundaries
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
