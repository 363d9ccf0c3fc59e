"""Cross-implementation equivalence + operator unit tests (mirrors the
reference's dask-vs-legacy equivalence suites, test_dask_ewa.py:325)."""

import pytest
from pyspark.sql import functions as F

from pyresample_spark.geometry import AreaDefinition
from pyresample_spark.operators.knn import (
    knn_join,
    knn_join_broadcast,
    with_geocentric,
)
from pyresample_spark.operators.multimodal import (
    decode_image,
    documents_as_media,
    extract_media_meta,
)
from pyresample_spark.operators.reduce import slice_crop
from pyresample_spark.plans.lut import LutCache
from pyresample_spark.plans.planner import Resampler
from pyresample_spark.sources.area_yaml import (
    create_area_def,
    dump_area,
    load_area_from_string,
)


def _pts(spark, rows, id_col="src_id"):
    return spark.createDataFrame(
        rows, f"{id_col} long, lon double, lat double"
    )


def test_knn_cell_vs_broadcast_equivalence(spark):
    """The two kNN strategies must return identical neighbour sets."""
    src = _pts(
        spark,
        [(i, float(-170 + 3 * i), float(-50 + 2 * i)) for i in range(40)],
    )
    tgt = _pts(
        spark,
        [(j, float(-169 + 4 * j), float(-49 + 3 * j)) for j in range(25)],
        id_col="tgt_id",
    )
    cell = knn_join(src, tgt, 500_000.0, k=2).orderBy("tgt_id", "nn_rank")
    bc = knn_join_broadcast(
        with_geocentric(src), with_geocentric(tgt), 500_000.0, k=2
    ).orderBy("tgt_id", "nn_rank")
    a = [(r.tgt_id, r.src_id, round(r.dist_m, 3)) for r in cell.collect()]
    b = [(r.tgt_id, r.src_id, round(r.dist_m, 3)) for r in bc.collect()]
    assert a == b
    assert len(a) > 0


def test_knn_approx_shift2(spark):
    """shift2 approximate tier: results are a subset of the exact k=1
    join (never an invented pair, never a closer-than-exact distance),
    recall is high on a dense cluster, and k>1 is rejected."""
    import pytest

    src = _pts(
        spark,
        [(i, float(10 + 0.11 * (i % 13)), float(40 + 0.13 * (i // 13)))
         for i in range(60)],
    )
    tgt = _pts(
        spark,
        [(j, float(10.05 + 0.12 * (j % 7)), float(40.03 + 0.1 * (j // 7)))
         for j in range(30)],
        id_col="tgt_id",
    )
    exact = {
        r.tgt_id: (r.src_id, round(r.dist_m, 3))
        for r in knn_join(src, tgt, 300_000.0, k=1).collect()
    }
    approx = {
        r.tgt_id: (r.src_id, round(r.dist_m, 3))
        for r in knn_join(
            src, tgt, 300_000.0, k=1, neighbor_scheme="shift2"
        ).collect()
    }
    assert set(approx) <= set(exact)  # coverage ⊆ exact
    # any approx match is a real pair at its true distance: if it names
    # the same src as exact, the distance must agree exactly
    same = [t for t in approx if approx[t][0] == exact[t][0]]
    for t in same:
        assert approx[t][1] == exact[t][1]
    # dense cluster well inside one radius → recall should be high
    assert len(same) / len(exact) >= 0.9
    # k>1: duplicate pairs collapse via collect_set — each (tgt, rank)
    # row is a real exact pair, ranks are dense, no pair repeats
    a3 = knn_join(src, tgt, 300_000.0, k=3,
                  neighbor_scheme="shift2").collect()
    e3 = {
        (r.tgt_id, r.src_id): round(r.dist_m, 3)
        for r in knn_join(src, tgt, 300_000.0, k=3).collect()
    }
    seen_pairs = set()
    by_tgt = {}
    for r in a3:
        assert (r.tgt_id, r.src_id) not in seen_pairs  # no duplicates
        seen_pairs.add((r.tgt_id, r.src_id))
        by_tgt.setdefault(r.tgt_id, []).append(r.nn_rank)
        if (r.tgt_id, r.src_id) in e3:  # distances agree where shared
            assert round(r.dist_m, 3) == e3[(r.tgt_id, r.src_id)]
    for ranks in by_tgt.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # the guarded combinations refuse loudly
    with pytest.raises(ValueError, match="shift2"):
        knn_join(src, tgt, 300_000.0, k=None, neighbor_scheme="shift2")
    with pytest.raises(ValueError, match="shift2"):
        knn_join(src, tgt, 300_000.0, k=2, neighbor_scheme="shift2",
                 packed=False)


def test_knn_respects_radius(spark):
    src = _pts(spark, [(1, 0.0, 0.0)])
    tgt = _pts(spark, [(1, 0.1, 0.0), (2, 10.0, 0.0)], id_col="tgt_id")
    out = knn_join(src, tgt, 50_000.0, k=1).collect()
    assert [r.tgt_id for r in out] == [1]  # 10° away is outside 50 km


def test_slice_crop_bounds():
    area = AreaDefinition("t", "longlat", 85, 80, (-20.0, 20.0, 20.0, 35.0))
    r0, r1, c0, c1 = slice_crop(area, (-5.0, 25.0, 10.0, 32.0))
    assert 0 <= r0 < r1 <= 80 and 0 <= c0 < c1 <= 85
    with pytest.raises(ValueError):
        slice_crop(area, (100.0, 50.0, 110.0, 60.0))


def test_lut_cache_roundtrip(spark, tmp_path):
    cache = LutCache(str(tmp_path))
    df = spark.createDataFrame(
        [(1, 2, 0.5), (3, 4, 1.5)], "tgt_id long, src_id long, dist_m double"
    )
    calls = []

    def compute():
        calls.append(1)
        return df

    k = cache.key("a", "b", 1000.0, 1)
    out1 = cache.get_or_compute(spark, "a", "b", 1000.0, 1, compute)
    out2 = cache.get_or_compute(spark, "a", "b", 1000.0, 1, compute)
    assert len(calls) == 1  # second call served from parquet
    assert sorted(r.tgt_id for r in out2.collect()) == [1, 3]
    assert cache.key("a", "b", 1000.0, 1) == k


def test_lut_cache_concurrency(spark, tmp_path):
    """VERDICT r5 item 4: the writer lockfile + IF-NOT-EXISTS
    registration make a shared cache dir safe across sessions —
    (a) a second session (fresh catalog) re-registers the same key
    over the existing files without rewriting; (b) a reader treats a
    locked (in-flight) key as a miss; (c) a save that loses the race
    waits for the winner and loads its result instead of clobbering;
    (d) a stale lock from a crashed writer is broken."""
    import os
    import time

    cache = LutCache(str(tmp_path))
    df = spark.createDataFrame(
        [(1, 2, 0.5), (3, 4, 1.5)], "tgt_id long, src_id long, dist_m double"
    )
    key = cache.key("a", "b", 1000.0, 1)
    cache.get_or_compute(spark, "a", "b", 1000.0, 1, lambda: df)
    # (a) simulate a brand-new session: drop the catalog entry, keep
    # the files; load() must CREATE TABLE IF NOT EXISTS over them and
    # recover the bucketed layout
    spark.sql(f"DROP TABLE IF EXISTS {cache._table(key)}")
    reloaded = cache.load(spark, key)
    assert sorted(r.tgt_id for r in reloaded.collect()) == [1, 3]
    agg_plan = (
        reloaded.groupBy("tgt_id").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in agg_plan, agg_plan  # bucketing recovered
    # ...and a second load with the table already registered is a hit
    assert cache.load(spark, key) is not None
    # (b) a lock in flight = miss for readers
    lock = cache._lock_path(key)
    open(lock, "w").write("123@0")
    assert cache.load(spark, key) is None
    # (c) a losing save() queues on the lock: release it from a timer
    # thread; the loser must LOAD the winner's rows, not write its own
    import threading

    other = spark.createDataFrame(
        [(9, 9, 9.0)], "tgt_id long, src_id long, dist_m double"
    )
    threading.Timer(1.0, os.unlink, args=(lock,)).start()
    t0 = time.monotonic()
    out = cache.save(other, key)
    assert time.monotonic() - t0 >= 0.9  # actually waited
    assert sorted(r.tgt_id for r in out.collect()) == [1, 3]
    # (d) stale lock (crashed writer) is broken by a waiting save
    open(lock, "w").write("123@0")
    os.utime(lock, (time.time() - 10_000, time.time() - 10_000))
    out = cache.save(other, key)
    assert not os.path.exists(lock)
    assert sorted(r.tgt_id for r in out.collect()) == [1, 3]


def test_lut_cache_crash_safety(spark, tmp_path):
    """ADVICE r6: (a) a partial parquet dir with neither sidecar nor
    _SUCCESS marker (first-time writer killed hard) reads as a MISS,
    never as truncated data; (b) breaking a stale lock deletes that
    partial dir; (c) a live same-host writer's lock is NOT broken even
    when its mtime is stale (pid-liveness guard), while a dead owner's
    is; (d) save() heartbeats the lock mtime while materializing."""
    import os
    import socket
    import time

    from pyresample_spark.plans import lut as lut_mod

    cache = LutCache(str(tmp_path))
    key = cache.key("a", "b", 1000.0, 1)
    # (a) fabricate a crashed first-time write: parquet dir with a
    # part file but no _SUCCESS, no meta, no lock
    p = cache.path(key)
    os.makedirs(p)
    open(os.path.join(p, "part-00000.parquet"), "wb").write(b"garbage")
    assert cache.load(spark, key) is None
    # (b) now with a stale lock from a DEAD pid: save() must break the
    # lock, delete the partial dir, and write fresh data
    lock = cache._lock_path(key)
    open(lock, "w").write(f"999999@{socket.gethostname()}@0")
    os.utime(lock, (time.time() - 10_000,) * 2)
    df = spark.createDataFrame(
        [(1, 2, 0.5)], "tgt_id long, src_id long, dist_m double"
    )
    out = cache.save(df, key)
    assert [r.tgt_id for r in out.collect()] == [1]
    assert os.path.exists(cache._meta_path(key))
    # (c) a stale-mtime lock whose owner is THIS live process is left
    # alone (below the hard backstop): the waiter keeps polling
    # instead of clobbering
    key2 = cache.key("c", "d", 1000.0, 1)
    lock2 = cache._lock_path(key2)
    open(lock2, "w").write(f"{os.getpid()}@{socket.gethostname()}@0")
    os.utime(lock2, (time.time() - (lut_mod.LOCK_STALE_S + 60),) * 2)
    assert cache._lock_owner_alive(lock2)
    import threading

    threading.Timer(1.0, os.unlink, args=(lock2,)).start()
    t0 = time.monotonic()
    df2 = spark.createDataFrame(
        [(7, 7, 7.0)], "tgt_id long, src_id long, dist_m double"
    )
    out2 = cache.save(df2, key2)  # loses to the "live" lock, waits,
    assert time.monotonic() - t0 >= 0.9  # then computes (no data yet)
    assert [r.tgt_id for r in out2.collect()] == [7]
    # (c2) past LOCK_HARD_STALE_S even a live-pid lock is broken
    # (SIGSTOPped writer must not wedge waiters forever); cross-host
    # owners are decided by the heartbeat alone
    key3 = cache.key("c3", "d3", 1000.0, 1)
    lock3 = cache._lock_path(key3)
    open(lock3, "w").write(f"{os.getpid()}@{socket.gethostname()}@0")
    os.utime(lock3, (time.time() - lut_mod.LOCK_HARD_STALE_S - 60,) * 2)
    t0 = time.monotonic()
    df3 = spark.createDataFrame(
        [(9, 9, 9.0)], "tgt_id long, src_id long, dist_m double"
    )
    out3 = cache.save(df3, key3)  # breaks immediately, no timer needed
    assert time.monotonic() - t0 < 30.0
    assert [r.tgt_id for r in out3.collect()] == [9]
    remote = cache._lock_path(cache.key("r", "r", 1.0, 1))
    open(remote, "w").write("123@some-other-host@0")
    assert not cache._lock_owner_alive(remote)  # heartbeat decides
    os.unlink(remote)
    # (d) heartbeat: with a short interval, save() advances the lock
    # mtime while the write runs
    old_beat = lut_mod.LOCK_HEARTBEAT_S
    lut_mod.LOCK_HEARTBEAT_S = 0.05
    seen = []
    orig_utime = os.utime

    def spy_utime(path, *a, **kw):
        if str(path) == cache._lock_path(cache.key("e", "f", 1.0, 1)):
            seen.append(time.monotonic())
        return orig_utime(path, *a, **kw)

    try:
        lut_mod.os.utime = spy_utime
        cache.save(df, cache.key("e", "f", 1.0, 1))
    finally:
        lut_mod.os.utime = orig_utime
        lut_mod.LOCK_HEARTBEAT_S = old_beat
    assert seen, "heartbeat never touched the lock during save()"


def test_resampler_noop_and_dispatch(spark):
    area = AreaDefinition("t", "longlat", 85, 80, (-20.0, 20.0, 20.0, 35.0))
    r = Resampler(spark, area, area)
    assert r.choose_strategy() == "noop"
    other = AreaDefinition("o", "stere", 10, 10, (0.0, 0.0, 1.0, 1.0))
    r2 = Resampler(spark, other, area)
    assert r2.choose_strategy(src_count=100) == "broadcast_knn"
    assert r2.choose_strategy(src_count=10_000_000_000) == "cell_knn"


def test_multimodal_stub_and_meta(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        decode_image(b"xxx")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    out = extract_media_meta(documents_as_media(docs)).collect()
    assert len(out) == 5
    for r in out:
        assert r.n_bytes == len(r.payload)
        assert r.checksum == sum(r.payload[:64])


def test_area_yaml_roundtrip():
    a = create_area_def(
        "roundtrip", "longlat", shape=(80, 85), area_extent=(-20, 20, 20, 35)
    )
    text = dump_area(a)
    [b] = load_area_from_string(text)
    assert b.width == a.width and b.height == a.height
    assert b.area_extent == a.area_extent


def test_create_area_from_center():
    a = create_area_def(
        "c", "longlat", shape=(10, 20), resolution=1.0, center=(0.0, 0.0)
    )
    assert a.area_extent == (-10.0, -5.0, 10.0, 5.0)


def test_knn_salted_equals_unsalted(spark):
    src = _pts(
        spark,
        [(i, float(-170 + 0.01 * i), float(-50 + 0.01 * i)) for i in range(200)],
    )
    tgt = _pts(
        spark,
        [(j, float(-169.5 + 0.02 * j), float(-49.5 + 0.02 * j)) for j in range(50)],
        id_col="tgt_id",
    )
    plain = knn_join(src, tgt, 300_000.0, k=3)
    salted = knn_join(src, tgt, 300_000.0, k=3, salt_factor=4)
    a = sorted((r.tgt_id, r.src_id, r.nn_rank) for r in plain.collect())
    b = sorted((r.tgt_id, r.src_id, r.nn_rank) for r in salted.collect())
    assert a == b and len(a) > 0


def test_knn_broadcast_src_strategy(spark, tmp_path, monkeypatch):
    """A parquet-backed source under BROADCAST_SRC_BYTES plans a
    broadcast hash join (no exchange of either join input); forcing
    the threshold to 0 restores the shuffle_hash plan; both strategies
    return identical rows (r17-opt join-strategy switch)."""
    import pyresample_spark.operators.knn as knn_mod

    p = str(tmp_path / "src.parquet")
    _pts(
        spark,
        [(i, float(-170 + 0.3 * i), float(-50 + 0.2 * i)) for i in range(300)],
    ).write.mode("overwrite").parquet(p)
    src = spark.read.parquet(p)
    tgt = _pts(
        spark,
        [(j, float(-169.5 + 0.5 * j), float(-49.5 + 0.4 * j)) for j in range(60)],
        id_col="tgt_id",
    )
    bc = knn_join(src, tgt, 400_000.0, k=2)
    bc_plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bc_plan
    monkeypatch.setattr(knn_mod, "BROADCAST_SRC_BYTES", 0)
    sh = knn_join(src, tgt, 400_000.0, k=2)
    sh_plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in sh_plan
    a = sorted((r.tgt_id, r.src_id, r.nn_rank) for r in bc.collect())
    b = sorted((r.tgt_id, r.src_id, r.nn_rank) for r in sh.collect())
    assert a == b and len(a) > 0


def test_parse_legacy_cfg():
    from pyresample_spark.sources.area_yaml import parse_legacy_cfg

    text = """
REGION: ease_sh {
    NAME:       Antarctic EASE grid
    PCS_ID:     ease_sh
    PCS_DEF:    proj=laea, lat_0=-90, lon_0=0, a=6371228.0
    XSIZE:      425
    YSIZE:      425
    AREA_EXTENT: (-5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625)
};
"""
    [a] = parse_legacy_cfg(text)
    assert a.area_id == "ease_sh"
    assert a.width == 425 and a.height == 425
    assert a.crs.startswith("+proj=laea")
    assert a.area_extent[0] == -5326849.0625


def test_connected_components(spark):
    from pyresample_spark.operators.components import connected_components

    # two chains + an isolated self-loop node: {1,2,3}, {10,11}, {99}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (99, 99)], "src long, dst long"
    )
    got = {
        r.id: r.comp for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_long_chain(spark):
    """Propagation must cross a diameter-8 path (several iterations)."""
    from pyresample_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8, 0, -1)], "src long, dst long"
    )
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 9


def test_knn_topk_hash_agg_matches_window(spark, sf_dir):
    """k>1 collect_list top-k path returns exactly the window ranking."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from pyresample_spark.queries.joins import RADIUS_M, _src, _tgt
    from pyresample_spark.operators.knn import knn_join

    got = knn_join(_src(spark, sf_dir), _tgt(spark), RADIUS_M, k=3)
    # reference ranking: k=None pairs + row_number window
    pairs = knn_join(_src(spark, sf_dir), _tgt(spark), RADIUS_M, k=None)
    w = W.partitionBy("tgt_id").orderBy(
        F.round(F.col("dist_m") * 1000).cast("bigint"), F.col("src_id")
    )
    want = (
        pairs.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= 3)
        .select("tgt_id", "src_id", "nn_rank")
    )
    diff = (
        got.select("tgt_id", "src_id", "nn_rank").exceptAll(want).count()
        + want.exceptAll(got.select("tgt_id", "src_id", "nn_rank")).count()
    )
    assert diff == 0


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    """Tables written bucketed on the join key join with ZERO exchanges
    (Spark trusts the on-disk hash partitioning); the same data as
    plain parquet shuffles both sides."""
    from pyspark.sql import functions as F

    from pyresample_spark.sources.bucketed import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d1 = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
        )
        d2 = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
        )
        write_bucketed(d1, "tb1", ["k"], 4, path=str(tmp_path / "b1"))
        write_bucketed(d2, "tb2", ["k"], 4, path=str(tmp_path / "b2"))

        j = spark.table("tb1").join(spark.table("tb2"), "k")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert plan.count("Exchange") == 0
        assert j.count() == 10_000

        jp = spark.read.parquet(str(tmp_path / "b1")).join(
            spark.read.parquet(str(tmp_path / "b2")), "k"
        )
        plan2 = jp._sc._jvm.PythonSQLUtils.explainString(
            jp._jdf.queryExecution(), "formatted"
        )
        assert plan2.count("Exchange") > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS tb1")
        spark.sql("DROP TABLE IF EXISTS tb2")


def test_cell_bucketed_points_roundtrip(spark, sf_dir, tmp_path):
    """Cell-key bucketed point table carries the knn cell scheme."""
    from pyresample_spark.queries.joins import RADIUS_M, _src
    from pyresample_spark.sources.bucketed import (
        read_table,
        write_cell_bucketed_points,
    )

    src = _src(spark, sf_dir)
    write_cell_bucketed_points(
        src, "tb_cells", RADIUS_M, 4, path=str(tmp_path / "cells")
    )
    try:
        t = read_table(spark, "tb_cells")
        assert {"cx3", "cy3", "cz3", "gx", "gy", "gz"} <= set(t.columns)
        assert t.count() == src.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_cells")


def test_partitioned_storage_prunes_cells(spark, sf_dir, tmp_path):
    """Points written partitioned by a coarse cell key are scanned with
    partition pruning: a filter on the key reaches PartitionFilters and
    only matching directories are read — the storage-level twin of the
    plan-time bbox reduction (data_reduce.py)."""
    from pyspark.sql import functions as F

    from pyresample_spark.queries.joins import _src

    src = _src(spark, sf_dir).withColumn(
        "lat_band", (F.floor(F.col("lat") / 5) * 5).cast("int")
    )
    bands = sorted(r.lat_band for r in src.select("lat_band").distinct().collect())
    assert len(bands) >= 2  # pruning needs something to prune
    band = bands[-1]
    path = str(tmp_path / "banded")
    src.write.partitionBy("lat_band").parquet(path)

    banded = spark.read.parquet(path)
    q = banded.filter(F.col("lat_band") == band).select("src_id", "lat")
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    # behavioral proof: only the one directory's rows come back
    got = q.count()
    want = src.filter(F.col("lat_band") == band).count()
    assert got == want > 0
    # and the pruned scan reads fewer files than the full scan
    import glob

    all_files = len(glob.glob(f"{path}/*/*.parquet"))
    band_files = len(glob.glob(f"{path}/lat_band={band}/*.parquet"))
    assert 0 < band_files < all_files


def test_knn_packed_guard_rejects_sparse_ids(spark):
    """Packed-bigint top-k requires 0 <= src_id < pack; a sparse id
    (e.g. raw monotonically_increasing_id = pid*2^33 + n) must raise a
    clear error, not silently corrupt src_id/dist_m (ADVICE r1, high)."""
    big = 1 << 60  # unambiguously above any pack value
    src = _pts(spark, [(big, 0.0, 0.0), (1, 0.05, 0.0)])
    tgt = _pts(spark, [(7, 0.0, 0.01)], id_col="tgt_id")
    with pytest.raises(Exception, match="packable|ASSERT"):
        knn_join(src, tgt, 50_000.0, k=1).collect()
    with pytest.raises(Exception, match="packable|ASSERT"):
        knn_join(src, tgt, 50_000.0, k=2).collect()
    # packed=False falls back to the sort-based path and is correct
    out = knn_join(src, tgt, 50_000.0, k=2, packed=False).orderBy(
        "nn_rank"
    ).collect()
    assert [r.src_id for r in out] == [big, 1]


def test_with_compact_id_dense_and_stable(spark):
    from pyresample_spark.operators.ids import with_compact_id

    df = spark.range(0, 1000, 1, 7).select(
        (F.col("id") * 3.7).alias("v")
    )
    out = with_compact_id(df, "rid")
    ids = sorted(r.rid for r in out.select("rid").collect())
    assert ids == list(range(1000))  # dense [0, N)
    # deterministic across re-evaluation (localCheckpoint pins lineage)
    pairs1 = {(r.rid, r.v) for r in out.collect()}
    pairs2 = {(r.rid, r.v) for r in out.collect()}
    assert pairs1 == pairs2


def test_get_average_skipna_poisons(spark):
    from pyresample_spark.operators.bucket import BucketResampler
    from pyresample_spark.geometry import AreaDefinition as AD

    area = AD("t", "longlat", 4, 4, (-2.0, -2.0, 2.0, 2.0))
    df = spark.createDataFrame(
        [(0.5, 0.5, 1.0), (0.6, 0.6, 3.0), (-1.5, 0.5, 2.0), (-1.4, 0.4, None)],
        "x double, y double, value double",
    )
    r = BucketResampler(df, area)
    strict = {
        r2.cell_id: r2.avg_value
        for r2 in r.get_average("value", skipna=False).collect()
    }
    loose = {
        r2.cell_id: r2.avg_value
        for r2 in r.get_average("value").collect()
    }
    poisoned = [cid for cid, v in strict.items() if v is None]
    assert len(poisoned) == 1  # the cell containing the NULL
    assert loose[poisoned[0]] == 2.0  # skipna mean ignores the NULL
    clean = [cid for cid in strict if strict[cid] is not None][0]
    assert strict[clean] == loose[clean] == 2.0


def _fornav_ellipse_numpy(u, v, vals, rps, W, H, count=10000, wmin=0.01,
                          dmax=1.0, delmax=10.0, wsum_min=None):
    """Independent scalar port of the reference fornav loop
    (_fornav_templates.cpp:109-319) used as golden truth for the Spark
    plan. Direct q evaluation replaces the C's incremental updates
    (algebraically identical)."""
    import math

    import numpy as np

    if wsum_min is None:
        wsum_min = wmin
    qmax = dmax * dmax
    alpha = -math.log(wmin) / qmax
    wtab = np.exp(-alpha * qmax * np.arange(count) / (count - 1))
    accum = np.zeros((H, W))
    wsum = np.zeros((H, W))
    n = np.zeros((H, W), dtype=int)
    rows, cols = u.shape
    mid, last = rps // 2, rps - 1
    for s0 in range(0, rows, rps):
        bu, bv, bvals = u[s0:s0 + rps], v[s0:s0 + rps], vals[s0:s0 + rps]
        coef = {}
        for col in range(1, cols - 1):
            ux = (bu[mid, col + 1] - bu[mid, col - 1]) / 2.0 * dmax
            vx = (bv[mid, col + 1] - bv[mid, col - 1]) / 2.0 * dmax
            uy = (bu[last, col] - bu[0, col]) / last * dmax
            vy = (bv[last, col] - bv[0, col]) / last * dmax
            fs = max((ux * vy - uy * vx) ** 2, 1e-8)
            fs = qmax / fs
            a = (vx * vx + vy * vy) * fs
            b = -2.0 * (ux * vx + uy * vy) * fs
            c = (ux * ux + uy * uy) * fs
            d = max(4.0 * a * c - b * b, 1e-8)
            d = 4.0 * qmax / d
            coef[col] = (a, b, c, min((c * d) ** 0.5, delmax),
                         min((a * d) ** 0.5, delmax))
        coef[0] = coef[1]
        coef[cols - 1] = coef[cols - 2]
        for r in range(bu.shape[0]):
            for col in range(cols):
                u0, v0, val = bu[r, col], bv[r, col], bvals[r, col]
                a, b, c, u_del, v_del = coef[col]
                if u0 < -u_del or v0 < -v_del:
                    continue
                iu1, iu2 = max(0, int(u0 - u_del)), min(W - 1, int(u0 + u_del))
                iv1, iv2 = max(0, int(v0 - v_del)), min(H - 1, int(v0 + v_del))
                for iv_ in range(iv1, iv2 + 1):
                    for iu_ in range(iu1, iu2 + 1):
                        du, dv = iu_ - u0, iv_ - v0
                        q = a * du * du + b * du * dv + c * dv * dv
                        if 0.0 <= q < qmax:
                            iw = min(int(q * count / qmax), count - 1)
                            wt = wtab[iw]
                            wsum[iv_, iu_] += wt
                            accum[iv_, iu_] += wt * val
                            n[iv_, iu_] += 1
    out = {}
    for iv_ in range(H):
        for iu_ in range(W):
            if wsum[iv_, iu_] >= wsum_min:
                out[iv_ * W + iu_] = (
                    accum[iv_, iu_] / wsum[iv_, iu_],
                    wsum[iv_, iu_],
                    n[iv_, iu_],
                )
    return out


def test_ewa_elliptical_matches_scalar_fornav(spark):
    """Spark elliptical EWA == independent numpy port of the reference
    fornav kernel on a sheared synthetic swath (anisotropic ellipses)."""
    import numpy as np

    from pyresample_spark.operators.ewa import ewa_fornav_elliptical

    ROWS, COLS, RPS = 12, 21, 4
    r = np.arange(ROWS)[:, None] * np.ones((1, COLS))
    c = np.ones((ROWS, 1)) * np.arange(COLS)[None, :]
    lon = -20.0 + 0.8 * c + 0.15 * r
    lat = 30.0 - 0.6 * r + 0.05 * c
    vals = ((r * 7 + c * 3) % 13) + 0.25
    area = AreaDefinition("ewa_t", "longlat", 40, 30, (-25.0, 5.0, 15.0, 35.0))
    # fractional grid coords (ll2cr with psx=psy=1)
    u = lon - (-25.0)
    v = 35.0 - lat
    golden = _fornav_ellipse_numpy(u, v, vals, RPS, 40, 30)

    rows = [
        (int(r[i, j]), int(c[i, j]), float(lon[i, j]), float(lat[i, j]),
         float(vals[i, j]))
        for i in range(ROWS) for j in range(COLS)
    ]
    swath = spark.createDataFrame(
        rows, "swath_row long, col long, lon double, lat double, value double"
    )
    got = {
        row.cell_id: (row.ewa_value, row.weight_sum, row.n_contrib)
        for row in ewa_fornav_elliptical(
            swath, area, RPS, swath_cols=COLS
        ).collect()
    }
    assert set(got) == set(golden)
    for cid, (gv, gw, gn) in golden.items():
        sv, sw, sn = got[cid]
        assert sn == gn, cid
        assert abs(sv - gv) < 1e-9, cid
        assert abs(sw - gw) < 1e-9, cid
    assert len(golden) > 50  # substantive coverage


def test_knn_broadcast_guard_falls_back_to_cell_join(spark):
    """A source larger than the broadcast threshold must route to the
    cell join (same results), not toPandas (VERDICT r1 #8)."""
    src = _pts(
        spark,
        [(i, float(-170 + 3 * i), float(-50 + 2 * i)) for i in range(40)],
    )
    tgt = _pts(
        spark,
        [(j, float(-169 + 4 * j), float(-49 + 3 * j)) for j in range(10)],
        id_col="tgt_id",
    )
    guarded = knn_join_broadcast(
        with_geocentric(src), with_geocentric(tgt), 500_000.0, k=2,
        max_src_rows=10,  # force the fallback
    )
    cell = knn_join(src, tgt, 500_000.0, k=2)
    a = sorted((r.tgt_id, r.src_id, r.nn_rank) for r in guarded.collect())
    b = sorted((r.tgt_id, r.src_id, r.nn_rank) for r in cell.collect())
    assert a == b and len(a) > 0


def test_tmerc_utm_roundtrip_and_dispatch(spark):
    """Spherical transverse Mercator (Snyder 8-5..8-8): column fwd∘inv
    is identity, matches the driver-side scalar inverse, and the
    '+proj=utm +zone=N [+south]' registry dispatch maps the zone to
    the right central meridian and false northing."""
    import math

    from pyresample_spark.operators.crs import (
        forward,
        inverse,
        inverse_scalar,
        tmerc_crs_params,
    )

    kw = tmerc_crs_params("+proj=utm +zone=33")
    assert kw["lon_0"] == 15.0 and kw["k"] == 0.9996
    assert kw["x_0"] == 500000.0 and kw["y_0"] == 0.0
    assert tmerc_crs_params("+proj=utm +zone=33 +south")["y_0"] == 1e7

    pts = [(15.0, 0.0), (12.0, 48.0), (18.7, 59.3), (9.0, -40.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fx, fy = forward("+proj=utm +zone=33")("lon", "lat")
    proj = df.select("lon", "lat", fx.alias("x"), fy.alias("y"))
    ilon, ilat = inverse("+proj=utm +zone=33")("x", "y")
    back = proj.select(
        "lon", "lat", "x", "y", ilon.alias("rlon"), ilat.alias("rlat")
    ).collect()
    inv_s = inverse_scalar("+proj=utm +zone=33")
    for r in back:
        assert r.rlon == pytest.approx(r.lon, abs=1e-9)
        assert r.rlat == pytest.approx(r.lat, abs=1e-9)
        slon, slat = inv_s(r.x, r.y)
        assert slon == pytest.approx(r.lon, abs=1e-9)
        assert slat == pytest.approx(r.lat, abs=1e-9)
    # central meridian → x = FE exactly; equator → y = 0
    cm = {(r.lon, r.lat): r for r in back}
    assert cm[(15.0, 0.0)].x == pytest.approx(500000.0, abs=1e-6)
    assert cm[(15.0, 0.0)].y == pytest.approx(0.0, abs=1e-6)
    # independent scalar ground truth (Snyder 8-5/8-6 via math.atanh)
    R, k0 = 6370997.0, 0.9996
    for lon, lat in pts[1:]:
        b = math.cos(math.radians(lat)) * math.sin(math.radians(lon - 15.0))
        gx = k0 * R * math.atanh(b) + 500000.0
        gy = k0 * R * math.atan2(
            math.tan(math.radians(lat)), math.cos(math.radians(lon - 15.0))
        )
        assert cm[(lon, lat)].x == pytest.approx(gx, abs=1e-6)
        assert cm[(lon, lat)].y == pytest.approx(gy, abs=1e-6)


def test_omerc_fitted_frame_roundtrip_and_regrid(spark):
    """Closing the optimal-bb loop: the fitted area's CRS string alone
    (lat_0/lonc/alpha) reconstructs the rotated frame exactly — the
    registry's omerc forward matches rotated_coords, fwd∘inv is the
    identity, and the fitted area is directly regriddable."""
    from pyresample_spark.operators.crs import forward, inverse, regrid_nearest
    from pyresample_spark.operators.optimal_bb import (
        compute_optimal_bb_area,
        rotated_coords,
    )
    from pyresample_spark.operators.resample_grid import (
        eqc_area_world,
        synth_image,
    )

    # an oblique synthetic "swath" crossing mid-latitudes
    pts = [
        (float(-40 + 2 * i + 0.3 * (i % 5)), float(-10 + 1.1 * i))
        for i in range(40)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    area = compute_optimal_bb_area(df, resolution_m=100_000.0)
    assert "+proj=omerc" in area.crs

    fx, fy = forward(area.crs)("lon", "lat")
    both = rotated_coords(df, area).select(
        "lon", "lat", "bb_x", "bb_y", fx.alias("cx"), fy.alias("cy")
    )
    ilon, ilat = inverse(area.crs)("cx", "cy")
    back = both.select(
        "*", ilon.alias("rlon"), ilat.alias("rlat")
    ).collect()
    for r in back:
        # registry forward (from the CRS string) == fitted-frame op
        assert r.cx == pytest.approx(r.bb_x, abs=1e-6)
        assert r.cy == pytest.approx(r.bb_y, abs=1e-6)
        # fwd∘inv identity
        assert r.rlon == pytest.approx(r.lon, abs=1e-9)
        assert r.rlat == pytest.approx(r.lat, abs=1e-9)
    # the fitted area is a first-class regrid target
    out = regrid_nearest(area, eqc_area_world(), synth_image(spark, eqc_area_world()))
    n = out.count()
    assert n > 0.5 * area.width * area.height  # most pixels land on-globe


def test_omerc_mercator_cross_track(spark):
    """PROJ-exact omerc geometry (+ctrack=merc): fwd∘inv is the
    identity, the two cross-track modes agree to O(v³) near the track
    and diverge off it, and y_merc = R·atanh(sin v) exactly."""
    import math

    from pyresample_spark.functions.geo import (
        R_EARTH,
        omerc_frame,
        omerc_inverse,
        omerc_xy,
    )
    from pyresample_spark.operators.crs import forward, inverse

    frame = omerc_frame(25.0, 10.0, 40.0)
    pts = [
        (10.0, 25.0),          # frame center: (0, 0) in both modes
        (14.0, 29.0), (0.0, 20.0), (30.0, 10.0), (-20.0, 45.0),
        (60.0, -5.0), (120.0, 40.0),
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    ex, ey = omerc_xy("lon", "lat", frame)  # equidistant
    mx, my = omerc_xy("lon", "lat", frame, cross_track="mercator")
    ilon, ilat = omerc_inverse(
        mx.alias("x"), my.alias("y"), frame, cross_track="mercator"
    )
    rows = df.select(
        "lon", "lat", ex.alias("ex"), ey.alias("ey"),
        mx.alias("mx"), my.alias("my"),
        ilon.alias("rlon"), ilat.alias("rlat"),
    ).collect()
    for r in rows:
        # along-track x identical in both modes
        assert r.mx == pytest.approx(r.ex, abs=1e-6)
        # y_merc = R·atanh(sin(y_eqd/R)) exactly
        v = r.ey / R_EARTH
        assert r.my == pytest.approx(R_EARTH * math.atanh(math.sin(v)),
                                     rel=1e-12)
        # mercator stretches AWAY from the track: |y_m| ≥ |y_e|,
        # agreeing to O(v³) near it
        assert abs(r.my) >= abs(r.ey) - 1e-6
        if abs(v) < 0.1:
            assert r.my == pytest.approx(r.ey, abs=R_EARTH * abs(v) ** 3)
        # fwd∘inv identity through the mercator pair
        assert r.rlon == pytest.approx(r.lon, abs=1e-9)
        assert r.rlat == pytest.approx(r.lat, abs=1e-9)
    # center maps to the origin in both modes
    c = rows[0]
    assert abs(c.ex) < 1e-6 and abs(c.ey) < 1e-6 and abs(c.my) < 1e-6

    # registry dispatch: +ctrack=merc selects the mercator pair
    crs = "+proj=omerc +lat_0=25.0 +lonc=10.0 +alpha=40.0 +ctrack=merc"
    fx, fy = forward(crs)("lon", "lat")
    glon, glat = inverse(crs)(fx.alias("gx"), fy.alias("gy"))
    g = df.select(
        "lon", "lat", fy.alias("gy"), glon.alias("glon"),
        glat.alias("glat"),
    ).collect()
    for r, m in zip(g, rows):
        assert r.gy == pytest.approx(m.my, abs=1e-6)
        assert r.glon == pytest.approx(r.lon, abs=1e-9)
        assert r.glat == pytest.approx(r.lat, abs=1e-9)


def test_operator_edge_cases_empty_and_degenerate(spark):
    """Degenerate-input probes: operators must return EMPTY results,
    never raise, when the geometry yields no matches — the contract
    that lets 100 TB jobs survive sparse regions without task
    failures."""
    from pyresample_spark.operators.bilinear_irregular import (
        bilinear_irregular,
    )

    src = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0), (1, 1.0, 0.0, 2.0), (2, 0.0, 1.0, 3.0)],
        "src_id long, lon double, lat double, value double",
    )
    tgt = spark.createDataFrame(
        [(0, 0.4, 0.4)], "tgt_id long, lon double, lat double"
    )
    # radius so small no candidate pairs exist -> empty, not an error
    tiny = knn_join(src, tgt, radius_m=1.0, k=4)
    assert tiny.count() == 0
    # k larger than the candidate count -> all candidates, ranked
    few = knn_join(src, tgt, radius_m=500_000.0, k=50).collect()
    assert len(few) == 3
    assert sorted(r.nn_rank for r in few) == [1, 2, 3]
    # only 3 quadrant-distinct sources -> no 4-corner quadrilateral ->
    # bilinear drops the target instead of raising
    bl = bilinear_irregular(src, tgt, 500_000.0, k=8)
    assert bl.count() == 0
    # empty source frame propagates to an empty join
    empty_src = src.filter(F.col("src_id") < 0)
    assert knn_join(empty_src, tgt, 500_000.0, k=2).count() == 0


def test_asof_join_semantics(spark):
    """As-of join edge cases: equal-timestamp match (closed interval),
    no-prior-right NULL, tie at same (key, ts) resolved to max id, and
    carry-forward across multiple lefts."""
    from pyresample_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 11), (1, 50, 12), (2, 100, 20)],
        "user_id long, ts_us long, l_id long",
    )
    right = spark.createDataFrame(
        [(1, 100, 90), (1, 100, 91), (1, 150, 92), (3, 10, 93)],
        "user_id long, ts_us long, r_id long",
    )
    got = {
        r.l_id: (r.r_id, r.matched_ts)
        for r in asof_join(left, right).collect()
    }
    assert got[10] == (91, 100)   # equal ts matches; tie -> max r_id
    assert got[11] == (92, 150)   # latest prior right carries forward
    assert got[12] == (None, None)  # before any right
    assert got[20] == (None, None)  # key with no right rows at all


def test_gauss_lut_persist_and_reuse(spark, sf_dir, tmp_path):
    """The precompute/apply split (plans/lut.py): the first call
    computes the kNN LUT and persists it; the second call must LOAD the
    parquet (same files, untouched mtimes) and its plan must contain no
    spatial join — only the LUT scan + equi-join + agg."""
    import os

    from pyresample_spark.queries.joins import gauss_lut

    cache_dir = str(tmp_path / "luts")
    lut1 = gauss_lut(spark, sf_dir, cache_dir=cache_dir)
    n1 = lut1.count()
    assert n1 > 0
    files = sorted(os.listdir(cache_dir))
    dirs = [f for f in files if f.endswith(".parquet")]
    assert len(dirs) == 1 and dirs[0].startswith("lut_")
    assert any(f.endswith(".meta.json") for f in files)
    mtime = os.path.getmtime(os.path.join(cache_dir, dirs[0]))
    # written layout (VERDICT r4 item 2): hash-bucketed by tgt_id —
    # bucket ids embedded in the part-file names
    parts = [
        f for f in os.listdir(os.path.join(cache_dir, dirs[0]))
        if f.endswith(".parquet")
    ]
    assert parts and all("_0000" in f or "_000" in f for f in parts)

    lut2 = gauss_lut(spark, sf_dir, cache_dir=cache_dir)
    assert lut2.count() == n1
    # untouched cache: the second call did not rewrite the LUT
    assert os.path.getmtime(os.path.join(cache_dir, dirs[0])) == mtime
    assert sorted(os.listdir(cache_dir)) == files
    # and its plan is a pure scan of the cache (no cell join: no
    # explode/ranking stages in the loaded LUT's plan)
    plan = lut2._jdf.queryExecution().executedPlan().toString()
    assert "lut_" in plan
    assert "Generate" not in plan and "Window" not in plan
    # the bucketed layout makes the apply-side tgt_id agg shuffle-free:
    # no Exchange anywhere in the aggregated plan
    from pyspark.sql import functions as F

    agg_plan = (
        lut2.groupBy("tgt_id").agg(F.sum("dist_m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in agg_plan, agg_plan

    # cross-session analog: drop the catalog entry and reload — the
    # sidecar re-registers the external bucketed table over the same
    # files and the layout (and shuffle-freedom) survives
    from pyresample_spark.plans.lut import LutCache

    cache = LutCache(cache_dir)
    for t in spark.catalog.listTables():
        if t.name.startswith("lut_"):
            spark.sql(f"DROP TABLE {t.name}")
    lut3 = gauss_lut(spark, sf_dir, cache_dir=cache_dir)
    assert lut3.count() == n1
    agg_plan3 = (
        lut3.groupBy("tgt_id").agg(F.sum("dist_m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in agg_plan3

    # the applied result through the LUT matches the fresh-join result
    from pyresample_spark.operators.knn import gauss_weight
    from pyresample_spark.queries.joins import SIGMA, _knn_pairs, _src
    from pyspark.sql import functions as F

    ch = _src(spark, sf_dir).select("src_id", "value")
    def agg(pairs):
        wp = pairs.join(F.broadcast(ch), "src_id").withColumn(
            "w", gauss_weight(F.col("dist_m"), SIGMA))
        return {
            (r.tgt_id): round(r.v, 6)
            for r in wp.groupBy("tgt_id")
            .agg((F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("v"))
            .collect()
        }
    assert agg(lut2) == agg(_knn_pairs(spark, sf_dir, k=8))


def test_approx_distinct_bounded_error(spark, sf_dir):
    """q_approx_distinct is now an EXPLICIT portable HLL (VERDICT r6
    item 2) — fully oracle-hashed by the driver; this is the local
    ACCURACY gate on top: per event_type, |HLL − exact| / exact ≤ 5%,
    the self-reported rel_err matches that ratio, and the sketch's
    exact integer mass z_int is consistent with v_zero (every empty
    register contributes exactly 2^53)."""
    from pyresample_spark.queries import load_all

    reg = load_all()
    approx = {
        r.event_type: r
        for r in reg["q_approx_distinct"].builder(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r
        for r in reg["q_distinct_agg"].builder(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        a = approx[et]
        rel = abs(a.hll_est - ex.n_users) / ex.n_users
        assert rel <= 0.05, (et, a.hll_est, ex.n_users)
        assert abs(a.rel_err) == round(rel, 6) or abs(
            abs(a.rel_err) - rel
        ) < 1e-6
        # z_int ≥ empty-register mass, < total possible mass
        assert a.v_zero * 2 ** 53 <= a.z_int < 256 * 2 ** 53


def test_approx_median_within_exact_band(spark, sf_dir):
    """percentile_approx (the engine's own rank sketch, exercised
    directly — the registry query q_approx_distinct is now the
    portable HLL): the sketch median must land within the exact
    P45–P55 band of value per event_type (accuracy is rank-based, so
    the right gate is a rank band, not a value epsilon)."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.bucket import load_events

    ev0 = load_events(spark, sf_dir)
    approx = {
        r.event_type: r.approx_median_value
        for r in ev0.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5).alias("approx_median_value")
        )
        .collect()
    }
    ev = ev0
    bands = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.45)").alias("lo"),
            F.expr("percentile(value, 0.55)").alias("hi"),
        )
        .collect()
    }
    for et, med in approx.items():
        lo, hi = bands[et]
        assert lo <= med <= hi, (et, med, lo, hi)


def test_round4_operator_edge_cases(spark):
    """Degenerate inputs for the round-4 operators: empty source into
    the fused gaussian fold; Mollweide inverse clamped beyond the
    projection envelope; Robinson inverse at the equator/origin;
    distinct LUT cache keys for distinct parameters."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.knn import knn_gauss_fold
    from pyresample_spark.plans.lut import LutCache

    # empty source → empty aggregate, not an error
    empty = spark.createDataFrame(
        [], "src_id long, value double, lon double, lat double"
    )
    tgt = spark.createDataFrame(
        [(0, 0.0, 0.0)], "tgt_id long, lon double, lat double"
    )
    assert knn_gauss_fold(empty, tgt, 100_000.0, k=8, sigma=5e4).count() == 0

    # Mollweide inverse: |y| beyond sqrt(2)·R clamps to the pole row
    # instead of NaN
    from pyresample_spark.functions.geo import moll_inverse

    df = spark.createDataFrame([(0.0, 1.0e7)], "x double, y double")
    lon, lat = moll_inverse("x", "y")
    r = df.select(lon.alias("a"), lat.alias("b")).collect()[0]
    assert abs(r.b - 90.0) < 1e-9 and not (r.a != r.a)

    # Robinson inverse at the origin is exactly (lon_0, 0)
    from pyresample_spark.functions.geo import robin_inverse

    df0 = spark.createDataFrame([(0.0, 0.0)], "x double, y double")
    lon0, lat0 = robin_inverse("x", "y", lon_0=10.0)
    r0 = df0.select(lon0.alias("a"), lat0.alias("b")).collect()[0]
    assert abs(r0.a - 10.0) < 1e-12 and abs(r0.b) < 1e-12

    # LUT cache: different radius/k → different key (no false sharing)
    cache = LutCache("/tmp/unused")
    k1 = cache.key("s", "t", 250_000.0, 8)
    assert k1 != cache.key("s", "t", 250_000.0, 4)
    assert k1 != cache.key("s", "t", 100_000.0, 8)
    assert k1 != cache.key("s", "other", 250_000.0, 8)


def test_reference_golden_kd_tree_fixture(spark):
    """PARITY against the reference's own published expected values
    (pyresample/test/test_kd_tree.py:51-99 fixture: 3 swath points,
    data [1,2,3], one target at (12.562036, 55.715613)):

    - resample_nearest r=100 km → 2
    - resample_gauss r=50 km σ=25 km → 2.2020729 (±1e-5)
    - resample_custom w=1−d/1e5, r=50 km → 2.4356757 (±1e-5)
    - resample_gauss r=100 km σ=fwhm2sigma(41627.7306) with_uncert →
      (2.20206560694, 0.707115076173, n=3)

    Only the fixture CONSTANTS come from the reference; the engine path
    is this repo's cell join + fused fold. Both engines embed lon/lat
    on the R=6370997 sphere and weight by chord distance, so the
    numbers must agree to the reference's own 1e-5 assertion tolerance.
    """
    import math

    from pyresample_spark.operators.knn import knn_gauss_fold, knn_join

    src = spark.createDataFrame(
        [
            (0, 1.0, 11.280789, 56.011037),
            (1, 2.0, 12.649354, 55.629675),
            (2, 3.0, 12.080402, 55.641535),
        ],
        "src_id long, value double, lon double, lat double",
    )
    tgt = spark.createDataFrame(
        [(0, 12.562036, 55.715613)], "tgt_id long, lon double, lat double"
    )

    # nearest within 100 km → the value-2 point
    nn = knn_join(src, tgt, 100_000.0, k=1).collect()
    assert len(nn) == 1 and nn[0].src_id == 1

    # gauss r=50 km σ=25 km
    g = knn_gauss_fold(src, tgt, 50_000.0, k=8, sigma=25_000.0).collect()[0]
    assert abs(g.swv / g.v1 - 2.2020729) < 1e-5

    # custom weight 1 − d/100000 within 50 km
    from pyspark.sql import functions as F

    pairs = knn_join(src, tgt, 50_000.0, k=None)
    w = 1.0 - F.col("dist_m") / 100_000.0
    joined = pairs.join(src.select("src_id", "value"), "src_id")
    c = joined.groupBy("tgt_id").agg(
        (F.sum(w * F.col("value")) / F.sum(w)).alias("v")
    ).collect()[0]
    assert abs(c.v - 2.4356757) < 1e-5

    # gauss with uncertainty, r=100 km, σ = fwhm2sigma(41627.7306)
    sigma = 41627.730557884883 / (2.0 * math.sqrt(math.log(2)))
    u = knn_gauss_fold(src, tgt, 100_000.0, k=8, sigma=sigma).collect()[0]
    v1, v2, swv, swv2 = u.v1, u.v2, u.swv, u.swv2
    res = swv / v1
    stddev = math.sqrt((v1 / (v1 * v1 - v2)) * (swv2 - swv * swv / v1))
    assert u.n_neighbours == 3
    assert abs(res - 2.20206560694) < 1e-5
    assert abs(stddev - 0.707115076173) < 1e-5


def test_round5_advice_fixes(spark, duck):
    """Round-4 ADVICE regressions: conic n=0 guard, conic inverse SQL
    double-mod lon wrap at small n, oblique-stere antipode exclusion,
    and the GeoImage key_col integer-cast guard."""
    import pytest as _pt

    from pyresample_spark.functions.geo import (
        aea_constants,
        aea_inv_sql,
        eqdc_constants,
        eqdc_inv_sql,
        eqdc_inverse,
        eqdc_xy,
    )

    # 1. degenerate cones raise a clear error, not ZeroDivisionError
    with _pt.raises(NotImplementedError, match="eqdc"):
        eqdc_constants(30.0, -30.0)
    with _pt.raises(NotImplementedError, match="eqdc"):
        eqdc_constants(0.0)
    with _pt.raises(NotImplementedError, match="aea"):
        aea_constants(20.0, -20.0)

    # 2. small-n conic inverse: SQL twin must agree with the Column
    #    path where degrees(atan2)/n exceeds 540-|lon_0| (the single-mod
    #    wrap bug). lat_1=10,lat_2=15 gives n≈0.215 → lon term up to
    #    ±837°.
    from pyspark.sql import functions as F

    kw = dict(lat_1=10.0, lat_2=15.0, lat_0=0.0, lon_0=0.0)
    pts = spark.range(1).select(
        F.lit(-179.0).alias("lon"), F.lit(60.0).alias("lat")
    )
    fx, fy = eqdc_xy("lon", "lat", **kw)
    ilon, ilat = eqdc_inverse(fx, fy, **kw)
    got = pts.select(ilon.alias("lon2"), ilat.alias("lat2")).collect()[0]
    xy = pts.select(fx.alias("x"), fy.alias("y")).collect()[0]
    slon, slat = eqdc_inv_sql(repr(xy.x), repr(xy.y), **kw)
    srow = duck.execute(f"SELECT {slon} AS lon2, {slat} AS lat2").fetchone()
    assert abs(got.lon2 - srow[0]) < 1e-6 and -180.0 <= srow[0] < 180.0
    assert abs(got.lat2 - srow[1]) < 1e-6
    # aea twin: same wrap form, just confirm in-range at small n
    ax, ay = 1.0e6, -2.0e6
    aslon, _ = aea_inv_sql(repr(ax), repr(ay), lat_1=10.0, lat_2=15.0)
    arow = duck.execute(f"SELECT {aslon}").fetchone()
    assert -180.0 <= arow[0] < 180.0

    # 3. oblique stereographic: no kept point is within the unstable
    #    antipode cap (kden <= 0.01) — in Spark AND the oracle's WHERE
    import math as _m

    from pyresample_spark.queries import load_all

    reg = load_all()
    spec = reg["q_proj_stere_oblique"]
    assert "-0.99" in spec.oracle  # antipode cap present in the oracle
    # Spark and oracle keep the same row set under the new filter (at
    # sf0.001 the derived lat band is [-90,-75] so both keep 0 rows;
    # the sf0.01 parity test exercises the non-empty case)
    df = spec.builder(spark, "/root/testdata/sf0.001")
    assert df.count() == duck.execute(
        f"SELECT count(*) FROM ({spec.oracle})"
    ).fetchone()[0]

    # 4. GeoImage key_col guard: non-integer keys fail loudly
    from pyresample_spark.image import GeoImage, _src_keyed

    bad = spark.createDataFrame(
        [("a1", 1.0, 2.0, 3.0)], "k string, lon double, lat double, value double"
    )
    img = GeoImage(df=bad, area=None)
    with _pt.raises(Exception, match="integer-castable"):
        _src_keyed(img, "k").collect()
    ok = spark.createDataFrame(
        [(7, 1.0, 2.0, 3.0)], "k long, lon double, lat double, value double"
    )
    assert _src_keyed(GeoImage(df=ok, area=None), "k").collect()[0].src_id == 7


def test_knn_broadcast_epsilon_knob(spark):
    """The reference's `epsilon` approximation knob
    (kd_tree.py:86-88,545-548 → scipy eps semantics) on the broadcast
    probe: epsilon=0 is bit-identical to the exact probe; epsilon>0
    returns, per target, a k-th neighbour within (1+eps) of the true
    k-th distance, every pair still inside the radius."""
    import random

    from pyresample_spark.operators.knn import (
        knn_join_broadcast,
        with_geocentric,
    )

    rng = random.Random(7)
    src_rows = [
        (i, rng.uniform(-30.0, 30.0), rng.uniform(30.0, 60.0))
        for i in range(400)
    ]
    tgt_rows = [
        (i, rng.uniform(-30.0, 30.0), rng.uniform(30.0, 60.0))
        for i in range(60)
    ]
    src = with_geocentric(
        spark.createDataFrame(src_rows, "src_id long, lon double, lat double")
    )
    tgt = with_geocentric(
        spark.createDataFrame(tgt_rows, "tgt_id long, lon double, lat double")
    ).withColumnRenamed("tgt_id", "cell_id").withColumnRenamed(
        "cell_id", "tgt_id"
    )
    R, K = 800_000.0, 4

    def as_map(df):
        m = {}
        for r in df.collect():
            m.setdefault(r.tgt_id, []).append(
                (r.nn_rank, r.src_id, r.dist_m)
            )
        return {t: sorted(v) for t, v in m.items()}

    exact = as_map(knn_join_broadcast(src, tgt, R, k=K))
    e0 = as_map(knn_join_broadcast(src, tgt, R, k=K, epsilon=0.0))
    assert e0 == exact  # epsilon=0 ≡ exact, same path

    for eps in (0.1, 0.5):
        approx = as_map(knn_join_broadcast(src, tgt, R, k=K, epsilon=eps))
        assert set(approx) == set(exact)  # same matched target set
        for t, pairs in approx.items():
            dists = [d for _, _, d in pairs]
            assert all(d <= R for d in dists)
            true_k = [d for _, _, d in exact[t]]
            # (1+eps) guarantee on the k-th returned distance
            assert dists[-1] <= (1.0 + eps) * true_k[-1] + 1e-6
            # and each rank's distance is never better than truth
            for (got, tru) in zip(dists, true_k):
                assert got + 1e-9 >= tru
    # pruning really engages at tight epsilon=0-like bound: approx with
    # a huge epsilon still returns only in-radius pairs
    big = as_map(knn_join_broadcast(src, tgt, R, k=K, epsilon=10.0))
    for t, pairs in big.items():
        assert all(d <= R for _, _, d in pairs)


def test_real_decoders_ppm_and_wav(spark):
    """The dependency-free REAL decoders (VERDICT r4 item 7): PPM
    round-trip incl. comment-tolerant headers and truncation errors;
    WAV/PCM round-trip incl. extra chunks and malformed input."""
    import numpy as np
    import pytest as _pt

    from pyresample_spark.operators.multimodal import (
        decode_ppm,
        decode_ppm_meta,
        decode_wav_pcm16,
        encode_ppm,
        encode_wav_pcm16,
    )

    # PPM round-trip
    p = encode_ppm(5, 3, (10, 20, 30))
    m = decode_ppm(p)
    assert (m["width"], m["height"], m["n_pixels"]) == (5, 3, 15)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (10.0, 20.0, 30.0)
    # comment-tolerant header (a real-world PPM feature)
    commented = b"P6\n# made by hand\n2 2\n255\n" + bytes([1, 2, 3]) * 4
    m2 = decode_ppm(commented)
    assert (m2["width"], m2["height"]) == (2, 2)
    with _pt.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pt.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x01\x02")
    # non-uniform pixels: channel means separate correctly
    px = np.arange(2 * 2 * 3, dtype=np.uint8)
    mixed = b"P6\n2 2\n255\n" + px.tobytes()
    m3 = decode_ppm(mixed)
    assert m3["mean_r"] == float(px.reshape(-1, 3)[:, 0].mean())
    assert m3["mean_b"] == float(px.reshape(-1, 3)[:, 2].mean())

    # the Spark 1-row-per-payload decode stage
    media = spark.createDataFrame(
        [(1, bytearray(p)), (2, bytearray(commented))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_ppm_meta(media).collect()}
    assert rows[1].width == 5 and rows[1].mean_g == 20
    assert rows[2].n_pixels == 4

    # WAV round-trip
    samples = np.array([0, 1000, -2000, 32767, -32768], dtype=np.int16)
    w = encode_wav_pcm16(8000, samples)
    d = decode_wav_pcm16(w)
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1
    assert d["n_samples"] == 5 and d["peak"] == 32768
    # tolerate an extra chunk before fmt (chunk-walk, not offset math)
    extra = w[:12] + b"LIST\x04\x00\x00\x00INFO" + w[12:]
    d2 = decode_wav_pcm16(extra)
    assert d2["n_samples"] == 5 and d2["sample_rate"] == 8000
    with _pt.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"OggS" + bytes(40))
    with _pt.raises(ValueError, match="missing fmt"):
        decode_wav_pcm16(b"RIFF\x04\x00\x00\x00WAVE")


def test_choose_salt_factor_heuristic(spark):
    """The skew heuristic (VERDICT r4 item 5): a hot cell above the
    row bound gets a salt that splits it back under; a uniform layout
    gets None; and the salted join still returns the identical pair
    set (equivalence already covered by test_knn_salted_equals_
    unsalted — here we check the CHOICE)."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.knn import choose_salt_factor

    hot = spark.range(1000).select(
        F.col("id").alias("src_id"),
        (10.0 + (F.col("id") % 10) * 1e-6).alias("lon"),
        F.lit(50.0).alias("lat"),
    )
    # 1000 rows in one cell, bound=100 → salt 10
    assert choose_salt_factor(hot, 50_000.0, hot_cell_rows=100) == 10
    # bound not exceeded → unsalted
    assert choose_salt_factor(hot, 50_000.0, hot_cell_rows=2000) is None
    # cap respected
    assert choose_salt_factor(
        hot, 50_000.0, hot_cell_rows=10, max_salt=16
    ) == 16
    spread = spark.range(1000).select(
        F.col("id").alias("src_id"),
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        (F.col("id") % 140 - 70.0 + 0.5).alias("lat"),
    )
    assert choose_salt_factor(spread, 50_000.0, hot_cell_rows=100) is None


def test_planner_auto_salts_hot_cell(spark):
    """VERDICT r5 item 2: a pathological one-cell source resampled
    through the engine facade gets salted WITHOUT caller intervention
    — the planner runs choose_salt_factor on the cell-join path,
    records the decision on the ResamplePlan, memoizes the probe per
    (src, radius), and the salted result equals the unsalted one."""
    from pyspark.sql import functions as F

    src = spark.range(1000).select(
        F.col("id").alias("src_id"),
        (10.0 + (F.col("id") % 10) * 1e-6).alias("lon"),
        F.lit(50.0).alias("lat"),
    )
    tgt = spark.range(4).select(
        F.col("id").alias("tgt_id"),
        (10.0 + F.col("id") * 1e-5).alias("lon"),
        F.lit(50.0).alias("lat"),
    )
    r = Resampler(spark, "hot-swath", AreaDefinition(
        "o", "stere", 10, 10, (0.0, 0.0, 1.0, 1.0)))
    assert r.choose_strategy() == "cell_knn"
    plan = r.precompute(src, tgt, 50_000.0, k=1, hot_cell_rows=100)
    assert plan.salt_factor == 10
    # the physical join really carries the salt key
    assert "salt" in plan.lut._jdf.queryExecution().executedPlan().toString()
    # probe memoized per (src hash, radius, hot_cell_rows): second
    # precompute with the SAME threshold reuses it …
    assert r._salt_cache == {("hot-swath", 50_000.0, 100): 10}
    r.precompute(src, tgt, 50_000.0, k=1, hot_cell_rows=100)
    assert len(r._salt_cache) == 1
    # … but a different threshold re-probes instead of silently
    # reusing the first decision (ADVICE r6): 1000 rows in one cell
    # is under a 2000-row bound → no salt for that key
    r.precompute(src, tgt, 50_000.0, k=1, hot_cell_rows=2000)
    assert r._salt_cache[("hot-swath", 50_000.0, 2000)] is None
    assert len(r._salt_cache) == 2
    # salted result == forced-unsalted result
    unsalted = r.precompute(src, tgt, 50_000.0, k=1, salt_factor=1)
    assert unsalted.salt_factor == 1
    key = lambda row: (row.tgt_id, row.src_id, row.dist_m)  # noqa: E731
    assert sorted(map(key, plan.lut.collect())) == sorted(
        map(key, unsalted.lut.collect())
    )
    # a uniform source stays unsalted through the same path
    spread = spark.range(1000).select(
        F.col("id").alias("src_id"),
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        (F.col("id") % 140 - 70.0 + 0.5).alias("lat"),
    )
    r2 = Resampler(spark, "uniform-swath", AreaDefinition(
        "o", "stere", 10, 10, (0.0, 0.0, 1.0, 1.0)))
    assert r2.precompute(spread, tgt, 50_000.0, k=1).salt_factor is None


def test_crs_roundtrip_sweep_all_families(spark):
    """fwd∘inv identity sweep across EVERY analytic CRS family in the
    registry, on one shared pseudo-random point cloud (hash-derived,
    deterministic). The oracle-parity tests check each family against
    DuckDB twins that share the formula text; this sweep checks the
    INTERNAL consistency the twins cannot — a forward and inverse that
    drifted apart (sign convention, false easting, wrap) fail here
    even if both SQL twins drifted identically."""
    import pyspark.sql.functions as F  # noqa: PLC0415

    from pyresample_spark.operators.crs import forward, inverse

    pts = spark.range(0, 3000).select(
        (F.pmod(F.hash(F.col("id") * 2654435761), F.lit(36000)) / 100.0
         - 180.0).alias("lon"),
        (F.pmod(F.hash(F.col("id") * 40503 + 7), F.lit(17800)) / 100.0
         - 89.0).alias("lat"),
    )
    # domain guard per family: keep points where the projection is
    # well-conditioned (away from antipodes / horizons / cone limits)
    lat, lon = F.col("lat"), F.col("lon")

    def cos_c(lat0, lon0):
        return (
            F.sin(F.radians(F.lit(lat0))) * F.sin(F.radians(lat))
            + F.cos(F.radians(F.lit(lat0))) * F.cos(F.radians(lat))
              * F.cos(F.radians(lon - F.lit(lon0)))
        )

    cases = [
        ("+proj=eqc", F.lit(True)),
        ("+proj=stere +lat_0=90 +lat_ts=70", lat > -60.0),
        ("+proj=stere +lat_0=52 +lon_0=10 +k_0=0.9999", cos_c(52.0, 10.0) > -0.9),
        ("+proj=aeqd +lat_0=48 +lon_0=2", cos_c(48.0, 2.0) > -0.9),
        ("+proj=gnom +lat_0=30 +lon_0=-100", cos_c(30.0, -100.0) > 0.15),
        ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50 +lon_0=8",
         (cos_c(50.0, 8.0) > -0.9) & (F.abs(lat) < 89.0)),
        ("+proj=stere +ellps=WGS84 +lat_0=90 +lat_ts=60", lat > -60.0),
        ("+proj=stere +ellps=WGS84 +lat_0=-90 +lat_ts=-70", lat < 60.0),
        # UPS: polar ellipsoidal with +k and NO +lat_ts (ADVICE r5)
        ("+proj=stere +ellps=WGS84 +lat_0=90 +k=0.994", lat > -60.0),
        # named non-WGS84 ellipsoid through the +ellps registry
        ("+proj=stere +ellps=bessel +lat_0=52 +lon_0=10",
         (cos_c(52.0, 10.0) > -0.9) & (F.abs(lat) < 89.0)),
        ("+proj=geos +a=6378169.0 +b=6356584.0 +h=35785831.0 +lon_0=0",
         cos_c(0.0, 0.0) > 0.25),
        # GOES-R ABI: the ellipsoidal geos sweep=x scan convention
        ("+proj=geos +sweep=x +a=6378137.0 +b=6356752.31414 "
         "+h=35786023.0 +lon_0=-75.0",
         cos_c(0.0, -75.0) > 0.25),
        ("+proj=laea +lat_0=90 +lon_0=0", lat > -80.0),
        ("+proj=merc +lat_ts=20", F.abs(lat) < 85.0),
        ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96",
         (lat > 0.0) & (lat < 85.0)),
        ("+proj=sinu +lon_0=0", F.lit(True)),
        ("+proj=cea +lat_ts=30", F.abs(lat) < 89.0),
        ("+proj=ortho +lat_0=0 +lon_0=0", cos_c(0.0, 0.0) > 0.1),
        ("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996",
         (F.abs(lon - 15.0) < 45.0) & (F.abs(lat) < 84.0)),
        ("+proj=utm +zone=33", (F.abs(lon - 15.0) < 45.0) & (F.abs(lat) < 84.0)),
        ("+proj=omerc +lat_0=25 +lonc=10 +alpha=40", cos_c(-22.4, 131.7) > -0.9),
        ("+proj=omerc +lat_0=25 +lonc=10 +alpha=40 +ctrack=merc",
         cos_c(-22.4, 131.7) > -0.9),
        ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=37.5 +lon_0=-96",
         (lat > -60.0) & (lat < 89.0)),
        ("+proj=eqdc +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=0",
         (lat > -60.0) & (lat < 89.0)),
        ("+proj=moll +lon_0=0", F.abs(lat) < 89.0),
        ("+proj=robin +lon_0=0", F.abs(lat) < 85.0),
        ("+proj=geos +h=35785831 +lon_0=0", cos_c(0.0, 0.0) > 0.25),
    ]
    for crs, guard in cases:
        fx, fy = forward(crs)("lon", "lat")
        d = pts.filter(guard).select("lon", "lat", fx.alias("x"), fy.alias("y"))
        ilon, ilat = inverse(crs)("x", "y")
        # wrap-aware lon error
        dlon = F.abs(
            ((ilon - F.col("lon") + 540.0) % 360.0) - 180.0
        )
        err = d.select(
            F.count(F.lit(1)).alias("n"),
            F.max(dlon).alias("e_lon"),
            F.max(F.abs(ilat - F.col("lat"))).alias("e_lat"),
        ).first()
        assert err.n > 100, f"{crs}: domain guard left only {err.n} points"
        assert err.e_lon < 1e-6, f"{crs}: max lon roundtrip err {err.e_lon}"
        assert err.e_lat < 1e-6, f"{crs}: max lat roundtrip err {err.e_lat}"


def test_stere_ell_polar_k0_ups(spark):
    """ADVICE r5 (medium): a polar ellipsoidal stereographic CRS with
    an explicit scale factor and no +lat_ts (UPS: +proj=stere
    +lat_0=90 +k=0.994 +ellps=WGS84) must project with k0=0.994, not
    silently with 1. Roundtrip can't catch this (forward and inverse
    share the constant), so assert the two k0-sensitive properties
    directly: (1) coordinates scale EXACTLY linearly in k0 — the UPS
    forward equals the k0=1 forward × 0.994; (2) the point scale at
    the pole limit is k0: k = ρ/(a·m(φ)) → 0.994 as φ→90°, the
    defining property of PROJ's secant form 2k0/√((1+e)^(1+e)
    (1−e)^(1−e)). An explicit +lat_ts still takes precedence over +k
    (PROJ semantics)."""
    import math

    from pyresample_spark.operators.crs import (
        _family,
        forward,
        stere_ell_polar_crs_params,
    )

    ups = "+proj=stere +lat_0=90 +k=0.994 +ellps=WGS84"
    assert _family(ups) == "stere_ell_polar"
    assert stere_ell_polar_crs_params(ups)["k0"] == 0.994
    # +lat_ts wins over +k when both are present (PROJ precedence:
    # the constants only consult k0 without a true-scale parallel)
    both = "+proj=stere +lat_0=90 +lat_ts=60 +k=0.5 +ellps=WGS84"
    bx, _ = forward(both)("lon", "lat")
    tx, _ = forward(
        "+proj=stere +lat_0=90 +lat_ts=60 +ellps=WGS84"
    )("lon", "lat")
    pts = spark.createDataFrame(
        [(75.0, 81.0), (-130.0, 85.5), (0.0, 70.0), (44.0, 89.99999)],
        "lon double, lat double",
    )
    assert pts.select(
        F.max(F.abs(bx - tx)).alias("e")
    ).first().e < 1e-9
    fx, fy = forward(ups)("lon", "lat")
    ux, uy = forward(
        "+proj=stere +lat_0=90 +k=1.0 +ellps=WGS84"
    )("lon", "lat")
    rows = pts.select(
        "lon", "lat", fx.alias("x"), fy.alias("y"),
        (ux * 0.994).alias("sx"), (uy * 0.994).alias("sy"),
    ).collect()
    for r in rows:
        assert r.x == pytest.approx(r.sx, rel=1e-12, abs=1e-9)
        assert r.y == pytest.approx(r.sy, rel=1e-12, abs=1e-9)
    # pole-limit point scale: k = rho / (a * m(phi)) → k0
    a, b = 6378137.0, 6356752.3142451793
    es = 1.0 - (b / a) ** 2
    near = [r for r in rows if r.lat > 89.9][0]
    rho = math.hypot(near.x, near.y)
    phi = math.radians(near.lat)
    m = math.cos(phi) / math.sqrt(1.0 - es * math.sin(phi) ** 2)
    assert rho / (a * m) == pytest.approx(0.994, abs=1e-6)


def test_ellps_registry_and_unknown_raise():
    """ADVICE r5 (low): named PROJ ellipsoids resolve to (a, b) from
    the public ellps table; an unrecognized token raises instead of
    silently projecting through the spherical family with R=6370997
    (km-scale deviation, no warning). +ellps=sphere stays spherical
    by definition, and explicit +a/+b always win."""
    from pyresample_spark.operators.crs import _family, _ellipsoid_ab

    assert _family("+proj=stere +lat_0=52 +ellps=bessel") == "stere_ell"
    a, b = _ellipsoid_ab({"ellps": "bessel"})
    assert (a, b) == (6377397.155, pytest.approx(6356078.962818189))
    assert _ellipsoid_ab({"ellps": "intl"})[1] == pytest.approx(
        6356911.9461279465
    )
    assert _ellipsoid_ab({"ellps": "clrk66"}) == (6378206.4, 6356583.8)
    assert _ellipsoid_ab({"ellps": "sphere"}) is None
    assert _ellipsoid_ab({"ellps": "krass", "a": "2.0", "b": "1.0"}) == (
        2.0, 1.0
    )
    with pytest.raises(NotImplementedError, match="mars2000"):
        _family("+proj=stere +lat_0=52 +ellps=mars2000")
    with pytest.raises(NotImplementedError, match="ellps"):
        _ellipsoid_ab({"ellps": "WGS-84"})


def test_area_reduce_equatorial_side_degrades_to_all():
    """ADVICE r5 (low): a lateral boundary side whose pixel-center
    latitudes are all exactly 0 (height-1 equatorial grid) must
    degrade to the keep-everything window like the reference's
    1/sin → inf lon buffer, not raise ZeroDivisionError."""
    from pyresample_spark.operators.reduce import area_reduce_info

    eq = AreaDefinition(
        "eq1", "longlat", 360, 1, (-180.0, -0.5, 180.0, 0.5)
    )
    assert area_reduce_info(eq, 7000.0)["mode"] == "all"
    # a normal window area is unaffected by the guard
    win = AreaDefinition(
        "w", "longlat", 40, 20, (0.0, 20.0, 40.0, 40.0)
    )
    assert area_reduce_info(win, 7000.0)["mode"] == "window"


def test_ppm_container_walker():
    """The multi-frame walker must consume frame boundaries exactly:
    frames parse in order, comments inside any frame header are
    tolerated, and trailing garbage / empty input raise."""
    import pytest as _pt

    from pyresample_spark.operators.multimodal import (
        decode_ppm_container,
        encode_ppm,
    )

    f0 = encode_ppm(3, 2, (10, 20, 30))
    f1 = b"P6\n# inter-frame comment\n2 2\n255\n" + bytes((5, 6, 7)) * 4
    f2 = encode_ppm(1, 1, (255, 0, 128))
    frames = decode_ppm_container(f0 + f1 + f2)
    assert [m["frame_idx"] for m in frames] == [0, 1, 2]
    assert [(m["width"], m["height"]) for m in frames] == [
        (3, 2), (2, 2), (1, 1)
    ]
    assert frames[1]["mean_g"] == 6.0 and frames[2]["mean_r"] == 255.0
    assert sum(m["frame_bytes"] for m in frames) == len(f0 + f1 + f2)
    with _pt.raises(ValueError, match="P6"):
        decode_ppm_container(f0 + b"JUNK")
    with _pt.raises(ValueError, match="empty"):
        decode_ppm_container(b"")


def test_reference_golden_bucket_indices_latlong(spark):
    """PARITY against the reference's own published bucket-index
    expectations on a latlong grid (test_bucket.py:138-152
    test_get_bucket_indices_on_latlong): a 2×2 latlong area centered
    (0,0) at 10° resolution, nine probe points straddling every edge.
    Only the fixture constants come from the reference; the engine
    path is create_area_def → assign_cells column math. The reference
    marks a point −1/−1 when EITHER axis is out of bounds — the same
    classification in_bounds makes."""
    from pyresample_spark.operators.bucket import assign_cells
    from pyresample_spark.sources.area_yaml import create_area_def

    area = create_area_def(
        "test", "longlat", shape=(2, 2), resolution=10.0, center=(0.0, 0.0)
    )
    assert area.area_extent == (-10.0, -10.0, 10.0, 10.0)
    pts = [
        (-10.0, -10.0), (-9.9, -9.9), (-0.1, -0.1), (0.0, 0.0),
        (0.1, 0.1), (9.9, 9.9), (10.0, 10.0), (-10.1, 0.0), (0.0, 10.1),
    ]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "id long, lon double, lat double",
    )
    assigned = assign_cells(
        df, area, x_col="lon", y_col="lat", keep_out_of_bounds=True
    )
    ok = area.in_bounds(F.col("cell_row"), F.col("cell_col"))
    rows = (
        assigned.select(
            "id",
            F.when(ok, F.col("cell_col")).otherwise(F.lit(-1)).alias("x"),
            F.when(ok, F.col("cell_row")).otherwise(F.lit(-1)).alias("y"),
        )
        .orderBy("id")
        .collect()
    )
    assert [r.x for r in rows] == [-1, 0, 0, 1, 1, 1, -1, -1, -1]
    assert [r.y for r in rows] == [-1, 1, 1, 1, 0, 0, -1, -1, -1]


def test_reference_golden_round_to_resolution(spark):
    """Reference round_to_resolution goldens (test_bucket.py:97-108):
    5.5 @ 2 → 6; 5.5 @ 1.7 → 5.1; [4.2, 5.6] @ 2 → [4, 6]."""
    from pyresample_spark.functions.geo import round_to_resolution

    df = spark.createDataFrame(
        [(5.5, 2.0), (5.5, 1.7), (4.2, 2.0), (5.6, 2.0)], "v double, r double"
    )
    got = [
        round(r.s, 9)
        for r in df.select(
            round_to_resolution(F.col("v"), F.col("r")).alias("s")
        ).collect()
    ]
    assert got == [6.0, 5.1, 4.0, 6.0]


def test_reference_golden_linesample_gather(spark):
    """Reference get_image_from_linesample goldens (test_grid.py:72-95
    test_linesample / test_linesample_multi): data(y,x) = y·x on a
    40×40 grid, gathered at rows [[1,2],[3,4]] × cols [[25,26],
    [27,28]] → [[25,52],[81,112]]; the 3-band variant scales each
    channel (1×, 2×, 3×). The engine form of the index gather is the
    (row, col) equi-join every linesample/regrid plan uses."""
    img = spark.range(0, 40 * 40).select(
        (F.col("id") / 40).cast("long").alias("row"),
        (F.col("id") % 40).alias("col"),
        ((F.col("id") / 40).cast("long") * (F.col("id") % 40))
        .cast("double").alias("value"),
    )
    req = spark.createDataFrame(
        [(0, 1, 25), (1, 2, 26), (2, 3, 27), (3, 4, 28)],
        "i long, row long, col long",
    )
    got = req.join(F.broadcast(img), ["row", "col"]).orderBy("i").collect()
    assert [r.value for r in got] == [25.0, 52.0, 81.0, 112.0]

    # multiband: channels 1×/2×/3× gathered through ONE join
    mb = img.select(
        "row", "col",
        F.array(
            F.col("value"), F.col("value") * 2.0, F.col("value") * 3.0
        ).alias("bands"),
    )
    gotm = req.join(F.broadcast(mb), ["row", "col"]).orderBy("i").collect()
    assert [list(r.bands) for r in gotm] == [
        [25.0, 50.0, 75.0], [52.0, 104.0, 156.0],
        [81.0, 162.0, 243.0], [112.0, 224.0, 336.0],
    ]


def test_reference_golden_masked_swath_self_resample(spark):
    """Reference masked-swath golden (test_kd_tree.py
    test_nearest_masked_swath_target, expected 12000): a 50×10 swath
    with data y·x where only the [::2, ::2] points are valid,
    resampled onto itself within 50 km. Masked points are excluded on
    BOTH sides (the engine form of mask handling is filtering the
    point tables — q_valid_filter's contract), every valid target
    matches itself at distance 0, and the value sum is exactly
    Σ(even y)·Σ(even x) = 600 · 20 = 12000 — the reference's own
    expected value, which it contrasts against 12716 when masks leak
    through."""
    from pyresample_spark.operators.knn import knn_join

    rows = [
        (y * 10 + x, float(3 + x), float(75 - y), float(y * x))
        for y in range(50)
        for x in range(10)
        if y % 2 == 0 and x % 2 == 0  # the unmasked points
    ]
    src = spark.createDataFrame(
        rows, "src_id long, lon double, lat double, value double"
    )
    tgt = src.select("src_id", "lon", "lat").withColumnRenamed(
        "src_id", "tgt_id"
    )
    nn = knn_join(src, tgt, 50_000.0, k=1)
    got = (
        nn.join(src.select("src_id", "value"), "src_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert got.n == 125  # every valid target matched (itself)
    assert got.s == 12000.0
    # and each match is the point itself at distance ~0
    self_matches = nn.filter(F.col("src_id") == F.col("tgt_id")).count()
    assert self_matches == 125


def test_reference_golden_kd_tree_cross_sums_ellipsoidal(spark):
    """FLAGSHIP parity: the reference's whole-grid kd-tree cross-sum
    checksums (test_kd_tree.py test_nearest = 15874591.0 and
    test_nearest_complex = 3530219 + 688723j) reproduce EXACTLY
    through this engine: the areaD target (ellipsoidal oblique
    stereographic, +a=6378144 +b=6356759 lat_0=50) inverts through
    the PROJ-form conformal-latitude path (functions/geo.py
    stere_ell_inverse), and the 50×10 swath resamples by the cell kNN
    join. radius_of_influence is a CHORD cutoff in the reference
    (kd-tree query on geocentric xyz), so the great-circle radius is
    chord-inverted first — one boundary pixel distinguishes the two
    conventions on this very fixture. data y·x / y + j·x sums over
    153102 matched pixels match to the integer."""
    import math

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import knn_join

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    il, ia = inverse(crs)("cx", "cy")
    tgt = area.grid(spark).select(
        F.col("cell_id").alias("tgt_id"), il.alias("lon"), ia.alias("lat")
    )
    src = spark.range(0, 500).select(
        F.col("id").alias("src_id"),
        (3.0 + (F.col("id") % 10)).alias("lon"),
        (75.0 - (F.col("id") / 10).cast("long")).alias("lat"),
    )
    r_gc = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    nn = knn_join(src, tgt, r_gc, k=1)
    got = nn.select(
        ((F.col("src_id") / 10).cast("long") * (F.col("src_id") % 10))
        .alias("v"),
        (F.col("src_id") / 10).cast("long").alias("yy"),
        (F.col("src_id") % 10).alias("xx"),
    ).agg(
        F.sum("v").alias("sv"), F.sum("yy").alias("sy"),
        F.sum("xx").alias("sx"), F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert got.sv == 15874591
    assert got.sy == 3530219 and got.sx == 688723
    assert got.n == 153102


_FROM_LATLON_EXPECTED = [
    129276., 141032., 153370., 165804., 178334., 190575., 202864.,
    214768., 226176., 238080.,
    133056., 146016., 158808., 171696., 184320., 196992., 209712.,
    222480., 234840., 247715.,
    137026., 150150., 163370., 177215., 190629., 203756., 217464.,
    230256., 243048., 256373.,
    140660., 154496., 168714., 182484., 196542., 210650., 224257.,
    238464., 251712., 265512.,
    144480., 158484., 173148., 187912., 202776., 217358., 231990.,
    246240., 259920., 274170.,
    147968., 163261., 178398., 193635., 208616., 223647., 238728.,
    253859., 268584., 283898.,
    151638., 167121., 182704., 198990., 214775., 230280., 246442.,
    261617., 276792., 292574.,
    154980., 171186., 187860., 204016., 220542., 237120., 253125.,
    269806., 285456., 301732.,
    158500., 175536., 192038., 209280., 226626., 243697., 260820.,
    277564., 293664., 310408.,
    161696., 179470., 197100., 214834., 232320., 250236., 267448.,
    285090., 302328., 320229.,
]


def test_reference_golden_image_from_lonlats(spark):
    """Reference get_image_from_lonlats golden (test_grid.py
    test_from_latlon): a 10×10 lon/lat grid sampled from the areaD
    800×800 image (data y·x) — ALL 100 published values must match.
    The engine path is the ellipsoidal stereographic FORWARD
    (stere_ell_xy) + the affine pixel-index floor + the (row, col)
    equi-join gather — the exact plan q_linesample_join uses, on the
    reference's own ellipsoidal CRS."""
    from pyresample_spark.operators.crs import forward

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    tgt = spark.range(0, 100).select(
        F.col("id").alias("i"),
        (F.col("id") % 10).cast("double").alias("lon"),
        (50.0 - 0.5 * (F.col("id") / 10).cast("long")).alias("lat"),
    )
    fx, fy = forward(crs)("lon", "lat")
    idx = tgt.select(
        "i",
        area.row_from_y(fy).alias("row"),
        area.col_from_x(fx).alias("col"),
    )
    img = spark.range(0, 800 * 800).select(
        (F.col("id") / 800).cast("long").alias("row"),
        (F.col("id") % 800).alias("col"),
        ((F.col("id") / 800).cast("long") * (F.col("id") % 800))
        .cast("double").alias("value"),
    )
    got = idx.join(img, ["row", "col"]).orderBy("i").collect()
    assert len(got) == 100
    assert [r.value for r in got] == _FROM_LATLON_EXPECTED


def test_reference_golden_nearest_area_to_swath(spark):
    """Reference area→swath kd-tree checksum (test_kd_tree.py
    test_nearest_1d, expected 35821299.0): the 800×800 areaD image
    (data row·col) resampled to a 500-point 1-D swath within a 50 km
    chord radius. Source lon/lats come from this engine's ellipsoidal
    stereographic inverse; the NN is the cell kNN join with 640k
    source points — the big-source direction of the golden fixtures."""
    import math

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import knn_join

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    il, ia = inverse(crs)("cx", "cy")
    src = area.grid(spark).select(
        F.col("cell_id").alias("src_id"), il.alias("lon"), ia.alias("lat"),
        (F.col("row") * F.col("col")).cast("double").alias("value"),
    )
    tgt = spark.range(0, 500).select(
        F.col("id").alias("tgt_id"),
        (3.0 + F.col("id") / 100.0).alias("lon"),
        (75.0 - F.col("id") / 10.0).alias("lat"),
    )
    r_gc = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    nn = knn_join(src, tgt, r_gc, k=1)
    got = (
        nn.join(src.select("src_id", "value"), "src_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert got.s == 35821299.0


def test_reference_golden_gauss_sparse_whole_grid(spark):
    """Reference gauss whole-grid checksum (test_kd_tree.py
    test_gauss_sparse, expected 15387753.9852 ± 5e-4): the 500-point
    swath gauss-resampled (r=50 km chord, σ=25 km, k=8, fill −1) onto
    the full 800×800 areaD grid through the fused gaussian fold.
    Matched pixels contribute Σwv/Σw; the 486 898 unmatched pixels
    contribute the −1 fill."""
    import math

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import knn_gauss_fold

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    il, ia = inverse(crs)("cx", "cy")
    tgt = area.grid(spark).select(
        F.col("cell_id").alias("tgt_id"), il.alias("lon"), ia.alias("lat")
    )
    src = spark.range(0, 500).select(
        F.col("id").alias("src_id"),
        (3.0 + (F.col("id") % 10)).alias("lon"),
        (75.0 - (F.col("id") / 10).cast("long")).alias("lat"),
        ((F.col("id") / 10).cast("long") * (F.col("id") % 10))
        .cast("double").alias("value"),
    )
    r_gc = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    g = knn_gauss_fold(src, tgt, r_gc, k=8, sigma=25000.0)
    row = g.agg(
        F.sum(F.col("swv") / F.col("v1")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    total = row.s + (-1.0) * (640_000 - row.n)
    assert row.n == 153102
    assert total == pytest.approx(15387753.9852, abs=5e-4)


def test_reference_golden_gauss_dense_500k_swath(spark):
    """Reference dense gauss checksum (test_kd_tree.py test_gauss,
    expected 4872.8100353517921): the 5000×100 = 500k-point swath
    gauss-resampled onto areaD, k=8 σ=25 km. Measured through this
    engine: 4872.810035351827 — |diff| 3.5e-11, far inside the
    reference's own assertAlmostEqual tolerance. ~160 s wall on
    local[32], so it runs only when SPARK_GRAFT_SLOW_GOLDENS=1 (the
    fast twin above covers the same code path every run)."""
    import math
    import os

    if not os.environ.get("SPARK_GRAFT_SLOW_GOLDENS"):
        pytest.skip("set SPARK_GRAFT_SLOW_GOLDENS=1 to run (~160 s)")

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import knn_gauss_fold

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    il, ia = inverse(crs)("cx", "cy")
    tgt = area.grid(spark).select(
        F.col("cell_id").alias("tgt_id"), il.alias("lon"), ia.alias("lat")
    )
    src = spark.range(0, 500_000).select(
        F.col("id").alias("src_id"),
        (3.0 + 0.1 * (F.col("id") % 100)).alias("lon"),
        (75.0 - 0.01 * (F.col("id") / 100).cast("long")).alias("lat"),
        (((F.col("id") / 100).cast("long") + (F.col("id") % 100)) * 1e-5)
        .alias("value"),
    )
    r_gc = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    g = knn_gauss_fold(src, tgt, r_gc, k=8, sigma=25000.0)
    s = g.agg(F.sum(F.col("swv") / F.col("v1")).alias("s")).collect()[0].s
    assert s == pytest.approx(4872.8100353517921, abs=5e-7)


def test_reference_golden_nearest_remap_roundtrip(spark):
    """Reference round-trip remap checksum (test_kd_tree.py
    test_nearest_remap, expected 22275.0): swath → areaD nearest
    (r=50 km chord, fill 0 for the 486 898 unmatched pixels), then the
    FULL filled image — fill pixels included as sources — remaps back
    to the swath within 5 km. 220 of the 500 swath points sit within
    5 km of a pixel center; their gathered values sum exactly to the
    reference's expectation. Exercises fill semantics and
    area-as-source in one fixture."""
    import math

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import knn_join

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    il, ia = inverse(crs)("cx", "cy")
    grid = area.grid(spark).select(
        F.col("cell_id"), il.alias("lon"), ia.alias("lat")
    )
    src = spark.range(0, 500).select(
        F.col("id").alias("src_id"),
        (3.0 + (F.col("id") % 10)).alias("lon"),
        (75.0 - (F.col("id") / 10).cast("long")).alias("lat"),
        ((F.col("id") / 10).cast("long") * (F.col("id") % 10))
        .cast("double").alias("value"),
    )
    r50 = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    r5 = 2.0 * R_EARTH * math.asin(5000.0 / (2.0 * R_EARTH))
    tgt1 = grid.select(F.col("cell_id").alias("tgt_id"), "lon", "lat")
    nn1 = knn_join(src, tgt1, r50, k=1).join(
        src.select("src_id", "value"), "src_id"
    )
    img = grid.join(
        nn1.select(F.col("tgt_id").alias("cell_id"), "value"),
        "cell_id", "left",
    ).select(
        "cell_id", "lon", "lat",
        F.coalesce("value", F.lit(0.0)).alias("value"),
    )
    tgt2 = src.select(F.col("src_id").alias("tgt_id"), "lon", "lat")
    src2 = img.select(
        F.col("cell_id").alias("src_id"), "lon", "lat", "value"
    )
    nn2 = knn_join(src2, tgt2, r5, k=1).join(
        src2.select("src_id", "value"), "src_id"
    )
    got = nn2.agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert got.n == 220
    assert got.s == 22275.0


def test_reference_golden_eurol_bucket_indices(spark):
    """Reference eurol bucket-index golden (test_bucket.py:128-135
    test_get_bucket_indices): the WGS84 POLAR ellipsoidal
    stereographic area ('eurol', lat_ts=60) with the fixture's four
    points at lon 25 / lat 60..60.3 must land in exactly the published
    pixel indices x=[1710, 1710, 1707, 1705], y=[465, 465, 459, 455].
    The forward runs this engine's Snyder 21-33..21-41 polar
    ellipsoidal form (+ellps=WGS84 resolved by the registry); the
    index math is the same affine floor every bucket plan uses."""
    from pyresample_spark.operators.crs import forward

    crs = "+proj=stere +ellps=WGS84 +lat_0=90.0 +lat_ts=60.0 +lon_0=0.0"
    area = AreaDefinition(
        "eurol", crs, 2560, 2048,
        (-3780000.0, -7644000.0, 3900000.0, -1500000.0),
    )
    df = spark.createDataFrame(
        [(0, 25.0, 60.0), (1, 25.0, 60.00001),
         (2, 25.0, 60.2), (3, 25.0, 60.3)],
        "i long, lon double, lat double",
    )
    fx, fy = forward(crs)("lon", "lat")
    rows = df.select(
        "i",
        area.col_from_x(fx).alias("x"),
        area.row_from_y(fy).alias("y"),
    ).orderBy("i").collect()
    assert [r.x for r in rows] == [1710, 1710, 1707, 1705]
    assert [r.y for r in rows] == [465, 465, 459, 455]


def test_reference_golden_data_reduce_cross_sum(spark):
    """Reference data-reduce checksum (test_data_reduce.py
    test_reduce, expected 20685125.0): the 1000×1000 global swath
    (data y + x) coarsely reduced against the areaD grid with a 7 km
    radius. The reduction window comes from area_reduce_info
    (operators/reduce.py): the grid's four boundary edges invert
    through the ellipsoidal stereographic scalar inverse, pole
    coverage is detected by the winding angle sum, and the lon window
    is buffered with the reference's 1/sin(max|lat|) convergence
    factor — the predicate then filters the swath map-side and the
    kept data sums exactly to the reference's expectation (15875 of
    1M points survive)."""
    from pyresample_spark.operators.reduce import area_reduce_predicate

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    sw = spark.range(0, 1_000_000).select(
        (F.col("id") / 1000).cast("long").alias("y"),
        (F.col("id") % 1000).alias("x"),
    ).select(
        (-180.0 + 0.36 * F.col("x")).alias("lon"),
        (-90.0 + 0.18 * F.col("y")).alias("lat"),
        (F.col("y") + F.col("x")).cast("double").alias("data"),
    )
    kept = sw.filter(area_reduce_predicate(area, 7000.0))
    got = kept.agg(
        F.sum("data").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert got.n == 15875
    assert got.s == 20685125.0


def test_reference_golden_data_reduce_pole_coverage(spark):
    """Reference pole-coverage reduce checksum (test_data_reduce.py
    test_reduce_north_pole, expected 999000000.0): the Antarctic
    EASE grid (laea lat_0=−90, +a=6371228 sphere) COVERS the south
    pole, so the winding angle sum selects the lat-only branch and the
    entire inner-EASE swath survives — Σ(y + x) over 1000×1000 =
    999 000 000 exactly. Validates the winding-number pole detection
    on a boundary that wraps the full longitude range (and the +a
    custom-sphere radius now flows through the laea registry)."""
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.reduce import (
        area_reduce_info,
        area_reduce_predicate,
    )

    crs = "+proj=laea +lat_0=-90 +lon_0=0 +a=6371228.0 +units=m"
    big = AreaDefinition(
        "ease_sh", crs, 425, 425,
        (-5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625),
    )
    small = AreaDefinition(
        "ease_sh_inner", crs, 1000, 1000,
        (-532684.0625, -532684.0625, 532684.0625, 532684.0625),
    )
    assert area_reduce_info(big, 7000.0)["mode"] == "sp"
    il, ia = inverse(crs)("cx", "cy")
    sw = small.grid(spark).select(
        il.alias("lon"), ia.alias("lat"),
        (F.col("row") + F.col("col")).cast("double").alias("data"),
    )
    kept = sw.filter(area_reduce_predicate(big, 7000.0))
    got = kept.agg(
        F.sum("data").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert got.n == 1_000_000
    assert got.s == 999_000_000.0


def test_reference_golden_msg_quick_resample(spark):
    """Reference MSG full-disc quick-resample checksum (test_image.py
    test_image / test_image_segments, expected 399936.39392500359):
    the 3712×3712 SEVIRI image (data y·x·10⁻⁶, the ELLIPSOIDAL geos
    CRS a=6378169 b=6356584 h=35785831) quick-resampled onto areaD.
    The engine path: areaD pixel centers invert through the
    ellipsoidal stereographic, forward through the ellipsoidal
    geostationary (functions/geo.py geos_ell_xy — PROJ's
    geocentric-latitude view vector), floor to MSG (row, col), and the
    value is the index arithmetic — matches the published sum to
    ~4e-9, inside the reference's own assertAlmostEqual."""
    from pyresample_spark.operators.crs import forward, inverse

    crs_d = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
             "+lat_ts=50.0 +lon_0=8.0")
    areaD = AreaDefinition(
        "areaD", crs_d, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    crs_m = ("+proj=geos +a=6378169.0 +b=6356584.0 +h=35785831.0 "
             "+lon_0=0")
    msg = AreaDefinition(
        "msg_full", crs_m, 3712, 3712,
        (-5568742.4000000004, -5568742.4000000004,
         5568742.4000000004, 5568742.4000000004),
    )
    il, ia = inverse(crs_d)("cx", "cy")
    tgt = areaD.grid(spark).select(il.alias("lon"), ia.alias("lat"))
    gx, gy = forward(crs_m)("lon", "lat")
    col = msg.col_from_x(gx)
    row = msg.row_from_y(gy)
    ok = (
        col.isNotNull() & (col >= 0) & (col <= 3711)
        & (row >= 0) & (row <= 3711)
    )
    val = (row * col).cast("double") * 1e-6
    got = tgt.select(F.when(ok, val).otherwise(0.0).alias("v")).agg(
        F.sum("v").alias("s")
    ).collect()[0]
    assert got.s == pytest.approx(399936.39392500359, abs=5e-8)


def test_reference_golden_msg_nearest_resample(spark):
    """Reference MSG nearest-resample checksum (test_image.py
    test_nearest_neighbour, expected 399936.70287099993): the full
    3712×3712 SEVIRI disc (ellipsoidal geos; ~10.2M on-disc pixels,
    data y·x·10⁻⁶) nearest-resampled onto areaD within a 50 km chord
    radius through the cell kNN join — the largest-source golden in
    the reference suite, matched to 5e-10 with every one of the 640k
    target pixels assigned. Source lon/lats come from the ellipsoidal
    geos inverse (off-disc pixels NULL out before the join)."""
    import math

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import knn_join

    crs_d = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
             "+lat_ts=50.0 +lon_0=8.0")
    areaD = AreaDefinition(
        "areaD", crs_d, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    crs_m = ("+proj=geos +a=6378169.0 +b=6356584.0 +h=35785831.0 "
             "+lon_0=0")
    msg = AreaDefinition(
        "msg_full", crs_m, 3712, 3712,
        (-5568742.4000000004, -5568742.4000000004,
         5568742.4000000004, 5568742.4000000004),
    )
    ild, iad = inverse(crs_d)("cx", "cy")
    tgt = areaD.grid(spark).select(
        F.col("cell_id").alias("tgt_id"), ild.alias("lon"), iad.alias("lat")
    )
    ilm, iam = inverse(crs_m)("cx", "cy")
    src = msg.grid(spark).select(
        F.col("cell_id").alias("src_id"), ilm.alias("lon"), iam.alias("lat"),
        ((F.col("row") * F.col("col")).cast("double") * 1e-6).alias("value"),
    ).filter(F.col("lon").isNotNull())
    r_gc = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    nn = knn_join(src, tgt, r_gc, k=1).join(
        src.select("src_id", "value"), "src_id"
    )
    got = nn.agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert got.n == 640_000
    assert got.s == pytest.approx(399936.70287099993, abs=5e-8)


def test_reference_golden_proj_coords_and_latlons(spark):
    """Reference areaD2 coordinate checksums (test_grid.py
    test_proj_coords = 2977965.9999999963 and test_latlons =
    1440.8280578215431): the 5×5 ellipsoidal-stereographic area's
    projected pixel-center sum is pure affine arithmetic, and the
    lon+lat sum exercises the ellipsoidal inverse directly against
    PROJ's published value — a 25-point, 7-decimal-place check of
    stere_ell_inverse with no resampling in between."""
    from pyresample_spark.operators.crs import inverse

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD2", crs, 5, 5,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    g = area.grid(spark)
    pc = g.agg((F.sum("cx") + F.sum("cy")).alias("s")).collect()[0]
    assert pc.s == pytest.approx(2977965.9999999963, abs=5e-7)
    il, ia = inverse(crs)("cx", "cy")
    ll = g.select(il.alias("lon"), ia.alias("lat")).agg(
        (F.sum("lon") + F.sum("lat")).alias("s")
    ).collect()[0]
    assert ll.s == pytest.approx(1440.8280578215431, abs=5e-8)


def test_reference_golden_custom_uncert(spark):
    """Reference custom-weight uncertainty golden (test_kd_tree.py
    test_custom_uncert): wf(d) = 1 − d/100000 over the 3-point fixture
    within 100 km → result 2.32193149, stddev 0.81817972, count 3
    (±1e-5). Same v1/(v1²−v2) unbiased weighted variance as the gauss
    path, with a user weight function instead of the gaussian
    kernel."""
    import math

    from pyresample_spark.operators.knn import knn_join

    src = spark.createDataFrame(
        [
            (0, 1.0, 11.280789, 56.011037),
            (1, 2.0, 12.649354, 55.629675),
            (2, 3.0, 12.080402, 55.641535),
        ],
        "src_id long, value double, lon double, lat double",
    )
    tgt = spark.createDataFrame(
        [(0, 12.562036, 55.715613)], "tgt_id long, lon double, lat double"
    )
    pairs = knn_join(src, tgt, 100_000.0, k=None).join(
        src.select("src_id", "value"), "src_id"
    )
    w = 1.0 - F.col("dist_m") / 100_000.0
    g = pairs.groupBy("tgt_id").agg(
        F.sum(w).alias("v1"),
        F.sum(w * w).alias("v2"),
        F.sum(w * F.col("value")).alias("swv"),
        F.sum(w * F.col("value") * F.col("value")).alias("swv2"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    res = g.swv / g.v1
    stddev = math.sqrt(
        (g.v1 / (g.v1 * g.v1 - g.v2)) * (g.swv2 - g.swv * g.swv / g.v1)
    )
    assert g.n == 3
    assert abs(res - 2.32193149) < 1e-5
    assert abs(stddev - 0.81817972) < 1e-5


def test_reference_golden_gauss_multi_sigma_500k_swath(spark):
    """Reference multi-channel gauss checksum (test_kd_tree.py
    test_gauss_multi, expected 1461.8429990248171): the 500k-point
    swath with per-channel sigmas [25, 15, 10] km. The top-8 neighbour
    set is sigma-independent, so ONE cell kNN pass feeds all three
    channel folds — the LUT-reuse shape q_multichannel_gauss runs in
    production. Measured through this engine: matches to 3.7e-11
    (~110 s wall), so like the dense single-sigma golden it runs only
    with SPARK_GRAFT_SLOW_GOLDENS=1."""
    import math
    import os

    if not os.environ.get("SPARK_GRAFT_SLOW_GOLDENS"):
        pytest.skip("set SPARK_GRAFT_SLOW_GOLDENS=1 to run (~110 s)")

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import knn_join

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD", crs, 800, 800,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    il, ia = inverse(crs)("cx", "cy")
    tgt = area.grid(spark).select(
        F.col("cell_id").alias("tgt_id"), il.alias("lon"), ia.alias("lat")
    )
    src = spark.range(0, 500_000).select(
        F.col("id").alias("src_id"),
        (3.0 + 0.1 * (F.col("id") % 100)).alias("lon"),
        (75.0 - 0.01 * (F.col("id") / 100).cast("long")).alias("lat"),
        (((F.col("id") / 100).cast("long") + (F.col("id") % 100)) * 1e-6)
        .alias("value"),
    )
    r_gc = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    pairs = knn_join(src, tgt, r_gc, k=8).join(
        src.select("src_id", "value"), "src_id"
    )
    aggs = []
    for s_ in (25000.0, 15000.0, 10000.0):
        w = F.exp(-(F.col("dist_m") * F.col("dist_m")) / (s_ * s_))
        aggs += [
            F.sum(w * F.col("value")).alias(f"swv_{int(s_)}"),
            F.sum(w).alias(f"v1_{int(s_)}"),
        ]
    g = pairs.groupBy("tgt_id").agg(*aggs)
    total = g.select(
        (F.col("swv_25000") / F.col("v1_25000")
         + F.col("swv_15000") / F.col("v1_15000")
         + F.col("swv_10000") / F.col("v1_10000")).alias("v")
    ).agg(F.sum("v")).collect()[0][0]
    assert total == pytest.approx(1461.8429990248171, abs=5e-7)


_DENSE_TWIN_CACHE: dict = {}


def _dense_gauss_twin_fixture(spark):
    """Shared fixture for the un-gated dense-gauss twins (VERDICT r5
    item 3): the 500k-swath goldens' exact geometry at reduced density —
    5k-source swath (same lon 3→12.9 / lat 65→25.8 footprint) onto
    areaD's ellipsoidal-stere extent at 96×96 — plus a numpy
    brute-force top-8-within-radius oracle replicating the engine's
    quantize/tie-break contract (dist_mm = floor(chord·1000+0.5),
    order by (dist_mm, src_id)). Returns (src, tgt, r_gc, dmm[n,8],
    val[n,8], valid[n,8]) with the oracle arrays row-aligned to the
    grid; memoized so both twins pay the O(n_tgt·n_src) scan once."""
    if "v" in _DENSE_TWIN_CACHE:
        return _DENSE_TWIN_CACHE["v"]
    import math

    import numpy as np

    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.knn import chord_length

    crs = ("+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
           "+lat_ts=50.0 +lon_0=8.0")
    area = AreaDefinition(
        "areaD_coarse", crs, 96, 96,
        (-1370912.72, -909968.64000000001,
         1029087.28, 1490031.3600000001),
    )
    il, ia = inverse(crs)("cx", "cy")
    tgt = area.grid(spark).select(
        F.col("cell_id").alias("tgt_id"), il.alias("lon"), ia.alias("lat")
    )
    src = spark.range(0, 5_000).select(
        F.col("id").alias("src_id"),
        (3.0 + 0.1 * (F.col("id") % 100)).alias("lon"),
        (65.0 - 0.8 * (F.col("id") / 100).cast("long")).alias("lat"),
        (((F.col("id") / 100).cast("long") + (F.col("id") % 100)) * 1e-5)
        .alias("value"),
    )
    r_gc = 2.0 * R_EARTH * math.asin(50000.0 / (2.0 * R_EARTH))
    tp = tgt.orderBy("tgt_id").toPandas()
    sp = src.toPandas()

    def xyz(lon, lat):
        lo, la = np.radians(lon), np.radians(lat)
        return np.stack(
            [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)],
            axis=1,
        ) * R_EARTH

    T = xyz(tp["lon"].to_numpy(), tp["lat"].to_numpy())
    S = xyz(sp["lon"].to_numpy(), sp["lat"].to_numpy())
    vals = sp["value"].to_numpy()
    sid = sp["src_id"].to_numpy().astype(np.int64)
    cmm = round(chord_length(r_gc) * 1000.0)
    k, n, m = 8, T.shape[0], S.shape[0]
    sent = np.iinfo(np.int64).max
    dmm_top = np.empty((n, k), dtype=np.int64)
    key_top = np.empty((n, k), dtype=np.int64)
    for i0 in range(0, n, 2000):
        i1 = min(i0 + 2000, n)
        # same IEEE op order as chord_dist_m (dx·dx + dy·dy + dz·dz,
        # then sqrt) so dmm matches the engine bit-for-bit — no
        # boundary flips at the radius cutoff or in tie-breaks
        dx = T[i0:i1, 0:1] - S[None, :, 0]
        dy = T[i0:i1, 1:2] - S[None, :, 1]
        dz = T[i0:i1, 2:3] - S[None, :, 2]
        d = np.sqrt(dx * dx + dy * dy + dz * dz)
        # astype truncates toward zero == floor for non-negative input
        dmm = (d * 1000.0 + 0.5).astype(np.int64)
        # (dist_mm, src_id) packed — src_id < 16384 by construction
        key = np.where(dmm <= cmm, dmm * 16384 + sid[None, :], sent)
        sel = np.sort(np.partition(key, k - 1, axis=1)[:, :k], axis=1)
        key_top[i0:i1] = sel
        dmm_top[i0:i1] = np.where(sel < sent, sel // 16384, 0)
    valid = key_top < sent
    idx = np.where(valid, key_top % 16384, 0)
    val_top = np.where(valid, vals[idx], 0.0)
    out = (src, tgt, r_gc, dmm_top, val_top, valid)
    _DENSE_TWIN_CACHE["v"] = out
    return out


def test_dense_gauss_twin_fused_fold(spark):
    """Un-gated twin of the 500k dense-gauss golden (VERDICT r5 item
    3): same swath footprint / areaD stere geometry / k=8 σ=25 km
    through the FUSED knn_gauss_fold plan at 5k sources, checked
    cell-for-cell against the in-test numpy brute-force oracle — so a
    regression in the cell join, the packed top-8, or the gauss fold
    fails a default ``pytest tests/`` instead of hiding behind
    SPARK_GRAFT_SLOW_GOLDENS."""
    import numpy as np

    from pyresample_spark.operators.knn import knn_gauss_fold

    src, tgt, r_gc, dmm, val, valid = _dense_gauss_twin_fixture(spark)
    g = knn_gauss_fold(src, tgt, r_gc, k=8, sigma=25000.0)
    row = g.agg(
        F.sum(F.col("swv") / F.col("v1")).alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum("n_neighbours").alias("pairs"),
    ).collect()[0]
    w = np.where(valid, np.exp(-((dmm / 1000.0) ** 2) / 25000.0 ** 2), 0.0)
    matched = valid.any(axis=1)
    expect = float((w[matched] * val[matched]).sum(axis=1).__truediv__(
        w[matched].sum(axis=1)).sum())
    assert row.n == int(matched.sum())
    assert row.pairs == int(valid.sum())
    assert row.s == pytest.approx(expect, rel=1e-9, abs=1e-6)


def test_dense_gauss_twin_multi_sigma(spark):
    """Un-gated twin of the 500k multi-sigma golden (VERDICT r5 item
    3): the TWO-STAGE plan (knn_join k=8 → value join → per-channel
    gaussian aggs) with per-channel sigmas [25, 15, 10] km at 5k
    sources, against the same numpy oracle — one kNN pass feeding all
    three channel folds, the q_multichannel_gauss production shape."""
    import numpy as np

    from pyresample_spark.operators.knn import knn_join

    src, tgt, r_gc, dmm, val, valid = _dense_gauss_twin_fixture(spark)
    pairs = knn_join(src, tgt, r_gc, k=8).join(
        src.select("src_id", "value"), "src_id"
    )
    aggs = []
    for s_ in (25000.0, 15000.0, 10000.0):
        w = F.exp(-(F.col("dist_m") * F.col("dist_m")) / (s_ * s_))
        aggs += [
            F.sum(w * F.col("value")).alias(f"swv_{int(s_)}"),
            F.sum(w).alias(f"v1_{int(s_)}"),
        ]
    g = pairs.groupBy("tgt_id").agg(*aggs)
    total = g.select(
        (F.col("swv_25000") / F.col("v1_25000")
         + F.col("swv_15000") / F.col("v1_15000")
         + F.col("swv_10000") / F.col("v1_10000")).alias("v")
    ).agg(F.sum("v")).collect()[0][0]
    matched = valid.any(axis=1)
    expect = 0.0
    for s_ in (25000.0, 15000.0, 10000.0):
        w = np.where(valid, np.exp(-((dmm / 1000.0) ** 2) / s_ ** 2), 0.0)
        expect += float(
            ((w[matched] * val[matched]).sum(axis=1)
             / w[matched].sum(axis=1)).sum()
        )
    assert total == pytest.approx(expect, rel=1e-9, abs=1e-6)


def test_estimate_radius_of_influence():
    """The reference's default-radius estimation (kd_tree.py:950-968):
    max of source/target geocentric pixel spacings, 10 km fallback
    when nothing is estimable. The 2° world grid spacing is ~222 km at
    the equator-adjacent mid-row; an unknown CRS yields the fallback."""
    from pyresample_spark.plans.planner import (
        RADIUS_FALLBACK_M,
        area_geocentric_resolution,
        estimate_radius_of_influence,
    )

    world = AreaDefinition(
        "w", "longlat", 180, 90, (-180.0, -90.0, 180.0, 90.0)
    )
    fine = AreaDefinition(
        "f", "longlat", 3600, 1800, (-180.0, -90.0, 180.0, 90.0)
    )
    r_world = area_geocentric_resolution(world)
    r_fine = area_geocentric_resolution(fine)
    assert 180_000 < r_world < 250_000          # ~2° pixels
    assert 9_000 < r_fine < 13_000              # ~0.1° pixels
    # nanmax semantics: the coarser side dominates
    assert estimate_radius_of_influence(fine, world) == r_world
    # nothing estimable → the reference's 10 km fallback
    bogus = AreaDefinition("b", "+proj=bogus", 10, 10, (0.0, 0.0, 1.0, 1.0))
    assert estimate_radius_of_influence(bogus, None) == RADIUS_FALLBACK_M
    # ellipsoidal stere area estimates through the scalar inverse
    areaD = AreaDefinition(
        "areaD",
        "+proj=stere +a=6378144.0 +b=6356759.0 +lat_0=50.0 "
        "+lat_ts=50.0 +lon_0=8.0",
        800, 800,
        (-1370912.72, -909968.64, 1029087.28, 1490031.36),
    )
    rd = area_geocentric_resolution(areaD)
    assert 2_500 < rd < 3_500                   # ~3 km pixels


def test_bloom_literal_flag_no_false_negatives(spark):
    """The extracted Bloom builder (operators/dedup.py
    bloom_literal_flag, shared by q_bloom_decontaminate and the
    streaming twin): every member hash MUST pass the plan-literal
    predicate (the zero-false-negative guarantee the decontamination
    equality proof rests on), and the false-positive rate over a
    disjoint probe set stays within a loose k=4/m=1024 bound."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.dedup import (
        bloom_literal_flag,
        md5_bigint,
    )

    members = (
        spark.range(200)
        .select(md5_bigint(F.concat(F.lit("m"), F.col("id"))).alias("h0"))
    )
    hashes = [r.h0 for r in members.collect()]
    flag = bloom_literal_flag(hashes)
    assert members.filter(~flag).count() == 0  # no false negatives
    probes = (
        spark.range(5000)
        .select(md5_bigint(F.concat(F.lit("x"), F.col("id"))).alias("h0"))
    )
    fp = probes.filter(flag).count()
    # k=4, m=1024, n=200 → p_fp = (1 - e^(-kn/m))^k ≈ 0.088; allow 2×
    assert fp / 5000.0 < 0.2


def test_ann_ivf_index_persist_and_reuse(spark, sf_dir, tmp_path):
    """Round 6: the persisted IVF index (q_ann_ivf_reuse). Second
    access must LOAD the bucketed table (no assignment recompute), the
    probe join must not shuffle the index side (bucketed scan is
    already hash-partitioned on centroid_id + broadcast probes), and
    the search through the index must equal the fresh search."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.similarity import (
        dot,
        ivf_assign,
        topk_by_cosine,
        with_norm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def compute():
        centroids = emb.filter(F.col("vec_id") % 50 == 0)
        assign = ivf_assign(emb, centroids)
        embn = with_norm(emb).select("vec_id", "embedding", "vnorm")
        return embn.join(assign, "vec_id").select(
            "centroid_id", "vec_id", "embedding", "vnorm"
        )

    cache = LutCache(str(tmp_path / "ivf"), bucket_col="centroid_id")
    cache.get_or_compute(spark, "e", "c", 0.0, 1, compute)

    def boom():
        raise AssertionError("index recomputed on second access")

    idx = cache.get_or_compute(spark, "e", "c", 0.0, 1, boom)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "lut_" in plan

    def search(index):
        probes = index.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("pv"),
            F.col("vnorm").alias("pn"),
            "centroid_id",
        )
        cand = index.join(F.broadcast(probes), "centroid_id").filter(
            F.col("vec_id") != F.col("probe_id")
        )
        cos = dot(F.col("embedding"), F.col("pv")) / (
            F.col("vnorm") * F.col("pn")
        )
        return topk_by_cosine(
            cand.withColumn("cos_raw", cos), 5, cos_col="cos_raw"
        )

    got = search(idx)
    # the candidate join must not re-shuffle the bucketed index side
    cand_plan = (
        idx.join(
            F.broadcast(idx.limit(3).select("centroid_id")), "centroid_id"
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in cand_plan
    key = lambda r: (r.probe_id, r.rank, r.vec_id,  # noqa: E731
                     round(r.cos_raw, 9))
    assert sorted(map(key, got.collect())) == sorted(
        map(key, search(compute()).collect())
    )


def test_knn_neighbor_schemes_identical_pairs(spark):
    """The 8-neighbor/2c cell scheme must produce EXACTLY the pair set
    of the default 27-neighbor/c scheme (it is an exact geometry, not
    an approximation): per axis, a point's ±c ball can only spill into
    the adjacent 2c-cell on the side it sits closer to. Measured
    trade in PERF.md (probe shuffle 27x -> 8x vs ~1.7x more pairs
    through the distance filter)."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.knn import (
        _radius_pairs,
        chord_length,
        knn_join,
    )

    src = spark.range(4000).select(
        F.col("id").alias("src_id"),
        (F.pmod(F.hash(F.col("id") * 7 + 1), F.lit(36000)) / 100.0 - 180.0)
        .alias("lon"),
        (F.pmod(F.hash(F.col("id") * 13 + 5), F.lit(17000)) / 100.0 - 85.0)
        .alias("lat"),
    )
    tgt = spark.range(500).select(
        F.col("id").alias("tgt_id"),
        (F.pmod(F.hash(F.col("id") * 3 + 2), F.lit(36000)) / 100.0 - 180.0)
        .alias("lon"),
        (F.pmod(F.hash(F.col("id") * 5 + 9), F.lit(17000)) / 100.0 - 85.0)
        .alias("lat"),
    )
    c = chord_length(300_000.0)
    a = set(map(tuple, _radius_pairs(src, tgt, c).collect()))
    b = set(map(
        tuple, _radius_pairs(src, tgt, c, neighbor_scheme="2c8").collect()
    ))
    assert a == b and len(a) > 1000
    # end-to-end: identical k=2 results through knn_join
    ka = sorted(map(tuple, knn_join(src, tgt, 300_000.0, k=2).collect()))
    kb = sorted(map(tuple, knn_join(
        src, tgt, 300_000.0, k=2, neighbor_scheme="2c8"
    ).collect()))
    assert ka == kb
    with pytest.raises(ValueError, match="neighbor_scheme"):
        _radius_pairs(src, tgt, c, neighbor_scheme="c9")


# --- gradient-search walk (operators/gradient_walk.py) ---


def test_gradient_walk_affine_exact(spark):
    """On a PURE affine swath the walk's fixed point is the affine
    inverse: every pixel must converge (it small) with fl/fp equal to
    the closed-form fractional index."""
    from pyresample_spark.operators.gradient_walk import gradient_walk

    L, P = 20, 25
    # sx = 10 + 4p, sy = 5 + 3l  (axis-aligned affine)
    src = (
        spark.range(L * P)
        .select(
            (F.col("id") / P).cast("bigint").alias("l"),
            (F.col("id") % P).cast("bigint").alias("p"),
        )
        .withColumn("sx", F.lit(10.0) + F.lit(4.0) * F.col("p"))
        .withColumn("sy", F.lit(5.0) + F.lit(3.0) * F.col("l"))
        .withColumn("value", (F.col("l") * 10 + F.col("p")).cast("double"))
    )
    tgt = spark.createDataFrame(
        [(0, 30.0, 20.0), (1, 51.0, 35.5), (2, 10.0, 5.0),
         (3, 100.4, 50.9)],
        "tgt_id long, dstx double, dsty double",
    )
    out = {
        r["tgt_id"]: r
        for r in gradient_walk(tgt, src, lmax=L - 1, pmax=P - 1).collect()
    }
    for tid, (dstx, dsty) in {0: (30.0, 20.0), 1: (51.0, 35.5),
                              2: (10.0, 5.0), 3: (100.4, 50.9)}.items():
        r = out[tid]
        assert r["fp"] == pytest.approx((dstx - 10.0) / 4.0, abs=1e-9)
        assert r["fl"] == pytest.approx((dsty - 5.0) / 3.0, abs=1e-9)
        assert r["it"] <= 3
    # nn gather: tgt 1 → fp=10.25, fl=10.1666 → nearest (10, 10)
    assert out[1]["nn_value"] == 110.0
    # bil on a bilinear value surface reproduces it exactly
    fl, fp = out[3]["fl"], out[3]["fp"]
    assert out[3]["bil_value"] == pytest.approx(fl * 10 + fp, abs=1e-9)


def test_gradient_walk_warped_converges(spark):
    """The warped demo swath (cross-term, no affine inverse): all
    in-span targets converge, fractional indices round-trip through
    the FORWARD warp to the requested coordinates."""
    from pyresample_spark.operators.gradient_walk import (
        SWATH_L, SWATH_P, demo_swath, demo_target, gradient_walk,
    )

    out = gradient_walk(
        demo_target(spark), demo_swath(spark),
        lmax=SWATH_L - 1, pmax=SWATH_P - 1,
    ).collect()
    assert len(out) == 2000
    for r in out[:200]:
        # forward warp of (fl, fp) must return (dstx, dsty); the demo
        # target grid: tgt_id = trow*50 + tcol
        trow, tcol = r["tgt_id"] // 50, r["tgt_id"] % 50
        dstx, dsty = 420.0 + 150.0 * tcol, 350.0 + 170.0 * trow
        fl, fp = r["fl"], r["fp"]
        sx = 50.0 + 100.0 * fp + 3.0 * fl + 0.05 * (fl * fp)
        sy = 80.0 + 120.0 * fl + 2.0 * fp + 0.04 * (fl * fp)
        # Newton linearizes the cross term → sub-pixel-quadratic error
        assert abs(sx - dstx) < 0.5 and abs(sy - dsty) < 0.5
        assert 1 <= r["it"] <= 8


# --- general-CRS pandas-UDF path (operators/proj_udf.py) ---


def test_proj_udf_mock_transformer(spark):
    """VERDICT r6 item 9: drive _proj_udf_columns' real plumbing
    (Arrow batching, struct-return schema, NULL/NaN handling, column
    naming) with an injected pure-python transformer — the exact path
    a cluster with pyproj takes, minus the C library."""
    import math

    from pyresample_spark.operators.proj_udf import proj_columns

    # defined in-function so cloudpickle ships it BY VALUE to the
    # worker (a test-module-level class would need `test_operators`
    # importable executor-side)
    class _ShiftTransformer:
        """Plate-carrée-shift stand-in for a pyproj Transformer:
        x = lon + 10, y = lat / 2; NaN passes through like PROJ inf."""

        def transform(self, lons, lats):
            return lons + 10.0, lats / 2.0

    def _shift_factory():
        return _ShiftTransformer()

    df = spark.createDataFrame(
        [(0, -170.0, -80.0), (1, 0.0, 0.0), (2, 179.5, 45.0),
         (3, float("nan"), 10.0), (4, None, None)],
        "id long, lon double, lat double",
    )
    out = proj_columns(
        df, "+proj=anything_exotic", transformer_factory=_shift_factory
    ).orderBy("id").collect()
    assert [r["x"] for r in out[:3]] == [-160.0, 10.0, 189.5]
    assert [r["y"] for r in out[:3]] == [-40.0, 0.0, 22.5]
    # missing in → missing out (None or NaN: Arrow may round-trip a
    # pandas NaN as SQL null), never a fabricated coordinate
    def _missing(v):
        return v is None or math.isnan(v)

    assert _missing(out[3]["x"]) and out[3]["y"] == 5.0
    assert _missing(out[4]["x"]) and _missing(out[4]["y"])
    # schema: injected path yields plain double x/y columns
    sch = dict(proj_columns(
        df, "x", transformer_factory=_shift_factory
    ).dtypes)
    assert sch["x"] == "double" and sch["y"] == "double"


def test_proj_udf_gated_without_pyproj(spark):
    """Without pyproj and without an injected transformer, an exotic
    CRS must raise NotImplementedError (never silently wrong)."""
    from pyresample_spark.operators import proj_udf

    if proj_udf.HAS_PYPROJ:  # pragma: no cover - env-dependent
        pytest.skip("pyproj present in this environment")
    df = spark.range(1).select(
        F.lit(1.0).alias("lon"), F.lit(2.0).alias("lat")
    )
    with pytest.raises(NotImplementedError):
        proj_udf.proj_columns(df, "+proj=igh")


def test_ewa_multiband_matches_singleband(spark):
    """Each channel of the single-pass multiband EWA must equal the
    single-band operator run on that channel alone (same footprint,
    same weights — fornav_wrapper parity)."""
    from pyresample_spark.operators.ewa import (
        ewa_fornav,
        ewa_fornav_multiband,
    )
    from pyresample_spark.queries.joins import KNN_AREA

    pts = spark.createDataFrame(
        [(float(-20 + i), float(30 + 0.5 * i), float(i % 7) + 0.5)
         for i in range(60)],
        "lon double, lat double, value double",
    ).withColumn("ch2", F.col("value") * 2.0 + 1.0)
    mb = {
        r["cell_id"]: r
        for r in ewa_fornav_multiband(
            pts, KNN_AREA, ("value", "ch2")
        ).collect()
    }
    for vc in ("value", "ch2"):
        sb = ewa_fornav(pts, KNN_AREA, value_col=vc).collect()
        assert len(sb) == len(mb) > 0
        for r in sb:
            m = mb[r["cell_id"]]
            assert m[f"ewa_{vc}"] == pytest.approx(r["ewa_value"], rel=1e-12)
            assert m["weight_sum"] == pytest.approx(r["weight_sum"], rel=1e-12)
            assert m["n_contrib"] == r["n_contrib"]


def test_gradient_walk_out_of_span_excluded(spark):
    """Targets whose coordinates lie outside the swath must NOT
    converge to a fabricated index: the walk clamps at the grid edge,
    the Newton step keeps pointing outward, and the final fl/fp bounds
    filter drops the pixel (reference: unconverged stays NaN,
    _gradient_search.pyx:199-205)."""
    from pyresample_spark.operators.gradient_walk import gradient_walk

    L, P = 10, 12
    src = (
        spark.range(L * P)
        .select(
            (F.col("id") / P).cast("bigint").alias("l"),
            (F.col("id") % P).cast("bigint").alias("p"),
        )
        .withColumn("sx", F.lit(0.0) + F.lit(2.0) * F.col("p"))
        .withColumn("sy", F.lit(0.0) + F.lit(3.0) * F.col("l"))
        .withColumn("value", F.col("l").cast("double"))
    )
    tgt = spark.createDataFrame(
        [(0, 5.0, 6.0),        # inside
         (1, 500.0, 6.0),      # far outside +x
         (2, 5.0, -400.0),     # far outside -y
         (3, 22.0, 27.0)],     # inside (exact grid node)
        "tgt_id long, dstx double, dsty double",
    )
    out = {r["tgt_id"]: r for r in
           gradient_walk(tgt, src, lmax=L - 1, pmax=P - 1).collect()}
    assert set(out) == {0, 3}
    assert out[0]["fp"] == pytest.approx(2.5) and out[0]["fl"] == pytest.approx(2.0)
    assert out[3]["fp"] == pytest.approx(11.0) and out[3]["fl"] == pytest.approx(9.0)


def test_ewa_elliptical_multiband_matches_singleband(spark):
    """Elliptical fornav with extra channels: each extra channel must
    equal a single-band run on that channel (shared ellipse, shared
    quantized weights — the elliptical half of fornav_wrapper's
    k-channel pass)."""
    from pyresample_spark.operators.ewa import ewa_fornav_elliptical
    from pyresample_spark.queries.joins import KNN_AREA

    rows = []
    for sr in range(8):
        for c in range(12):
            rows.append((
                sr, c,
                float(-30 + 2.1 * c + 0.3 * sr),
                float(20 + 1.7 * sr + 0.1 * c),
                float((sr * 12 + c) % 11) + 0.25,
            ))
    swath = spark.createDataFrame(
        rows, "swath_row long, col long, lon double, lat double, value double"
    ).withColumn("ch2", F.col("value") * 3.0 - 2.0)
    mb = {
        r["cell_id"]: r
        for r in ewa_fornav_elliptical(
            swath, KNN_AREA, rows_per_scan=4, swath_cols=12,
            extra_value_cols=("ch2",),
        ).collect()
    }
    sb = ewa_fornav_elliptical(
        swath.withColumn("value", F.col("ch2")), KNN_AREA,
        rows_per_scan=4, swath_cols=12,
    ).collect()
    assert len(sb) == len(mb) > 0
    for r in sb:
        m = mb[r["cell_id"]]
        assert m["ewa_ch2"] == pytest.approx(r["ewa_value"], rel=1e-12)
        assert m["weight_sum"] == pytest.approx(r["weight_sum"], rel=1e-12)
        assert m["n_contrib"] == r["n_contrib"]


def test_gradient_resampler_method(spark):
    """The facade's 'gradient' strategy resamples a lon/lat swath grid
    onto an eqc target using ONLY the target CRS's forward transform;
    on this regular source the walk's fixed point is the exact affine
    index, so the nn gather must match the closed-form nearest pixel
    and bil must reproduce a bilinear value surface exactly."""
    from pyresample_spark.geometry import AreaDefinition
    from pyresample_spark.image import GeoImage

    # source: 30x40 longlat grid over [0,40]x[20,50], value = row*40+col
    src_area = AreaDefinition("s", "longlat", 40, 30, (0.0, 20.0, 40.0, 50.0))
    src = (
        src_area.grid(spark)
        .select("row", "col", F.col("cx").alias("lon"),
                F.col("cy").alias("lat"))
        .withColumn(
            "value", (F.col("row") * 40 + F.col("col")).cast("double")
        )
    )
    # target: eqc area inside the swath's footprint
    import math

    R = 6370997.0
    d = math.pi / 180.0 * R
    # .3 offsets keep fractional indices away from the exact .5
    # boundary, where nn tie conventions (banker's round vs the walk's
    # strict > 0.5 snap) legitimately differ
    tgt = AreaDefinition(
        "t", "eqc", 10, 8,
        (10.3 * d, 31.3 * d, 20.3 * d, 39.3 * d),
    )
    img = GeoImage.from_area(src, src_area)
    out_nn = {
        r["cell_id"]: r["value"]
        for r in img.resample(tgt, method="gradient", interp="nn")
        .df.collect()
    }
    out_bil = {
        r["cell_id"]: r["value"]
        for r in img.resample(tgt, method="gradient").df.collect()
    }
    assert len(out_nn) == 80 and len(out_bil) == 80
    for cell_id in out_nn:
        trow, tcol = divmod(cell_id, 10)
        # target pixel center back in degrees
        lon = 10.3 + (tcol + 0.5) * 1.0
        lat = 39.3 - (trow + 0.5) * 1.0
        # fractional source index (centers offset 0.5)
        fp = lon / 1.0 - 0.5
        fl = (50.0 - lat) / 1.0 - 0.5  # y extent top = 50
        assert out_nn[cell_id] == round(fl) * 40 + round(fp)
        # value surface is bilinear in (l, p) → bil reproduces exactly
        assert out_bil[cell_id] == pytest.approx(fl * 40 + fp, abs=1e-6)


def test_minhash_inrow_equals_wide(spark, sf_dir):
    """The zero-shuffle in-row signature pass must produce bit-identical
    (doc, band, sig) rows to the exploded+aggregated path."""
    from pyresample_spark.operators.dedup import (
        minhash_bands_inrow,
        minhash_bands_wide,
        shingles,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        (r["doc_id"], r["band"]): r["sig"]
        for r in minhash_bands_wide(shingles(d, 3)).collect()
    }
    b = {
        (r["doc_id"], r["band"]): r["sig"]
        for r in minhash_bands_inrow(d, 3).collect()
    }
    assert a == b and len(a) > 0


def test_tmerc_ell_epsg_gn7_anchor_and_twins(spark):
    """Ellipsoidal transverse Mercator (Redfearn/Thomas series, round
    12): reproduces the EPSG Guidance Note 7-2 worked example for
    OSGB36 / British National Grid — lat 50°30'N lon 0°30'E →
    E 577274.99 N 69740.50 — to < 1 cm; the SQL forward twin matches
    the Column twin bit-exact; fwd∘inv is identity to ~1e-8 deg; the
    scalar and DuckDB inverses agree with Spark."""
    import duckdb
    from pyspark.sql import functions as F

    from pyresample_spark.functions.geo import tmerc_ell_inv_sql
    from pyresample_spark.operators.crs import (
        forward,
        forward_sql,
        inverse,
        inverse_scalar,
        tmerc_ell_crs_params,
    )

    osgb = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy")
    pts = [(0.5, 50.5), (-2.0, 49.0), (-5.0, 55.0), (1.5, 52.0)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "i long, lon double, lat double",
    )
    fx, fy = forward(osgb)("lon", "lat")
    rows = df.select("i", "lon", "lat", fx.alias("x"),
                     fy.alias("y")).orderBy("i").collect()
    assert rows[0].x == pytest.approx(577274.99, abs=0.01)
    assert rows[0].y == pytest.approx(69740.50, abs=0.01)
    # grid origin: (lon_0, lat_0) → (x_0, y_0) exactly
    assert rows[1].x == pytest.approx(400000.0, abs=1e-6)
    assert rows[1].y == pytest.approx(-100000.0, abs=1e-6)
    sx, sy = forward_sql(osgb)("lon", "lat")
    for r in df.select((F.expr(sx) - fx).alias("dx"),
                       (F.expr(sy) - fy).alias("dy")).collect():
        assert r.dx == 0.0 and r.dy == 0.0
    ilon, ilat = inverse(osgb)("x", "y")
    xy = spark.createDataFrame(
        [(r.i, r.x, r.y) for r in rows], "i long, x double, y double")
    back = xy.select("i", ilon.alias("lon"),
                     ilat.alias("lat")).orderBy("i").collect()
    inv_s = inverse_scalar(osgb)
    for b, (lo, la) in zip(back, pts):
        assert b.lon == pytest.approx(lo, abs=1e-7)
        assert b.lat == pytest.approx(la, abs=1e-7)
        slo, sla = inv_s(rows[b.i].x, rows[b.i].y)
        assert slo == pytest.approx(b.lon, abs=1e-9)
        assert sla == pytest.approx(b.lat, abs=1e-9)
    lo_sql, la_sql = tmerc_ell_inv_sql("x", "y",
                                       **tmerc_ell_crs_params(osgb))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({r.i},{r.x!r},{r.y!r})" for r in rows)
        + ") v(i, x, y)")
    for d, b in zip(con.execute(
            f"SELECT i, {lo_sql}, {la_sql} FROM t ORDER BY i"
    ).fetchall(), back):
        assert abs(d[1] - b.lon) < 1e-12
        assert abs(d[2] - b.lat) < 1e-12


def test_tmerc_ell_dispatch_and_magnitude(spark):
    """Family dispatch: a bare '+proj=utm +zone=33' keeps the
    spherical form (existing goldens unchanged); '+ellps=WGS84'
    switches to the ellipsoidal series — and the two differ by
    hundreds of metres at mid-latitudes, the silent deviation the
    upgrade closes."""
    from pyresample_spark.operators.crs import _family, forward

    assert _family("+proj=utm +zone=33") == "tmerc"
    assert _family("+proj=utm +zone=33 +ellps=WGS84") == "tmerc_ell"
    assert _family("+proj=tmerc +lon_0=9 +datum=potsdam") == "tmerc_ell"

    df = spark.createDataFrame([(12.0, 48.0)], "lon double, lat double")
    sx, sy = forward("+proj=utm +zone=33")("lon", "lat")
    ex, ey = forward("+proj=utm +zone=33 +ellps=WGS84")("lon", "lat")
    r = df.select(sx.alias("sx"), sy.alias("sy"), ex.alias("ex"),
                  ey.alias("ey")).collect()[0]
    # UTM 33N at (12E, 48N): the WGS84 ellipsoidal northing is ~16 km
    # south of the sphere-R form (meridian arc vs R·phi)
    assert abs(r.ey - r.sy) > 1000.0
    assert abs(r.ex - r.sx) > 50.0
    # ellipsoidal central-meridian anchors hold exactly
    df2 = spark.createDataFrame([(15.0, 0.0)], "lon double, lat double")
    ex2, ey2 = forward("+proj=utm +zone=33 +ellps=WGS84")("lon", "lat")
    r2 = df2.select(ex2.alias("x"), ey2.alias("y")).collect()[0]
    assert r2.x == pytest.approx(500000.0, abs=1e-6)
    assert r2.y == pytest.approx(0.0, abs=1e-6)


def test_gk_epsg_codes_roundtrip_geotiff():
    """EPSG 31466-31469 (DHDN Gauss-Krüger) and 27700 (OSGB British
    National Grid) write to and read from GeoTIFF geokeys; the decoded
    CRS carries the datum shorthand the Helmert pipeline consumes."""
    import numpy as np

    from pyresample_spark.operators.crs import _family, crs_datum_spec
    from pyresample_spark.sources.binary_raster import (
        _EPSG_CRS,
        area_from_geotiff,
        geotiff_bytes,
    )

    for code in (31467, 27700):
        crs = _EPSG_CRS[code]
        buf = geotiff_bytes(np.ones((4, 5)), 1000.0, 1000.0,
                            3.5e6, 5.8e6, crs=crs)
        area = area_from_geotiff(buf)
        assert area.crs == crs
        assert _family(area.crs) == "tmerc_ell"
        spec = crs_datum_spec(area.crs)
        assert spec.towgs84 is not None and any(spec.towgs84)


def test_ease2_family_anchors_and_twins(spark):
    """EASE-Grid 2.0 (EPSG 6933/6931/6932) — the ellipsoidal
    equal-area family via authalic latitude: forward reproduces the
    published grid constants (global half-width x(180°) =
    17 367 530.45 m; polar ρ(equator) = 9 009 964.76 m), SQL twins
    match the Column twins bit-exact, fwd∘inv is identity, the scalar
    inverse agrees, and oblique ellipsoidal laea raises loudly."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.crs import (
        _family,
        forward,
        forward_sql,
        inverse,
        inverse_scalar,
    )

    glob = "+proj=cea +lat_ts=30 +lon_0=0 +ellps=WGS84"
    north = "+proj=laea +lat_0=90 +lon_0=0 +ellps=WGS84"
    south = "+proj=laea +lat_0=-90 +lon_0=0 +ellps=WGS84"
    assert _family(glob) == "cea_ell"
    assert _family(north) == "laea_ell_polar"
    assert _family("+proj=cea +lat_ts=30") == "cea"  # spherical kept
    assert _family("+proj=laea +lat_0=52 +ellps=WGS84") == \
        "laea_ell_oblique"

    pts = [(180.0, 0.0), (90.0, 0.0), (10.0, 52.0), (-120.0, -45.0),
           (0.0, 85.0445)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "i long, lon double, lat double",
    )
    for crs, (ax, ay) in ((glob, (17367530.45, 0.0)),
                          (north, (0.0, 9009964.76)),
                          (south, (0.0, -9009964.76))):
        fx, fy = forward(crs)("lon", "lat")
        rows = df.select("i", fx.alias("x"),
                         fy.alias("y")).orderBy("i").collect()
        # anchor: pts[0]=(180,0) for global width; pts[1]=(90,0) for
        # the polar equator radius (x-axis direction)
        if crs is glob:
            assert rows[0].x == pytest.approx(17367530.45, abs=0.01)
            assert rows[0].y == pytest.approx(0.0, abs=1e-6)
        else:
            assert rows[1].x == pytest.approx(9009964.76, abs=0.01)
            assert abs(rows[1].y) < 1e-6
        sx, sy = forward_sql(crs)("lon", "lat")
        for r in df.select((F.expr(sx) - fx).alias("dx"),
                           (F.expr(sy) - fy).alias("dy")).collect():
            assert r.dx == 0.0 and r.dy == 0.0
        ilon, ilat = inverse(crs)("x", "y")
        xy = spark.createDataFrame([(r.i, r.x, r.y) for r in rows],
                                   "i long, x double, y double")
        back = xy.select("i", ilon.alias("lon"),
                         ilat.alias("lat")).orderBy("i").collect()
        inv_s = inverse_scalar(crs)
        for b, (lo, la) in zip(back, pts):
            # ±180 is one point: compare wrapped
            dlon = abs(((b.lon - lo) + 180.0) % 360.0 - 180.0)
            assert dlon < 1e-7
            assert b.lat == pytest.approx(la, abs=1e-7)
            slo, sla = inv_s(rows[b.i].x, rows[b.i].y)
            assert slo == pytest.approx(b.lon, abs=1e-9)
            assert sla == pytest.approx(b.lat, abs=1e-9)


def test_ease2_epsg_geotiff_roundtrip():
    """EPSG 6931/6932/6933 encode to and decode from GeoTIFF
    geokeys."""
    import numpy as np

    from pyresample_spark.operators.crs import _family
    from pyresample_spark.sources.binary_raster import (
        _EPSG_CRS,
        area_from_geotiff,
        geotiff_bytes,
    )

    for code, fam in ((6933, "cea_ell"), (6931, "laea_ell_polar"),
                      (6932, "laea_ell_polar")):
        crs = _EPSG_CRS[code]
        buf = geotiff_bytes(np.ones((3, 4)), 36032.22, 36032.22,
                            -17367530.45, 7314540.83, crs=crs)
        area = area_from_geotiff(buf)
        assert area.crs == crs
        assert _family(area.crs) == fam


def test_etrs89_laea_oblique_epsg_anchor_and_twins(spark):
    """Oblique ellipsoidal LAEA (EPSG 3035 / ETRS89-LAEA Europe):
    reproduces the EPSG Guidance Note 7-2 worked example — 5°E 50°N →
    E 3 962 799.45 N 2 999 718.85 — to < 1 cm; the grid center maps
    to the false origin exactly; SQL twins match Column twins
    bit-exact; fwd∘inv identity; scalar inverse agrees (including the
    ρ = 0 center pixel)."""
    from pyspark.sql import functions as F

    from pyresample_spark.operators.crs import (
        _family,
        forward,
        forward_sql,
        inverse,
        inverse_scalar,
    )

    crs = ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
           "+ellps=GRS80")
    assert _family(crs) == "laea_ell_oblique"
    pts = [(5.0, 50.0), (10.0, 52.0), (-9.0, 38.7), (30.0, 60.0),
           (24.0, 38.0)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "i long, lon double, lat double",
    )
    fx, fy = forward(crs)("lon", "lat")
    rows = df.select("i", fx.alias("x"),
                     fy.alias("y")).orderBy("i").collect()
    assert rows[0].x == pytest.approx(3962799.45, abs=0.01)
    assert rows[0].y == pytest.approx(2999718.85, abs=0.01)
    assert rows[1].x == pytest.approx(4321000.0, abs=1e-6)
    assert rows[1].y == pytest.approx(3210000.0, abs=1e-6)
    sx, sy = forward_sql(crs)("lon", "lat")
    for r in df.select((F.expr(sx) - fx).alias("dx"),
                       (F.expr(sy) - fy).alias("dy")).collect():
        assert r.dx == 0.0 and r.dy == 0.0
    ilon, ilat = inverse(crs)("x", "y")
    xy = spark.createDataFrame([(r.i, r.x, r.y) for r in rows],
                               "i long, x double, y double")
    back = xy.select("i", ilon.alias("lon"),
                     ilat.alias("lat")).orderBy("i").collect()
    inv_s = inverse_scalar(crs)
    for b, (lo, la) in zip(back, pts):
        assert b.lon == pytest.approx(lo, abs=1e-7)
        assert b.lat == pytest.approx(la, abs=1e-7)
        slo, sla = inv_s(rows[b.i].x, rows[b.i].y)
        assert slo == pytest.approx(b.lon, abs=1e-9)
        assert sla == pytest.approx(b.lat, abs=1e-9)
    # center pixel (rho = 0 branch in all twins; the truncated
    # authalic series re-derives lat_0 to ~3e-9 deg, not exactly)
    slo, sla = inv_s(4321000.0, 3210000.0)
    assert slo == pytest.approx(10.0, abs=1e-7)
    assert sla == pytest.approx(52.0, abs=1e-7)


def test_lcc_ell_lambert93_anchors_and_twins(spark):
    """Ellipsoidal Lambert conformal conic (EPSG 2154 / Lambert-93):
    false origin exact, Paris on its published meters, scale 1 at
    both standard parallels (finite-difference along the meridian
    against the exact meridian curvature radius), SQL/Column/scalar/
    DuckDB twins bit-identical, fwd∘inv identity."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from pyresample_spark.functions.geo import lcc_ell_inv_sql
    from pyresample_spark.operators.crs import (
        _family,
        forward,
        forward_sql,
        inverse,
        inverse_scalar,
        lcc_ell_crs_params,
    )

    crs = ("+proj=lcc +lat_0=46.5 +lat_1=49 +lat_2=44 +lon_0=3 "
           "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    assert _family(crs) == "lcc_ell"
    assert _family("+proj=lcc +lat_1=35 +lat_2=35 +lat_0=35") == "lcc"
    pts = [(3.0, 46.5), (2.3522, 48.8566), (-4.5, 48.4), (9.5, 42.0)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "i long, lon double, lat double",
    )
    fx, fy = forward(crs)("lon", "lat")
    rows = df.select("i", fx.alias("x"),
                     fy.alias("y")).orderBy("i").collect()
    assert rows[0].x == pytest.approx(700000.0, abs=1e-6)
    assert rows[0].y == pytest.approx(6600000.0, abs=1e-6)
    # Paris (2.3522E, 48.8566N) on the published Lambert-93 meters
    assert rows[1].x == pytest.approx(652469.02, abs=0.5)
    assert rows[1].y == pytest.approx(6862035.26, abs=0.5)
    sx, sy = forward_sql(crs)("lon", "lat")
    for r in df.select((F.expr(sx) - fx).alias("dx"),
                       (F.expr(sy) - fy).alias("dy")).collect():
        assert r.dx == 0.0 and r.dy == 0.0
    ilon, ilat = inverse(crs)("x", "y")
    xy = spark.createDataFrame([(r.i, r.x, r.y) for r in rows],
                               "i long, x double, y double")
    back = xy.select("i", ilon.alias("lon"),
                     ilat.alias("lat")).orderBy("i").collect()
    inv_s = inverse_scalar(crs)
    for b, (lo, la) in zip(back, pts):
        assert b.lon == pytest.approx(lo, abs=1e-9)
        assert b.lat == pytest.approx(la, abs=1e-9)
        slo, sla = inv_s(rows[b.i].x, rows[b.i].y)
        assert slo == pytest.approx(b.lon, abs=1e-10)
        assert sla == pytest.approx(b.lat, abs=1e-10)
    # DuckDB inverse twin (false origin undone like the oracle)
    kw = lcc_ell_crs_params(crs)
    lo_sql, la_sql = lcc_ell_inv_sql(
        "(x - 700000.0)", "(y - 6600000.0)", **kw)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({r.i},{r.x!r},{r.y!r})" for r in rows)
        + ") v(i, x, y)")
    for d, b in zip(con.execute(
            f"SELECT i, {lo_sql}, {la_sql} FROM t ORDER BY i"
    ).fetchall(), back):
        assert abs(d[1] - b.lon) < 1e-12
        assert abs(d[2] - b.lat) < 1e-12
    # conformal secant cone: k = 1 at both standard parallels
    a, es = 6378137.0, 1.0 - (1.0 - 1.0 / 298.257222101) ** 2
    inv_sc = inverse_scalar(crs)  # noqa: F841 (twin warmed above)
    from pyresample_spark.functions.geo import lcc_ell_constants

    cst = lcc_ell_constants(46.5, 49.0, 44.0, a,
                            a * (1.0 - 1.0 / 298.257222101))
    for lat in (49.0, 44.0):
        d = 1e-6
        fxy = forward(crs)
        g = spark.createDataFrame(
            [(3.0, lat - d / 2), (3.0, lat + d / 2)],
            "lon double, lat double")
        p = g.select(*fxy("lon", "lat")).collect()
        ds = math.hypot(p[1][0] - p[0][0], p[1][1] - p[0][1])
        phi = math.radians(lat)
        mr = a * (1 - es) / (1 - es * math.sin(phi) ** 2) ** 1.5
        k = ds / (mr * math.radians(d))
        assert k == pytest.approx(1.0, abs=1e-6)


def test_merc_ell_epsg_makassar_anchor_and_twins(spark):
    """Ellipsoidal Mercator: reproduces the EPSG GN7-2 Mercator (1SP)
    worked example — Makassar / NEIEZ on Bessel 1841, 120°E 3°S →
    E 5 009 726.58 N 569 150.82 (k0 = 0.997, FE/FN 3900/900 km) — to
    < 1 cm; EPSG 3395 dispatches ellipsoidal while bare merc strings
    stay spherical; all twins agree."""
    import duckdb
    from pyspark.sql import functions as F

    from pyresample_spark.functions.geo import merc_ell_inv_sql
    from pyresample_spark.operators.crs import (
        _family,
        forward,
        forward_sql,
        inverse,
        inverse_scalar,
        merc_ell_crs_params,
    )

    neiez = ("+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 "
             "+y_0=900000 +ellps=bessel")
    assert _family(neiez) == "merc_ell"
    assert _family("+proj=merc +lat_ts=20") == "merc"  # spherical kept
    assert _family("+proj=merc +lon_0=0 +ellps=WGS84") == "merc_ell"

    pts = [(120.0, -3.0), (110.0, 0.0), (115.0, 5.0), (105.0, -8.0)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "i long, lon double, lat double",
    )
    fx, fy = forward(neiez)("lon", "lat")
    rows = df.select("i", fx.alias("x"),
                     fy.alias("y")).orderBy("i").collect()
    assert rows[0].x == pytest.approx(5009726.58, abs=0.01)
    assert rows[0].y == pytest.approx(569150.82, abs=0.01)
    assert rows[1].x == pytest.approx(3900000.0, abs=1e-6)
    assert rows[1].y == pytest.approx(900000.0, abs=1e-6)
    sx, sy = forward_sql(neiez)("lon", "lat")
    for r in df.select((F.expr(sx) - fx).alias("dx"),
                       (F.expr(sy) - fy).alias("dy")).collect():
        assert r.dx == 0.0 and r.dy == 0.0
    ilon, ilat = inverse(neiez)("x", "y")
    xy = spark.createDataFrame([(r.i, r.x, r.y) for r in rows],
                               "i long, x double, y double")
    back = xy.select("i", ilon.alias("lon"),
                     ilat.alias("lat")).orderBy("i").collect()
    inv_s = inverse_scalar(neiez)
    for b, (lo, la) in zip(back, pts):
        assert b.lon == pytest.approx(lo, abs=1e-9)
        assert b.lat == pytest.approx(la, abs=1e-9)
        slo, sla = inv_s(rows[b.i].x, rows[b.i].y)
        assert slo == pytest.approx(b.lon, abs=1e-10)
        assert sla == pytest.approx(b.lat, abs=1e-10)
    kw = merc_ell_crs_params(neiez)
    lo_sql, la_sql = merc_ell_inv_sql(
        "(x - 3900000.0)", "(y - 900000.0)", **kw)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({r.i},{r.x!r},{r.y!r})" for r in rows)
        + ") v(i, x, y)")
    for d, b in zip(con.execute(
            f"SELECT i, {lo_sql}, {la_sql} FROM t ORDER BY i"
    ).fetchall(), back):
        assert abs(d[1] - b.lon) < 1e-12
        assert abs(d[2] - b.lat) < 1e-12


def test_krovak_epsg_anchor_and_twins(spark):
    """Krovak (EPSG method 9819): reproduces the EPSG GN7-2 worked
    example — S-JTSK on Bessel 1841, 50°12'32.442"N 16°50'59.179"E →
    southing 1 050 538.63 / westing 568 991.00 — to the cm (native
    axes are PROJ's default negation: x = −westing, y = −southing);
    Column/SQL/scalar/DuckDB twins agree; inverse roundtrips."""
    import duckdb
    from pyspark.sql import functions as F

    from pyresample_spark.functions.geo import krovak_inv_sql
    from pyresample_spark.operators.crs import (
        _family,
        forward,
        forward_sql,
        inverse,
        inverse_scalar,
        krovak_crs_params,
    )

    crs = ("+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
           "+alpha=30.288139752777778 +k=0.9999 +ellps=bessel")
    assert _family(crs) == "krovak"
    # PROJ defaults: a bare +proj=krovak resolves the same constants
    assert krovak_crs_params("+proj=krovak") == krovak_crs_params(crs)

    anchor = (16 + 50 / 60 + 59.179 / 3600, 50 + 12 / 60 + 32.442 / 3600)
    pts = [anchor, (14.42, 50.09), (17.1, 48.8), (12.5, 51.0)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "i long, lon double, lat double",
    )
    fx, fy = forward(crs)("lon", "lat")
    rows = df.select("i", fx.alias("x"),
                     fy.alias("y")).orderBy("i").collect()
    # x = -westing, y = -southing
    assert -rows[0].y == pytest.approx(1050538.63, abs=0.01)
    assert -rows[0].x == pytest.approx(568991.00, abs=0.01)
    sx, sy = forward_sql(crs)("lon", "lat")
    for r in df.select((F.expr(sx) - fx).alias("dx"),
                       (F.expr(sy) - fy).alias("dy")).collect():
        assert r.dx == 0.0 and r.dy == 0.0
    ilon, ilat = inverse(crs)("x", "y")
    xy = spark.createDataFrame([(r.i, r.x, r.y) for r in rows],
                               "i long, x double, y double")
    back = xy.select("i", ilon.alias("lon"),
                     ilat.alias("lat")).orderBy("i").collect()
    inv_s = inverse_scalar(crs)
    for b, (lo, la) in zip(back, pts):
        assert b.lon == pytest.approx(lo, abs=1e-9)
        assert b.lat == pytest.approx(la, abs=1e-9)
        slo, sla = inv_s(rows[b.i].x, rows[b.i].y)
        assert slo == pytest.approx(b.lon, abs=1e-10)
        assert sla == pytest.approx(b.lat, abs=1e-10)
    kw = krovak_crs_params(crs)
    lo_sql, la_sql = krovak_inv_sql("x", "y", **kw)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({r.i},{r.x!r},{r.y!r})" for r in rows)
        + ") v(i, x, y)")
    for d, b in zip(con.execute(
            f"SELECT {lo_sql}, {la_sql} FROM t ORDER BY i").fetchall(),
            back):
        assert d[0] == pytest.approx(b.lon, abs=1e-12)
        assert d[1] == pytest.approx(b.lat, abs=1e-12)
