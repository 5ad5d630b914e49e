"""Round-5 semantics fixes: success-only page budget (reference
bfs_strategy.py:172-174), seen-before-capacity-slice (bfs_strategy.py:121
vs :124-130), best-first capacity trim direction, the two-phase commit
protocol with resume reconciliation, read_since cursor validation, and the
bloom hash_col fast path.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
from crawl4ai_spark.sources.synthetic import build_robots, build_seeds


def test_budget_counts_only_successes(spark, pages):
    """max_pages consumes only success=True rows; robots-403 rows are
    results but never budget. visit_order stays dense over ALL rows."""
    wd = tempfile.mkdtemp(prefix="budget_")
    run = CrawlRun(
        spark, pages, build_robots(spark), build_seeds(spark, 3), wd,
        CrawlConfig(mode="bfs", max_pages=25, max_depth=4, host_budget=100000,
                    include_external=True),
    )
    # per-iteration: the budget counter advances by FETCHED (successes),
    # never by the full result count (reference bfs_strategy.py:172-174)
    before = 0
    for _ in range(8):
        s = run.run_iteration()
        if s.get("done"):
            break
        assert s["pages_crawled"] == before + s["fetched"]
        assert s["selected"] >= s["fetched"]
        before = s["pages_crawled"]
    res = run.results()
    n_success = res.filter("success").count()
    n_all = res.count()
    assert n_all > n_success  # the corpus graph produces 403s
    meta = run.t_frontier.snapshot_meta()
    assert meta["pages_crawled"] == n_success
    assert meta["n_visited"] == n_all
    # success budget is respected, and the blocked rows did NOT consume it:
    # total visits exceed what an all-rows budget would ever have crawled
    # (the reference, too, may finish under max_pages when capacity-trimmed
    # links later 403 — remaining_capacity assumes trimmed links succeed)
    assert n_success <= 25
    assert n_all > n_success >= 20
    # visit_order is dense and unique over all result rows
    orders = [r[0] for r in res.select("visit_order").collect()]
    assert sorted(orders) == list(range(1, n_all + 1))


def test_seen_includes_capacity_dropped(spark, pages):
    """Capacity-trimmed discoveries still enter the seen set (the
    reference's visited.add runs before the trim), so a later iteration
    can never re-enqueue them; the frontier gets only the kept rows."""
    wd = tempfile.mkdtemp(prefix="captrim_")
    run = CrawlRun(
        spark, pages, build_robots(spark), build_seeds(spark, 3), wd,
        CrawlConfig(mode="bfs", max_pages=5, max_depth=4, host_budget=100000,
                    include_external=True),
    )
    s0 = run.run_iteration()
    meta = run.t_frontier.snapshot_meta()
    seen_growth = meta["n_seen"] - 3  # 3 seeds bootstrap the seen set
    assert seen_growth > s0["new_urls"], "expected a capacity trim"
    # the dropped candidates are in seen but not in the frontier
    seen_new = run.seen().filter("first_iter = 1").count()
    assert seen_new == seen_growth
    assert meta["n_frontier"] == s0["new_urls"]
    # seen keys stay unique (the anti-join contract) even with the trim
    seen = run.seen()
    assert seen.count() == seen.select("url_norm").distinct().count()


def test_capacity_topk_ascending_keeps_lowest(spark):
    from crawl4ai_spark.operators.ranking import capacity_topk

    df = spark.createDataFrame(
        [(f"u{i:02d}", float(i)) for i in range(20)], "url string, score double"
    )
    hi = {r.url for r in capacity_topk(df, 5, small_input=True).collect()}
    lo = {r.url for r in
          capacity_topk(df, 5, small_input=True, ascending=True).collect()}
    assert hi == {f"u{i:02d}" for i in range(15, 20)}
    assert lo == {f"u{i:02d}" for i in range(5)}


def test_resume_reconciles_crashed_iteration(spark, pages):
    """Orphan commits from an iteration that crashed before the frontier
    replace are rolled back on resume instead of double-appending."""
    wd = tempfile.mkdtemp(prefix="reconcile_")
    cfg = CrawlConfig(mode="bfs", max_pages=100000, max_depth=3,
                      host_budget=100000, include_external=True)
    run = CrawlRun(spark, pages, build_robots(spark), build_seeds(spark, 3),
                   wd, cfg)
    run.run_iteration()
    n0 = run.results().count()
    # simulate iteration 1 crashing after its results/lineage commits but
    # before the frontier commit point: orphan appends tagged iteration=1
    # while the frontier meta still says iteration 1 is next
    run.t_results.append(run.results(), {"iteration": 1})
    run.t_lineage.append(run.lineage(), {"iteration": 1})
    assert run.results().count() == 2 * n0
    # a fresh CrawlRun over the same workdir reconciles, then re-runs
    run2 = CrawlRun(spark, pages, build_robots(spark), build_seeds(spark, 3),
                    wd, cfg)
    run2.run_iteration()
    res = run2.results()
    # the orphan rows are gone: iteration 0 appears exactly once
    assert res.filter("iteration = 0").count() == n0
    dup = res.groupBy("visit_order").count().filter("count > 1").count()
    assert dup == 0


def test_read_since_unknown_cursor_raises(spark, tmp_path):
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(5).toDF("id")
    t.append(df)
    cur, delta = t.read_since(spark, None)
    assert delta.count() == 5
    with pytest.raises(ValueError, match="not found"):
        t.read_since(spark, cur + 999)


def _mirror_files(sd: str) -> set[str]:
    return {f for f in os.listdir(sd) if f.endswith(".parquet")}


def test_stream_barrier_holds_provisional_commits(spark, tmp_path):
    """durable=False commits are visible to batch readers immediately but
    reach the stream mirror only after mark_durable advances the barrier —
    so a commit that crash reconciliation can still roll back is never
    delivered to a checkpointed stream (whose deterministic re-execution
    would otherwise re-deliver the same rows under new file names)."""
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(3).toDF("id"))  # durable bootstrap
    t.stream(spark)  # creates the mirror
    sd = t._stream_path
    base = _mirror_files(sd)
    assert base
    t.append(spark.range(3, 6).toDF("id"), {"iteration": 1}, durable=False)
    assert t.read(spark).count() == 6  # batch readers see it...
    assert _mirror_files(sd) == base  # ...the stream mirror does not
    # crash before the WAL tip: the provisional commit rolls back, then
    # the iteration re-executes and lands under a NEW data dir name
    t.rollback_trailing(lambda m: m.get("iteration", -1) >= 1)
    assert _mirror_files(sd) == base
    t.append(spark.range(3, 6).toDF("id"), {"iteration": 1}, durable=False)
    t.mark_durable()  # the frontier commit landed — now deliverable
    after = _mirror_files(sd)
    assert after > base
    # exactly ONE dir beyond the base was ever mirrored: the checkpoint
    # cannot have consumed a rolled-back twin of these rows
    assert len({f.split("__", 1)[0] for f in after - base}) == 1
    rows = sorted(r.id for r in spark.read.parquet(sd).collect())
    assert rows == [0, 1, 2, 3, 4, 5]


def test_stream_mirror_copy_fallback(spark, tmp_path, monkeypatch):
    """Filesystems without hardlink support (EPERM/EOPNOTSUPP from
    link(2)) degrade to an atomic copy instead of failing — a raised
    OSError here would make every commit on a streamed table livelock
    (commit lands, sync raises, retry reconciles and re-fails)."""
    from crawl4ai_spark.sources import snapshots as snap

    t = snap.SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(4).toDF("id"))

    def no_link(src, dst, *a, **kw):
        raise PermissionError("link(2) not supported on this mount")

    monkeypatch.setattr(snap.os, "link", no_link)
    t.stream(spark)
    sd = t._stream_path
    assert _mirror_files(sd)
    t.append(spark.range(4, 6).toDF("id"))  # commit-path sync also copies
    assert spark.read.parquet(sd).count() == 6


def test_stream_sync_incremental_touches_only_new_dirs(spark, tmp_path, monkeypatch):
    """The commit-path mirror sync is O(new files): it must listdir only
    the dirs the _synced marker hasn't seen, not every historical data
    dir (which would make a 10k-iteration crawl's commits O(n^2))."""
    from crawl4ai_spark.sources import snapshots as snap

    t = snap.SnapshotTable(str(tmp_path / "tbl"))
    for i in range(3):
        t.append(spark.range(i * 2, i * 2 + 2).toDF("id"))
    t.stream(spark)

    listed: list[str] = []
    real_listdir = os.listdir

    def spy(path="."):
        listed.append(os.fspath(path))
        return real_listdir(path)

    monkeypatch.setattr(snap.os, "listdir", spy)
    t.append(spark.range(6, 8).toDF("id"))
    data_dirs_listed = {p for p in listed if "/data-" in p}
    assert len(data_dirs_listed) == 1  # only the dir this commit added


def test_read_since_durable_only_skips_provisional(spark, tmp_path):
    """A durable_only batch tailer never sees (or cursors onto) a
    provisional snapshot: its cursor survives crash rollback, so it
    re-reads nothing after the iteration re-executes."""
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(3).toDF("id"))  # durable
    cur, delta = t.read_since(spark, None, durable_only=True)
    assert delta.count() == 3
    t.append(spark.range(3, 6).toDF("id"), {"iteration": 1}, durable=False)
    cur2, delta2 = t.read_since(spark, cur, durable_only=True)
    assert delta2 is None and cur2 == cur  # held at the barrier
    # non-durable tailing WOULD have cursored onto the doomed snapshot
    t.rollback_trailing(lambda m: m.get("iteration", -1) >= 1)
    t.append(spark.range(3, 6).toDF("id"), {"iteration": 1}, durable=False)
    t.mark_durable()
    cur3, delta3 = t.read_since(spark, cur2, durable_only=True)
    assert sorted(r.id for r in delta3.collect()) == [3, 4, 5]  # exactly once


def test_read_since_durable_only_holds_cursor_ahead_of_barrier(spark, tmp_path):
    """A cursor that got ahead of the stream barrier (a prior
    non-durable read) HOLDS — (cursor, None) — rather than raising the
    misleading replace() error, whose reset-and-re-read advice would
    cause exactly the double delivery durable_only exists to prevent.
    Once the barrier catches up, tailing resumes from the held cursor."""
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(3).toDF("id"))  # durable
    t.append(spark.range(3, 6).toDF("id"), durable=False)
    cur, delta = t.read_since(spark, None)  # non-durable read: cursor = 2
    assert delta.count() == 6
    held, nothing = t.read_since(spark, cur, durable_only=True)
    assert nothing is None and held == cur  # held, not raised
    t.append(spark.range(6, 9).toDF("id"), durable=False)
    t.mark_durable()  # barrier now past the held cursor
    cur2, delta2 = t.read_since(spark, held, durable_only=True)
    assert sorted(r.id for r in delta2.collect()) == [6, 7, 8]


def test_manifest_is_delta_encoded(spark, tmp_path):
    """Snapshot records store (base, added) deltas, so each data dir name
    appears ONCE in the manifest no matter how many later snapshots
    include it — full per-snapshot dir lists would make the manifest
    O(dirs²) and its per-commit rewrite the dominant driver cost on a
    10k-iteration crawl. Chain resolution, time travel, and rollback all
    operate on the resolved lists."""
    import pyarrow as pa

    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(8):
        t.append_rows(pa.table({"id": [i]}), {"iteration": i})
    raw = open(t._manifest_path).read()
    dirs = t.snapshot_dirs()
    assert len(dirs) == 8
    for d in dirs:
        assert raw.count(d) == 1  # delta encoding: one mention per dir
    # every snapshot resolves to the dir-prefix of its commit point
    for k, s in enumerate(t.snapshots()):
        assert t.snapshot_dirs(s["id"]) == dirs[: k + 1]
    assert t.read(spark, snapshot_id=3).count() == 3  # time travel intact
    # rollback pops tail records; surviving chains still resolve
    t.rollback_trailing(lambda m: m.get("iteration", -1) >= 6)
    assert t.snapshot_dirs() == dirs[:6]
    assert t.read(spark).count() == 6
    # read_since over the delta chain still yields only the new dirs
    cur, delta = t.read_since(spark, t.snapshots()[2]["id"])
    assert delta.count() == 3


def test_reader_full_sync_spares_racing_commit_links(spark, tmp_path):
    """stream()'s reader-side full sync races live commits: its manifest
    read can predate a commit whose files are already linked into the
    mirror (and recorded in the writer's _synced marker). The age-gated
    prune must spare those fresh links — deleting them would skip the
    commit in every later incremental sync, silently and forever. Old
    unreferenced links (genuine debris) must still be pruned."""
    import json
    import time

    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(3).toDF("id"))
    t.stream(spark)  # creates the mirror
    stale = t._read_manifest()  # the reader's (soon-to-be-stale) view
    t.append(spark.range(3, 6).toDF("id"))  # racing commit: links + marker
    sd = t._stream_path
    n_before = len([f for f in os.listdir(sd) if f.endswith(".parquet")])
    # plant genuine debris: an unreferenced link old enough to prune.
    # Age is judged by ctime (link-creation time — utime can't fake it),
    # so age the debris by patching os.stat for that one path.
    debris = os.path.join(sd, "data-debris__part-0.parquet")
    open(debris, "wb").close()
    import unittest.mock

    real_stat = os.stat

    class _Aged:
        def __init__(self, st):
            self._st = st

        st_ctime = property(lambda self: time.time() - 3600)

        def __getattr__(self, name):
            return getattr(self._st, name)

    def fake_stat(path, *a, **kw):
        st = real_stat(path, *a, **kw)
        return _Aged(st) if os.fspath(path) == debris else st

    # replay the reader's prune with its stale manifest (the race, made
    # deterministic): fresh commit links must survive, debris must not
    with unittest.mock.patch(
        "crawl4ai_spark.sources.snapshots.os.stat", side_effect=fake_stat
    ):
        t._sync_stream_dir(full=True, prune_min_age_s=300.0, manifest=stale)
    names = set(os.listdir(sd))
    assert "data-debris__part-0.parquet" not in names  # old debris pruned
    kept = [f for f in names if f.endswith(".parquet")]
    assert len(kept) == n_before  # racing commit's links all survived
    # and the writer's marker still delivers them: stream reads 6 rows
    assert spark.read.parquet(sd).count() == 6
    marker = json.load(open(os.path.join(sd, "_synced")))
    assert set(marker["dirs"]) <= set(t.snapshot_dirs())


def test_commit_sync_skips_noop_marker_rewrite(spark, tmp_path):
    """mark_durable with nothing new must not rewrite the _synced marker
    (the crawl loop calls it on several tables every iteration entry —
    a no-op rewrite per call re-adds the very I/O the incremental sync
    exists to avoid)."""
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(3).toDF("id"))
    t.stream(spark)
    marker = os.path.join(t._stream_path, "_synced")
    st0 = os.stat(marker)
    t.mark_durable()  # barrier already current, mirror already synced
    t.mark_durable()
    st1 = os.stat(marker)
    assert (st0.st_mtime_ns, st0.st_ino) == (st1.st_mtime_ns, st1.st_ino)
    t.append(spark.range(3, 6).toDF("id"))  # a real commit DOES advance it
    assert os.stat(marker).st_mtime_ns > st0.st_mtime_ns


def test_read_since_durable_only_raises_on_rebuilt_table(spark, tmp_path):
    """A durable-only cursor above the table's current tip means the
    table was rebuilt under the caller. That must raise the same
    rebuilt-table error as the non-durable path — holding (cursor, None)
    would stall the tailer forever with no signal, then alias onto an
    unrelated snapshot once ids grew past the stale cursor."""
    import shutil

    from crawl4ai_spark.sources.snapshots import SnapshotTable

    root = str(tmp_path / "tbl")
    t = SnapshotTable(root)
    for i in range(5):
        t.append(spark.range(i, i + 1).toDF("id"))
    cur, _ = t.read_since(spark, None, durable_only=True)
    assert cur == 5
    shutil.rmtree(root)  # the table is rebuilt from scratch...
    t2 = SnapshotTable(root)
    t2.append(spark.range(9).toDF("id"), durable=False)  # ...provisionally
    with pytest.raises(ValueError, match="rebuilt"):
        t2.read_since(spark, cur, durable_only=True)
    # the legitimate hold (cursor known, merely ahead of the barrier)
    # still holds: a non-durable read cursors onto snapshot 1
    nd_cur, _ = t2.read_since(spark, None)
    held, nothing = t2.read_since(spark, nd_cur, durable_only=True)
    assert (held, nothing) == (nd_cur, None)


def test_build_bloom_hash_col_matches_string_path(spark):
    from crawl4ai_spark.operators.seen import build_bloom

    df = spark.createDataFrame(
        [(f"https://h{i}.example/p/{i}",) for i in range(500)], "url_norm string"
    ).withColumn("url_hash", F.xxhash64("url_norm"))
    a = build_bloom(df, num_bits=1 << 16)
    b = build_bloom(df, num_bits=1 << 16, hash_col="url_hash")
    assert a.bits.tobytes() == b.bits.tobytes()


def test_linkage_tolerates_ragged_vectors(spark):
    """A truncated/null embedding must not kill the clustering job."""
    from crawl4ai_spark.datapipe.similarity import cosine_cluster_linkage

    rows = [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.5]),
            (4, None), (5, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    planes = [[1.0, 0.2, -0.3], [-0.4, 1.0, 0.1], [0.2, -0.5, 1.0]]
    out = cosine_cluster_linkage(
        df, planes, id_col="id", vec_col="vec", max_dist=0.05,
        linkage_method="average",
    ).collect()
    labels = {r.vec_id: r.cluster_label for r in out}
    assert len(labels) == 5
    assert labels[1] == labels[2]  # identical vectors still cluster
    assert labels[5] != labels[1]


def test_expire_snapshots_reclaims_replaced_dirs(spark, tmp_path):
    """On a replace-heavy table (frontier, host_state), expire_snapshots
    must drop old snapshot records AND physically reclaim the data dirs
    only those records referenced — without it a 10k-iteration crawl
    retains 10k dead frontier copies on disk."""
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(6):
        t.replace(spark.range(i, i + 3).toDF("id"), meta={"iteration": i})
    dirs_before = [
        d for d in os.listdir(t.root) if d.startswith("data-")
    ]
    assert len(dirs_before) == 6  # one live + five dead copies
    dropped = t.expire_snapshots(keep_last=2)
    assert dropped == 4
    dirs_after = [d for d in os.listdir(t.root) if d.startswith("data-")]
    assert len(dirs_after) == 2  # only the two surviving snapshots' dirs
    # the tip still reads, time travel within the window still works
    assert sorted(r.id for r in t.read(spark).collect()) == [5, 6, 7]
    snaps = t.snapshots()
    assert len(snaps) == 2
    anchor_id = snaps[0]["id"]
    assert sorted(
        r.id for r in t.read(spark, snapshot_id=anchor_id).collect()
    ) == [4, 5, 6]
    # meta survives the anchor rewrite (resume reconciliation reads it)
    assert t.snapshot_meta(anchor_id) == {"iteration": 4}
    # expired history is gone: unknown id resolves to None
    assert t.snapshot_dirs(anchor_id - 1) is None


def test_expire_snapshots_append_only_keeps_data_compacts_manifest(
    spark, tmp_path
):
    """On an append-only table every dir is still referenced by the tip,
    so expiry reclaims no data — it only compacts the manifest's record
    list (the anchor becomes a full-dir-list record)."""
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(5):
        t.append(spark.range(i * 2, i * 2 + 2).toDF("id"))
    assert t.expire_snapshots(keep_last=1) == 4
    assert len(t.snapshots()) == 1
    assert t.read(spark).count() == 10  # every appended row survives
    # a cursor below the anchor now raises the rebuilt-table error
    # instead of silently re-delivering
    with pytest.raises(ValueError, match="not found"):
        t.read_since(spark, 2)


def test_expire_snapshots_never_crosses_stream_barrier(spark, tmp_path):
    """Provisional (non-durable) records must stay individually
    resolvable: folding one into the anchor would let the vanished-
    barrier fallback degrade to the tip and deliver rows a rollback
    could still retract."""
    from crawl4ai_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(2).toDF("id"))  # durable: barrier = 1
    t.append(spark.range(2, 4).toDF("id"), durable=False)
    t.append(spark.range(4, 6).toDF("id"), durable=False)
    # keep_last=1 would cut at the tip, but the barrier pins snapshot 1
    assert t.expire_snapshots(keep_last=1) == 0
    assert len(t.snapshots()) == 3
    t.mark_durable()
    assert t.expire_snapshots(keep_last=1) == 2
    assert t.read(spark).count() == 6


def test_failed_iteration_releases_caches_and_bloom(spark, pages):
    """A raise mid-iteration (here: the fail-loud fetch fan-out guard)
    must release every frame the iteration persisted and the bloom
    broadcast — an in-process retry after a failure must start from a
    clean executor-memory slate, not accumulate dead caches per attempt."""
    wd = tempfile.mkdtemp(prefix="leak_")
    # duplicate every page row while claiming pages_unique=True: the
    # left join fans out and the n_deferred<0 guard raises after the
    # fetch caches are built
    dup_pages = pages.unionByName(pages)
    run = CrawlRun(
        spark, dup_pages, build_robots(spark), build_seeds(spark, 3), wd,
        CrawlConfig(mode="bfs", max_pages=50, max_depth=3,
                    host_budget=100000, include_external=True,
                    pages_unique=True),
    )
    n_cached_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    with pytest.raises(RuntimeError, match="fan-out"):
        run.run_iteration()
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == n_cached_before
    assert run._bloom_bc is None
    assert run._iter_caches == []


def test_replace_tables_hold_bounded_snapshots(spark, pages):
    """The crawl loop expires frontier/host_state history every
    iteration: a long crawl holds O(retention) data dirs on the
    replace-per-iteration tables, not one dead full copy per iteration."""
    wd = tempfile.mkdtemp(prefix="retain_")
    run = CrawlRun(
        spark, pages, build_robots(spark), build_seeds(spark, 3), wd,
        CrawlConfig(mode="bfs", max_pages=100000, max_depth=10,
                    host_budget=2, include_external=True,
                    adaptive_politeness=True, snapshot_retention=2),
    )
    iters = 0
    for _ in range(5):
        if run.run_iteration().get("done"):
            break
        iters += 1
    assert iters >= 4, "graph too small to exercise retention"
    for t in (run.t_frontier, run.t_host_state):
        assert len(t.snapshots()) <= 2
        n_dirs = len([d for d in os.listdir(t.root) if d.startswith("data-")])
        assert n_dirs <= 2
    # results/seen keep full history (append-only; external tailers may
    # hold cursors) — and the crawl still resumes correctly
    run2 = CrawlRun(
        spark, pages, build_robots(spark), build_seeds(spark, 3), wd,
        CrawlConfig(mode="bfs", max_pages=100000, max_depth=10,
                    host_budget=2, include_external=True,
                    adaptive_politeness=True, snapshot_retention=2),
    )
    s = run2.run_iteration()
    assert not s.get("done") or s.get("reason") != "error"


def test_bootstrap_dedup_is_min_url_wins_on_both_paths(spark, pages):
    """When two raw seed URLs normalize to the same key, BOTH bootstrap
    paths (driver-side fast path, distributed mega-frontier path) keep
    the lexicographic-min raw URL — dropDuplicates would pick whichever
    partition won the shuffle, so a resumed mega-frontier could crawl a
    different representative per run."""
    raw = [
        "https://host0.example/page#frag",  # same key as the bare url
        "https://host0.example/page",
        "https://host9.example/only",
    ]
    seeds = spark.createDataFrame([(u,) for u in raw], "url string")
    reps = {}
    for path, max_rows in (("fast", 200_000), ("distributed", 1)):
        wd = tempfile.mkdtemp(prefix=f"minwins_{path}_")
        run = CrawlRun(
            spark, pages, build_robots(spark), seeds, wd,
            CrawlConfig(mode="bfs", max_pages=10, max_depth=1,
                        broadcast_frontier_max=max_rows),
        )
        run._bootstrap()
        reps[path] = {
            r.url_norm: r.url for r in run.t_frontier.read(spark).collect()
        }
    assert reps["fast"] == reps["distributed"]
    assert reps["fast"]["https://host0.example/page"] == "https://host0.example/page"
    assert len(reps["fast"]) == 2


def test_host_state_join_broadcasts_by_stats_not_hint(spark, tmp_path, pages):
    """The politeness join reads host_state from parquet, so Catalyst's
    scan size stats must pick the broadcast while the table is small —
    and a forced hint must NOT appear, or a 100M-host crawl would OOM
    the driver. Proxy: with broadcasting disabled the join must degrade
    to a shuffle (a hinted join would broadcast regardless)."""
    wd = tempfile.mkdtemp(prefix="hsplan_")
    run = CrawlRun(
        spark, pages, build_robots(spark), build_seeds(spark, 3), wd,
        CrawlConfig(mode="bfs", max_pages=50, max_depth=2,
                    host_budget=100000, include_external=True,
                    adaptive_politeness=True),
    )
    run.run_iteration()  # writes host_state
    hs_df = run.t_host_state.read(spark)
    frontier = pages.select(
        "url", F.expr("parse_url(url, 'HOST')").alias("host")
    )
    joined = frontier.join(hs_df.select("host", "current_delay"), "host", "left")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # stats pick it while small
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined2 = frontier.join(
            hs_df.select("host", "current_delay"), "host", "left"
        )
        plan2 = joined2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2  # no forced hint
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
