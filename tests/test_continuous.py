"""Continuous scanning supervisor tests."""

import pytest

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter
from panoptikon_tpu.jobs.continuous import (
    ContinuousManager,
    FolderSupervisor,
    seed_snapshot,
)
from panoptikon_tpu.jobs.queue import JobQueue, JobType


@pytest.fixture
def env(tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    (media / "a.txt").write_text("one")
    db = Database(tmp_path / "data", "cont")
    writer = IndexWriter(db)
    writer.call(lambda c: store.add_folder(c, str(media)))
    queue = JobQueue({JobType.FOLDER_RESCAN: lambda h: None})
    yield {"db": db, "writer": writer, "media": media, "queue": queue}
    queue.shutdown()
    writer.close()


def test_snapshot_diff_detects_changes(env):
    sup = FolderSupervisor(env["db"], env["queue"])
    snap1, changed, guard = sup.check_once({})
    assert changed and not guard and len(snap1) == 1
    snap2, changed, _ = sup.check_once(snap1)
    assert not changed
    (env["media"] / "b.txt").write_text("two")
    snap3, changed, _ = sup.check_once(snap2)
    assert changed and len(snap3) == 2


def test_deletion_guard_trips_on_mass_vanish(env):
    sup = FolderSupervisor(env["db"], env["queue"], deletion_threshold=0.5)
    for i in range(4):
        (env["media"] / f"x{i}.txt").write_text("data")
    snap, _, _ = sup.check_once({})
    assert len(snap) == 5
    for i in range(4):
        (env["media"] / f"x{i}.txt").unlink()
    (env["media"] / "a.txt").unlink()
    _, changed, guard = sup.check_once(snap)
    assert changed and guard  # 100% vanish > 50% threshold


def test_seed_snapshot_reflects_db(env):
    # Files registered in the DB seed the snapshot, so a restart sees no
    # phantom change storm.
    db, writer = env["db"], env["writer"]

    def unit(conn):
        item = store.upsert_item(conn, "a" * 64, "m" * 32, "text/plain")
        store.upsert_file(conn, item, "a" * 64, str(env["media"] / "a.txt"),
                          "2026-01-01T00:00:00")

    writer.call(unit)
    snap = seed_snapshot(db)
    assert str(env["media"] / "a.txt") in snap


def test_manager_respects_config(env):
    db, writer, queue = env["db"], env["writer"], env["queue"]
    mgr = ContinuousManager(queue)
    assert mgr.ensure(db) is None  # disabled by default
    writer.call(lambda c: store.set_config(c, "continuous_scan", {"enabled": True}))
    sup = mgr.ensure(db)
    assert sup is not None
    assert mgr.status()[db.name]["rescans_triggered"] == 0
    writer.call(lambda c: store.set_config(c, "continuous_scan", {"enabled": False}))
    assert mgr.ensure(db) is None
    mgr.stop_all()
