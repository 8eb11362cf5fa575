"""Eager prewarm loop (VERDICT r2 #7/#9): after a restart + one tick,
search-usable embedding models are loaded + bucket-compiled, so the first
query pays no load/compile stall (reference run_eager_prewarm_loop +
cron preload, main.rs:330-341)."""

import numpy as np
import pytest

from panoptikon_tpu.api.server import AppState
from panoptikon_tpu.db import store
from panoptikon_tpu.jobs.prewarm import EagerPrewarm
from panoptikon_tpu.models.base import PredictionInput
from panoptikon_tpu.models.impls import LoadCountImpl

REG_TOML = """
[group.warm]
config.impl_class = "loadcount_impl"
[group.warm.metadata]
output_type = "clip"
default_batch_size = 4
[group.warm.inference_ids.a]
"""


@pytest.fixture
def env(tmp_path):
    reg = tmp_path / "registry"
    reg.mkdir()
    (reg / "00.toml").write_text(REG_TOML)
    state = AppState.create(tmp_path / "data", reg)
    # Seed embedding rows under setter "warm/a" (space name == inference
    # id) plus a setter no registry knows.
    db = state.db("default")
    writer = state.writers.get(db)

    def unit(conn):
        for setter in ("warm/a", "ghost/x"):
            sid = store.upsert_setter(conn, setter)
            item = store.upsert_item(
                conn, setter.replace("/", "0").ljust(64, "f"), "0" * 32,
                "image/png",
            )
            store.upsert_file(conn, item, "a" * 64, f"/m/{sid}.png", "2026-01-01")
            did = store.insert_item_data(conn, item, sid, "clip")
            store.insert_embedding(conn, did, np.ones(8, np.float32))

    writer.call(unit)
    LoadCountImpl.reset_counters()
    yield state
    state.shutdown()


class TestEagerPrewarm:
    def test_tick_warms_known_spaces_only(self, env):
        loop = EagerPrewarm(env)
        warmed = loop.tick()
        assert warmed == ["warm/a"]  # ghost/x skipped, not a pool failure
        assert LoadCountImpl.loads == 1
        assert LoadCountImpl.prepares == 1  # bucket ladders compiled
        assert all(u["healthy"] for u in env.pool.stats())

    def test_first_predict_after_tick_has_no_load_stall(self, env):
        loop = EagerPrewarm(env)
        loop.tick()
        assert LoadCountImpl.loads == 1
        out = env.pool.predict("warm/a", [PredictionInput(data={})])
        assert out[0] == {"ok": True}
        # No additional load: the model was already resident.
        assert LoadCountImpl.loads == 1

    def test_repeat_tick_renews_without_reload(self, env):
        loop = EagerPrewarm(env)
        loop.tick()
        loop.tick()
        assert LoadCountImpl.loads == 1

    def test_query_search_key_does_not_evict_warm_models(self, env):
        """The query path loads under cache_key 'search' with lru_size=1;
        warmed models live under the 'prewarm' key, so they stay resident
        through queries against other models."""
        loop = EagerPrewarm(env)
        loop.tick()
        env.manager.load_model(
            "fixtures/echo" if "fixtures/echo" in env.model_registry.all_ids()
            else "warm/a",
            cache_key="search", lru_size=1, ttl_seconds=60,
        )
        assert "warm/a" in env.manager.loaded_models()

    def test_start_stop_thread(self, env):
        loop = EagerPrewarm(env, interval_s=3600)
        loop.start()
        import time

        deadline = time.monotonic() + 5
        while LoadCountImpl.loads < 1 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert LoadCountImpl.loads == 1  # startup warm fired
        loop.stop()


class TestScanProgramPrewarm:
    def test_stable_generation_warms_scan_programs(self, env):
        """A quant-ready space whose generation is stable across a tick
        gets its serving scan programs compiled (solo + coalesced batch),
        once per generation."""
        index = env.index("default")
        if "warm/a" not in index.space_names():
            rng = np.random.default_rng(0)
            ids = np.arange(1, 33, dtype=np.int64)
            vecs = rng.standard_normal((32, 8)).astype(np.float32)
            index.add("warm/a", ids, ids, vecs)
        index.build_quant("warm/a")

        loop = EagerPrewarm(env)
        ex = env.executor("default")
        calls = {"n": 0}
        orig = ex.execute

        def counting(q):
            calls["n"] += 1
            return orig(q)

        ex.execute = counting
        first = loop.warm_scan_programs()
        assert first == []  # generation not yet stable (damping)
        second = loop.warm_scan_programs()
        assert any(w.endswith(":warm/a") for w in second)
        # 1 solo + SCAN_COALESCE_MAX concurrent executes.
        from panoptikon_tpu.pql.executor import SCAN_COALESCE_MAX

        assert calls["n"] == 1 + SCAN_COALESCE_MAX
        third = loop.warm_scan_programs()
        assert not any(w.endswith(":warm/a") for w in third)
        assert calls["n"] == 1 + SCAN_COALESCE_MAX  # warmed once

    def test_tick_includes_scan_warm_and_stays_model_compatible(self, env):
        index = env.index("default")
        if "warm/a" not in index.space_names():
            rng = np.random.default_rng(0)
            ids = np.arange(1, 33, dtype=np.int64)
            vecs = rng.standard_normal((32, 8)).astype(np.float32)
            index.add("warm/a", ids, ids, vecs)
        index.build_quant("warm/a")
        loop = EagerPrewarm(env)
        loop.tick()  # records generations, warms models
        warmed = loop.tick()  # stable now: scan warm + model renew
        assert "default:warm/a" in warmed
        assert "warm/a" in warmed


class TestScanWarmWatchdog:
    def test_hung_scan_warm_does_not_block_model_warm(self, env, monkeypatch):
        """A wedged device transport hangs warm_scan_programs forever; the
        tick must still warm models (bounded join) and must NOT stack a
        second scan-warm thread on the next tick."""
        import threading
        import time

        loop = EagerPrewarm(env, interval_s=0.05)
        hang = threading.Event()

        def hung_warm():
            hang.wait(30)  # simulates a device op blocked on a dead relay
            return []

        monkeypatch.setattr(loop, "warm_scan_programs", hung_warm)
        t0 = time.monotonic()
        loop.tick()  # join bounded by min(interval_s, 60) = 0.05
        assert time.monotonic() - t0 < 5
        first_thread = loop._scan_thread
        assert first_thread is not None and first_thread.is_alive()
        loop.tick()  # previous warm still stuck: do NOT stack another
        assert loop._scan_thread is first_thread
        hang.set()
        first_thread.join(5)
        assert not first_thread.is_alive()
