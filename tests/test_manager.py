"""Registry + model manager tests — the reference's manager/registry
behavior surface (manager.rs, registry.rs) driven through in-process
fixture impls (the fake-model pattern from SURVEY.md §4)."""

import time

import pytest

from panoptikon_tpu.models.base import PredictionInput, is_error_slot, parse_error_slot
from panoptikon_tpu.models.impls import IMPL_INDEX
from panoptikon_tpu.models.manager import ModelLoadError, ModelManager
from panoptikon_tpu.models.registry import Registry, RegistryError

BUILTIN = """
[group.fixtures]
config.impl_class = "echo_impl"
config.shared_opt = "from-group"

[group.fixtures.metadata]
name = "Fixtures"
default_inference_id = "echo"

[group.fixtures.inference_ids.echo]
metadata.description = "echo model"

[group.fixtures.inference_ids.slots]
config.impl_class = "errorslot_impl"

[group.fixtures.inference_ids.broken]
config.impl_class = "broken_impl"

[group.fixtures.inference_ids.slow]
config.impl_class = "slow_impl"
config.delay = 0.01
"""


@pytest.fixture
def registry(tmp_path):
    builtin = tmp_path / "builtin"
    builtin.mkdir()
    (builtin / "00_base.toml").write_text(BUILTIN)
    user = tmp_path / "user"
    user.mkdir()
    return Registry(builtin, user)


@pytest.fixture
def manager(registry):
    m = ModelManager(registry, IMPL_INDEX)
    yield m
    m.shutdown()


class TestRegistry:
    def test_group_config_inherits(self, registry):
        rid = registry.resolve("fixtures", "echo")
        assert rid.impl_class == "echo_impl"
        assert rid.config["shared_opt"] == "from-group"

    def test_id_config_overrides_group(self, registry):
        rid = registry.resolve("fixtures", "slots")
        assert rid.impl_class == "errorslot_impl"

    def test_spawn_kwargs_strip_directives(self, registry):
        rid = registry.resolve("fixtures", "slow")
        kwargs = rid.spawn_kwargs()
        assert "impl_class" not in kwargs and kwargs["delay"] == 0.01

    def test_duplicate_id_fails_whole_load(self, registry, tmp_path):
        (tmp_path / "user" / "10_dup.toml").write_text(
            "[group.fixtures.inference_ids.echo]\nmetadata.description='dup'\n"
        )
        with pytest.raises(RegistryError, match="duplicate"):
            registry.load(force=True)

    def test_allow_override_permits_redefinition(self, registry, tmp_path):
        (tmp_path / "user" / "10_dup.toml").write_text(
            "allow_override = true\n"
            "[group.fixtures.inference_ids.echo]\n"
            "config.impl_class = 'batchsize_impl'\n"
        )
        registry.load(force=True)
        assert registry.resolve("fixtures", "echo").impl_class == "batchsize_impl"

    def test_metadata_shape_no_config_leak(self, registry):
        meta = registry.metadata()
        assert meta["fixtures"]["group_metadata"]["name"] == "Fixtures"
        assert "echo" in meta["fixtures"]["inference_ids"]
        flat = str(meta)
        assert "impl_class" not in flat

    def test_mtime_reload(self, registry, tmp_path):
        registry.load()
        assert registry.ids_in_group("fixtures") == ["echo", "slots", "broken", "slow"]
        extra = tmp_path / "user" / "20_extra.toml"
        extra.write_text("[group.extra.inference_ids.x]\nconfig.impl_class='echo_impl'\n")
        import os

        os.utime(extra, (time.time() + 10, time.time() + 10))
        registry.load()
        assert "extra" in registry.groups()


class TestManager:
    def test_load_and_predict(self, manager):
        out = manager.predict(
            "fixtures/echo", [PredictionInput(data={"x": 1})]
        )
        assert out[0]["echo"] == {"x": 1}
        assert "fixtures/echo" in manager.loaded_models()

    def test_lru_eviction_oldest_first(self, manager):
        manager.load_model("fixtures/echo", cache_key="k", lru_size=2)
        manager.load_model("fixtures/slots", cache_key="k", lru_size=2)
        manager.load_model("fixtures/slow", cache_key="k", lru_size=2)
        loaded = manager.loaded_models()
        assert "fixtures/echo" not in loaded
        assert "fixtures/slots" in loaded and "fixtures/slow" in loaded

    def test_renewal_moves_to_mru(self, manager):
        manager.load_model("fixtures/echo", cache_key="k", lru_size=2)
        manager.load_model("fixtures/slots", cache_key="k", lru_size=2)
        manager.load_model("fixtures/echo", cache_key="k", lru_size=2)  # renew
        manager.load_model("fixtures/slow", cache_key="k", lru_size=2)
        loaded = manager.loaded_models()
        # slots was LRU after echo's renewal.
        assert "fixtures/slots" not in loaded and "fixtures/echo" in loaded

    def test_refcount_across_cache_keys(self, manager):
        manager.load_model("fixtures/echo", cache_key="a")
        manager.load_model("fixtures/echo", cache_key="b")
        manager.unload_model("fixtures/echo", cache_key="a")
        assert "fixtures/echo" in manager.loaded_models()
        manager.unload_model("fixtures/echo", cache_key="b")
        assert "fixtures/echo" not in manager.loaded_models()

    def test_ttl_sweep(self, manager):
        manager.load_model("fixtures/echo", cache_key="k", ttl_seconds=0.0)
        time.sleep(0.01)
        unloaded = manager.sweep()
        assert "fixtures/echo" in unloaded
        assert "fixtures/echo" not in manager.loaded_models()

    def test_negative_ttl_never_expires(self, manager):
        manager.load_model("fixtures/echo", cache_key="k", ttl_seconds=-1)
        assert manager.sweep() == []

    def test_failed_load_leaves_no_phantom(self, manager):
        with pytest.raises(ModelLoadError, match="deliberately broken"):
            manager.load_model("fixtures/broken")
        assert "fixtures/broken" not in manager.loaded_models()

    def test_zero_lru_refused(self, manager):
        with pytest.raises(ModelLoadError, match="lru_size"):
            manager.load_model("fixtures/echo", lru_size=0)

    def test_clear_cache(self, manager):
        manager.load_model("fixtures/echo", cache_key="k")
        manager.clear_cache("k")
        assert "fixtures/echo" not in manager.loaded_models()

    def test_error_slots_typed(self, manager):
        out = manager.predict(
            "fixtures/slots",
            [
                PredictionInput(data={}),
                PredictionInput(data={"fail": "input"}),
                PredictionInput(data={"fail": "transient"}),
            ],
        )
        assert out[0] == {"ok": True}
        assert is_error_slot(out[1]) and parse_error_slot(out[1])[0] == "input"
        assert parse_error_slot(out[2])[0] == "transient"

    def test_malformed_slot_rejected(self):
        with pytest.raises(ValueError, match="malformed"):
            parse_error_slot({"__error__": {"class": "bogus", "message": "x"}})
        with pytest.raises(ValueError):
            parse_error_slot({"__error__": "not-an-object"})


BATCH_TOML = """
[group.fixtures.inference_ids.batchsize]
config.impl_class = "batchsize_impl"
[group.fixtures.inference_ids.failbatch]
config.impl_class = "failbatch_impl"
"""


class TestDispatchBatching:
    """Cross-request window batching (dispatch.rs:264) + prewarm."""

    @pytest.fixture
    def bmanager(self, tmp_path):
        builtin = tmp_path / "b"
        builtin.mkdir()
        (builtin / "00.toml").write_text(BUILTIN + BATCH_TOML)
        m = ModelManager(Registry(builtin), IMPL_INDEX)
        yield m
        m.shutdown()

    def test_concurrent_predicts_merge_into_one_window(self, bmanager):
        import threading

        bmanager.load_model("fixtures/batchsize")
        entry = bmanager._models["fixtures/batchsize"]
        results: list = [None] * 6
        # Hold the model lock so every caller enqueues first; releasing it
        # lets one dispatcher drain the whole window as a merged batch.
        entry.lock.acquire()
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i,
                    bmanager.predict(
                        "fixtures/batchsize",
                        [PredictionInput(data=i)],
                        max_batch=8,
                    ),
                )
            )
            for i in range(6)
        ]
        for t in threads:
            t.start()
        # Wait until all six are queued.
        for _ in range(200):
            with entry.qlock:
                if len(entry.queue) == 6:
                    break
            time.sleep(0.005)
        entry.lock.release()
        for t in threads:
            t.join(timeout=10)
        observed = {r[0]["observed_batch"] for r in results}
        assert observed == {6}, f"window did not merge: {observed}"

    def test_window_respects_cap(self, bmanager):
        import threading

        bmanager.load_model("fixtures/batchsize")
        entry = bmanager._models["fixtures/batchsize"]
        results: list = [None] * 6
        entry.lock.acquire()
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i,
                    bmanager.predict(
                        "fixtures/batchsize",
                        [PredictionInput(data=i)],
                        max_batch=3,
                    ),
                )
            )
            for i in range(6)
        ]
        for t in threads:
            t.start()
        for _ in range(200):
            with entry.qlock:
                if len(entry.queue) == 6:
                    break
            time.sleep(0.005)
        entry.lock.release()
        for t in threads:
            t.join(timeout=10)
        observed = [r[0]["observed_batch"] for r in results]
        assert max(observed) <= 3 and sum(observed) >= 6

    def test_merged_failure_falls_back_per_request(self, bmanager):
        import threading

        bmanager.load_model("fixtures/failbatch")
        entry = bmanager._models["fixtures/failbatch"]
        results: list = [None] * 4
        entry.lock.acquire()
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i,
                    bmanager.predict(
                        "fixtures/failbatch",
                        [PredictionInput(data=i)],
                        max_batch=8,
                    ),
                )
            )
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for _ in range(200):
            with entry.qlock:
                if len(entry.queue) == 4:
                    break
            time.sleep(0.005)
        entry.lock.release()
        for t in threads:
            t.join(timeout=10)
        assert all(r == [{"ok": True}] for r in results)

    def test_prewarm_calls_prepare(self, tmp_path):
        calls = []

        class PrepImpl:
            def __init__(self, **_):
                pass

            @classmethod
            def name(cls):
                return "prep_impl"

            def load(self):
                calls.append("load")

            def prepare(self):
                calls.append("prepare")

            def predict(self, inputs):
                return [{"ok": True} for _ in inputs]

            def unload(self):
                pass

        builtin = tmp_path / "p"
        builtin.mkdir()
        (builtin / "00.toml").write_text(
            "[group.g.inference_ids.m]\nconfig.impl_class = 'prep_impl'\n"
        )
        idx = dict(IMPL_INDEX)
        idx["prep_impl"] = PrepImpl
        m = ModelManager(Registry(builtin), idx)
        try:
            m.load_model("g/m", prewarm=True)
            assert calls == ["load", "prepare"]
            m.load_model("g/m")  # idempotent, no re-prepare
            assert calls == ["load", "prepare"]
        finally:
            m.shutdown()


class TestOversizedSplitting:
    """dispatch.rs oversized-request splitting: one request larger than the
    batch cap runs as several cap-sized worker batches, outputs in order."""

    @pytest.fixture
    def bmanager(self, tmp_path):
        builtin = tmp_path / "b"
        builtin.mkdir()
        (builtin / "00.toml").write_text(BUILTIN + BATCH_TOML)
        m = ModelManager(Registry(builtin), IMPL_INDEX)
        yield m
        m.shutdown()

    def test_request_bigger_than_cap_splits(self, bmanager):
        bmanager.load_model("fixtures/batchsize")
        entry = bmanager._models["fixtures/batchsize"]
        n = entry.default_batch * 2 + 3
        out = bmanager.predict(
            "fixtures/batchsize",
            [PredictionInput(data={"i": i}) for i in range(n)],
        )
        assert len(out) == n
        # The impl reports the batch it SAW — every chunk must respect the
        # cap, and the tail chunk carries the remainder.
        sizes = {o["observed_batch"] for o in out}
        assert max(sizes) == entry.default_batch
        assert 3 in sizes

    def test_explicit_max_batch_caps_chunks(self, bmanager):
        bmanager.load_model("fixtures/batchsize")
        out = bmanager.predict(
            "fixtures/batchsize",
            [PredictionInput(data={}) for _ in range(10)],
            max_batch=4,
        )
        assert {o["observed_batch"] for o in out} == {4, 2}


class TestOomRetry:
    """Device-OOM → batch-halving retry (impl/utils.py run_with_oom_retry):
    the dispatch layer halves the batch until it fits, never surfacing the
    OOM unless a single item alone overflows."""

    @pytest.fixture
    def omanager(self, tmp_path):
        builtin = tmp_path / "b"
        builtin.mkdir()
        (builtin / "00.toml").write_text(
            BUILTIN
            + "[group.fixtures.inference_ids.oom]\n"
            + "config.impl_class = 'oom_impl'\n"
            + "config.oom_above = 2\n"
        )
        m = ModelManager(Registry(builtin), IMPL_INDEX)
        yield m
        m.shutdown()

    def test_halves_until_it_fits(self, omanager):
        out = omanager.predict(
            "fixtures/oom", [PredictionInput(data={}) for _ in range(8)]
        )
        assert len(out) == 8
        model = omanager._models["fixtures/oom"].model
        assert max(c for c in model.calls if c <= 2) <= 2
        assert 8 in model.calls  # the first attempt DID try the full batch

    def test_single_item_oom_surfaces(self, omanager):
        omanager.load_model("fixtures/oom")
        omanager._models["fixtures/oom"].model.oom_above = 0
        with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
            omanager.predict("fixtures/oom", [PredictionInput(data={})])


class TestCustomImplDiscovery:
    """User custom impls (reference impl_dirs/IMPL_CLASS discovery:
    python/inferio_worker/discovery.py, inferio/registry.rs:1-64)."""

    def _write_user_impl(self, tmp_path):
        custom = tmp_path / "custom_impls"
        custom.mkdir()
        (custom / "my_model.py").write_text(
            "IMPL_CLASS = 'shout_impl'\n"
            "\n"
            "class shout_impl:\n"
            "    def __init__(self, suffix='!', **kw):\n"
            "        self.suffix = suffix\n"
            "    @classmethod\n"
            "    def name(cls):\n"
            "        return 'shout'\n"
            "    def load(self):\n"
            "        pass\n"
            "    def unload(self):\n"
            "        pass\n"
            "    def predict(self, inputs):\n"
            "        return [str(i.data).upper() + self.suffix for i in inputs]\n"
        )
        (custom / "broken_module.py").write_text("raise RuntimeError('boom')\n")
        return custom

    def test_user_impl_loads_and_predicts(self, tmp_path):
        self._write_user_impl(tmp_path)
        user = tmp_path / "user_reg"
        user.mkdir()
        (user / "90_custom.toml").write_text(
            'impl_dirs = ["../custom_impls"]\n'
            "[group.custom]\n"
            'config.impl_class = "shout_impl"\n'
            "[group.custom.inference_ids.shout]\n"
            'config.suffix = "?!"\n'
        )
        builtin = tmp_path / "builtin"
        builtin.mkdir()
        (builtin / "00_base.toml").write_text(BUILTIN)
        reg = Registry(builtin, user)
        assert any(p.name == "custom_impls" for p in reg.impl_dirs())
        m = ModelManager(reg, IMPL_INDEX)
        try:
            m.load_model("custom/shout")
            out = m.predict("custom/shout", [PredictionInput(data="hey")])
            assert out == ["HEY?!"]
        finally:
            m.shutdown()

    def test_unknown_class_errors_at_load_with_module_error(self, tmp_path):
        self._write_user_impl(tmp_path)
        user = tmp_path / "user_reg"
        user.mkdir()
        (user / "90_custom.toml").write_text(
            'impl_dirs = ["../custom_impls"]\n'
            "[group.custom]\n"
            'config.impl_class = "missing_impl"\n'
            "[group.custom.inference_ids.x]\n"
        )
        builtin = tmp_path / "builtin"
        builtin.mkdir()
        (builtin / "00_base.toml").write_text(BUILTIN)
        m = ModelManager(Registry(builtin, user), IMPL_INDEX)
        try:
            with pytest.raises(ModelLoadError) as err:
                m.load_model("custom/x")
            # The broken sibling module's import error surfaces in the
            # message so users can see WHY their class is missing.
            assert "missing_impl" in str(err.value)
            assert "boom" in str(err.value)
        finally:
            m.shutdown()


class TestPinSafeEviction:
    def test_eviction_during_predict_defers_unload(self, manager):
        """LRU eviction arriving while a predict is in flight must not
        unload the model under the caller — it defers to the last
        unpinner (regression: every unload path except sweep ignored
        predict_pins)."""
        import threading

        from panoptikon_tpu.models.base import PredictionInput

        started = threading.Event()
        release = threading.Event()
        results = {}

        # slow_impl sleeps `delay` per predict; use an event-gated wrapper
        # by pre-pinning via a thread that predicts while we evict.
        def worker():
            started.set()
            results["out"] = manager.predict(
                "fixtures/slow",
                [PredictionInput(data={"x": 1})],
                cache_key="k1", lru_size=1,
            )
            release.set()

        manager.load_model("fixtures/slow", cache_key="k1", lru_size=1)
        t = threading.Thread(target=worker)
        t.start()
        assert started.wait(10)
        # Evict by loading another model into the same size-1 cache while
        # the predict may be in flight.
        manager.load_model("fixtures/echo", cache_key="k1", lru_size=1)
        assert release.wait(30)
        t.join(10)
        assert results["out"] is not None and len(results["out"]) == 1
        # The evicted model eventually unloads (no phantom residents).
        deadline = 50
        for _ in range(deadline):
            with manager._state:
                gone = "fixtures/slow" not in manager._models
            if gone:
                break
            import time as _t

            _t.sleep(0.1)
        assert gone

    def test_unload_while_pinned_defers(self, manager):
        import threading
        import time as _t

        from panoptikon_tpu.models.base import PredictionInput

        # Pin manually through a long predict on slow_impl.
        manager.load_model("fixtures/slow", cache_key="k", lru_size=2)
        in_predict = threading.Event()
        done = threading.Event()

        def worker():
            in_predict.set()
            manager.predict(
                "fixtures/slow", [PredictionInput(data={"y": 2})],
                cache_key="k", lru_size=2,
            )
            done.set()

        t = threading.Thread(target=worker)
        t.start()
        in_predict.wait(10)
        manager.unload_model("fixtures/slow")  # must not crash the predict
        assert done.wait(30)
        t.join(10)


class TestUnloadResurrectRace:
    def test_unload_skips_entry_with_live_refs(self, manager):
        """_unload decisions are made under _state but executed after
        releasing it; a load_model that re-references the entry in that
        window must win (regression: _unload nulled the weights of a
        model a concurrent caller was just promised is loaded)."""
        from panoptikon_tpu.models.base import PredictionInput

        manager.load_model("fixtures/echo", cache_key="k", lru_size=2)
        # Simulate the stale deferred decision arriving after the renew.
        manager._unload("fixtures/echo")
        with manager._state:
            assert "fixtures/echo" in manager._models
        out = manager.predict(
            "fixtures/echo", [PredictionInput(data={"x": 1})],
            cache_key="k", lru_size=2,
        )
        assert len(out) == 1


class TestDiscoverySignature:
    def test_rescan_when_mtime_preserved_but_size_changes(self, tmp_path):
        """Backup-restore / same-mtime rewrites must invalidate the module
        cache (same signature discipline as Registry.load)."""
        import os

        from panoptikon_tpu.models import discovery

        f = tmp_path / "userimpl.py"
        f.write_text(
            "IMPL_CLASS = 'UserA'\n"
            "class UserA:\n"
            "    MARK = 1\n"
        )
        st = f.stat()
        scan1 = discovery.discover([tmp_path])
        assert scan1["UserA"].MARK == 1
        f.write_text(
            "IMPL_CLASS = 'UserA'\n"
            "class UserA:\n"
            "    MARK = 2  # longer file, same mtime\n"
        )
        os.utime(f, (st.st_atime, st.st_mtime))
        scan2 = discovery.discover([tmp_path])
        assert scan2["UserA"].MARK == 2
