"""Config, env templating, policy layer, inference pool tests."""

import pytest

from panoptikon_tpu.api.policy import PolicyEngine
from panoptikon_tpu.config import PolicyConfig, Settings
from panoptikon_tpu.models.base import PredictionInput
from panoptikon_tpu.models.pool import InferencePool
from panoptikon_tpu.utils.env_template import TemplateError, load_dotenv, resolve


class TestEnvTemplate:
    def test_basic_substitution(self):
        env = {"FOO": "bar"}
        assert resolve("x-${FOO}-y", env) == "x-bar-y"

    def test_unset_raises(self):
        with pytest.raises(TemplateError, match="MISSING"):
            resolve("${MISSING}", {})

    def test_default_dash_colon_empty_or_unset(self):
        assert resolve("${X:-d}", {}) == "d"
        assert resolve("${X:-d}", {"X": ""}) == "d"
        assert resolve("${X:-d}", {"X": "v"}) == "v"

    def test_default_dash_only_unset(self):
        assert resolve("${X-d}", {}) == "d"
        assert resolve("${X-d}", {"X": ""}) == ""
        assert resolve("${X-d}", {"X": "v"}) == "v"

    def test_escape(self):
        assert resolve("$${FOO}", {}) == "${FOO}"

    def test_dotenv_never_overrides(self, tmp_path, monkeypatch):
        monkeypatch.setenv("KEEP", "original")
        f = tmp_path / ".env"
        f.write_text("KEEP=clobbered\nNEW=value\n# comment\n")
        loaded = load_dotenv(f)
        import os

        assert os.environ["KEEP"] == "original"
        assert loaded == {"NEW": "value"}
        monkeypatch.delenv("NEW")


class TestSettings:
    def test_load_toml_with_templating(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PK_PORT_TEST", "7001")
        cfg = tmp_path / "server.toml"
        cfg.write_text(
            """
data_root = "${PK_DATA:-/tmp/pkdata}"
[[listeners]]
host = "0.0.0.0"
port = "${PK_PORT_TEST}"
[[policies]]
name = "test"
allow = ["* /api/"]
index_db = "stdtest"
[search]
cache_bytes = 1024
"""
        )
        s = Settings.load(cfg, root=tmp_path)
        assert s.data_root == "/tmp/pkdata"
        assert s.listeners[0].port == 7001
        assert s.policies[0].index_db == "stdtest"
        assert s.search.cache_bytes == 1024

    def test_defaults(self):
        s = Settings.from_dict({})
        assert s.listeners[0].port == 6342
        assert s.jobs.default_batch_size == 16


class TestPolicy:
    def engine(self):
        return PolicyEngine(
            [
                PolicyConfig(name="testdb", hosts=["preview.local"],
                             allow=["* /api/"], index_db="stdtest",
                             read_only=True),
                PolicyConfig(name="main", allow=["* /"], deny=["DELETE /api/db"]),
            ]
        )

    def test_host_match_selects_explicit_only(self):
        e = self.engine()
        p = e.select("preview.local:6342", None)
        assert p.name == "testdb"
        # A hostless policy binds only via listener pinning — it must not
        # capture arbitrary hosts (that would lock down the main listener).
        assert e.select("localhost", None) is None

    def test_listener_pin_short_circuits(self):
        e = self.engine()
        assert e.select("anything", "testdb").name == "testdb"

    def test_ruleset_allow_deny(self):
        e = self.engine()
        main = e.select("x", "main")
        assert e.check(main, "GET", "/api/search/pql")
        assert not e.check(main, "DELETE", "/api/db")
        testdb = e.select(None, "testdb")
        assert e.check(testdb, "GET", "/api/items/abc")
        assert not e.check(testdb, "GET", "/health")  # not under /api/

    def test_read_only_blocks_mutations_but_not_search(self):
        e = self.engine()
        p = e.select(None, "testdb")
        assert e.check(p, "POST", "/api/search/pql")  # search POST is read
        assert not e.check(p, "PUT", "/api/jobs/folders")


class _FakeBackend:
    def __init__(self, name, fail=False):
        self.name = name
        self.fail = fail
        self.calls = 0

    def predict(self, inference_id, inputs, **kw):
        self.calls += 1
        if self.fail:
            raise RuntimeError("down")
        return [{"served_by": self.name} for _ in inputs]

    def load_model(self, inference_id, **kw):
        if self.fail:
            raise RuntimeError("down")

    def unload_model(self, inference_id, cache_key=None):
        return True


class TestPool:
    def test_weighted_distribution(self):
        a, b = _FakeBackend("a"), _FakeBackend("b")
        pool = InferencePool()
        pool.add(a, weight=3, name="a")
        pool.add(b, weight=1, name="b")
        for _ in range(40):
            pool.predict("m", [PredictionInput()])
        assert a.calls == 30 and b.calls == 10

    def test_failover(self):
        a, b = _FakeBackend("a", fail=True), _FakeBackend("b")
        pool = InferencePool()
        pool.add(a, weight=10, name="a")
        pool.add(b, weight=1, name="b")
        out = pool.predict("m", [PredictionInput()])
        assert out[0]["served_by"] == "b"
        assert pool.stats()[0]["healthy"] is False

    def test_all_down_raises(self):
        pool = InferencePool()
        pool.add(_FakeBackend("a", fail=True), name="a")
        with pytest.raises(RuntimeError, match="all inference upstreams"):
            pool.predict("m", [PredictionInput()])

    def test_http_4xx_passes_through_without_demotion(self):
        """A remote 400 means the REQUEST is bad: it must propagate (no
        replay on other upstreams) and must NOT mark the upstream
        unhealthy — regression: HttpBackendError carried the status only
        in its message, so the 4xx classification never fired."""
        from panoptikon_tpu.models.http_backend import HttpBackendError

        class _Http400(_FakeBackend):
            def predict(self, inference_id, inputs, **kw):
                self.calls += 1
                raise HttpBackendError(
                    "POST /predict/g/n -> 400: unknown id", code=400
                )

        bad = _Http400("a")
        fallback = _FakeBackend("b")
        pool = InferencePool()
        pool.add(bad, weight=10, name="a")
        pool.add(fallback, weight=1, name="b")
        with pytest.raises(HttpBackendError):
            pool.predict("m", [PredictionInput()])
        assert fallback.calls == 0  # doomed payload not replayed
        assert all(s["healthy"] for s in pool.stats())

    def test_http_5xx_still_fails_over(self):
        from panoptikon_tpu.models.http_backend import HttpBackendError

        class _Http500(_FakeBackend):
            def predict(self, inference_id, inputs, **kw):
                self.calls += 1
                raise HttpBackendError(
                    "POST /predict/g/n -> 500: boom", code=500
                )

        pool = InferencePool()
        pool.add(_Http500("a"), weight=10, name="a")
        pool.add(_FakeBackend("b"), weight=1, name="b")
        out = pool.predict("m", [PredictionInput()])
        assert out[0]["served_by"] == "b"
        assert pool.stats()[0]["healthy"] is False
