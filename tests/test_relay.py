"""Relay pairing registry: two-phase operations, policy scoping,
durability, TTL, caps (api/relay.py; reference api/relay.rs:230-430)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from panoptikon_tpu.api import relay as relay_mod
from panoptikon_tpu.api.server import AppState, build_app
from panoptikon_tpu.config import PolicyConfig

CRED = "c" * 40


@pytest.fixture
def env(tmp_path):
    reg = tmp_path / "registry"
    reg.mkdir()
    (reg / "00.toml").write_text("")
    state = AppState.create(tmp_path / "data", reg)
    policies = [
        PolicyConfig(name="alpha", allow=["* /api/search/"]),
        PolicyConfig(name="beta", allow=["* /"]),
        PolicyConfig(name="norelay", allow=["* /"], relay_enabled=False),
    ]

    loop = asyncio.new_event_loop()
    clients = {}
    for policy in (None, "alpha", "beta", "norelay"):
        app = build_app(state, policies if policy else None, policy)
        c = TestClient(TestServer(app), loop=loop)
        loop.run_until_complete(c.start_server())
        clients[policy] = c

    def call(method, path, policy=None, **kwargs):
        async def do():
            resp = await clients[policy].request(method, path, **kwargs)
            if resp.content_type == "application/json":
                body = await resp.json()
            else:
                body = await resp.read()
            return resp.status, body, resp.headers

        return loop.run_until_complete(do())

    yield {"call": call, "state": state, "tmp": tmp_path, "loop": loop}
    for c in clients.values():
        loop.run_until_complete(c.close())
    state.shutdown()
    loop.close()


def full_pairing(call, relay_id="r-1", policy=None, credential=CRED):
    st, op, _ = call(
        "POST", f"/api/relay/pairing-operations/{relay_id}", policy=policy
    )
    assert st == 202
    st, _, _ = call(
        "POST", f"/api/relay/pairing-operations/{op['operation_id']}/commit",
        policy=policy,
        json={"relay_id": relay_id, "instance_id": "i-1",
              "credential": credential},
    )
    assert st == 204
    return op["operation_id"]


class TestTwoPhase:
    def test_begin_commit_recover_delete(self, env):
        call = env["call"]
        opid = full_pairing(call)
        st, body, headers = call("GET", "/api/relay/pairings/r-1")
        assert st == 200
        assert body["credential"] == CRED
        assert body["instance_id"] == "i-1"
        assert body["operation_id"] == opid
        assert headers.get("Cache-Control") == "no-store"
        # The committed operation is consumed.
        st, _, _ = call("GET", "/api/relay/pairing-operations/r-1")
        assert st == 404
        st, body, _ = call("DELETE", "/api/relay/pairings/r-1")
        assert st == 200 and body["deleted"]
        st, _, _ = call("GET", "/api/relay/pairings/r-1")
        assert st == 404

    def test_begin_is_idempotent(self, env):
        call = env["call"]
        st1, op1, _ = call("POST", "/api/relay/pairing-operations/r-9")
        st2, op2, _ = call("POST", "/api/relay/pairing-operations/r-9")
        assert st1 == 202 and st2 == 200
        assert op1["operation_id"] == op2["operation_id"]

    def test_commit_replay_is_idempotent(self, env):
        call = env["call"]
        opid = full_pairing(call, "r-2")
        st, _, _ = call(
            "POST", f"/api/relay/pairing-operations/{opid}/commit",
            json={"relay_id": "r-2", "instance_id": "i-1",
                  "credential": CRED},
        )
        assert st == 204  # same tuple → replay, not conflict

    def test_commit_conflict_on_changed_pairing(self, env):
        call = env["call"]
        full_pairing(call, "r-3")
        st, op, _ = call("POST", "/api/relay/pairing-operations/r-3")
        st, _, _ = call(
            "POST", f"/api/relay/pairing-operations/{op['operation_id']}/commit",
            json={"relay_id": "r-3", "instance_id": "OTHER",
                  "credential": "d" * 40},
        )
        assert st == 409

    def test_commit_unknown_operation_gone(self, env):
        call = env["call"]
        st, _, _ = call(
            "POST", "/api/relay/pairing-operations/nope/commit",
            json={"relay_id": "r-4", "instance_id": "i", "credential": CRED},
        )
        assert st == 410

    def test_commit_rejects_bad_credential(self, env):
        call = env["call"]
        st, op, _ = call("POST", "/api/relay/pairing-operations/r-5")
        st, _, _ = call(
            "POST", f"/api/relay/pairing-operations/{op['operation_id']}/commit",
            json={"relay_id": "r-5", "instance_id": "i", "credential": "xx"},
        )
        assert st == 400

    def test_cancel_discards_operation(self, env):
        call = env["call"]
        st, op, _ = call("POST", "/api/relay/pairing-operations/r-6")
        st, _, _ = call(
            "POST",
            f"/api/relay/pairing-operations/{op['operation_id']}/cancel",
        )
        assert st == 204
        st, _, _ = call("GET", "/api/relay/pairing-operations/r-6")
        assert st == 404


class TestScopingAndPolicy:
    def test_policies_are_isolated(self, env):
        call = env["call"]
        full_pairing(call, "r-x", policy="beta")
        # A different policy (or the unrestricted scope) can't see it.
        st, _, _ = call("GET", "/api/relay/pairings/r-x")
        assert st == 404
        st, _, _ = call("GET", "/api/relay/pairings/r-x", policy="beta")
        assert st == 200

    def test_relay_disabled_policy_403(self, env):
        call = env["call"]
        st, _, _ = call(
            "POST", "/api/relay/pairing-operations/r-y", policy="norelay"
        )
        assert st == 403

    def test_restricted_ruleset_still_bootstraps_relay(self, env):
        """alpha's ruleset only allows /api/search/ — relay paths must
        bypass the RULESET (policy.rs:288-293) while staying scoped."""
        call = env["call"]
        st, _, _ = call("GET", "/api/search/stats", policy="alpha")
        assert st == 200
        st, _, _ = call("GET", "/api/jobs/queue", policy="alpha")
        assert st == 403
        full_pairing(call, "r-z", policy="alpha")
        st, body, _ = call("GET", "/api/relay/pairings/r-z", policy="alpha")
        assert st == 200 and body["credential"] == CRED


class TestDurabilityAndTtl:
    def test_pairings_survive_store_reload(self, env):
        call = env["call"]
        full_pairing(call, "r-d")
        path = env["state"].data_root / "relay_pairings.json"
        data = json.loads(path.read_text())
        assert any(p["relay_id"] == "r-d" for p in data["pairings"])
        # Fresh store (new process simulation) still recovers it.
        fresh = relay_mod.RelayStore(path=path)
        fresh._load()
        assert any(p["relay_id"] == "r-d" for p in fresh.pairings)

    def test_expired_operation_is_pruned(self, env, monkeypatch):
        call = env["call"]
        st, op, _ = call("POST", "/api/relay/pairing-operations/r-t")
        assert st == 202
        monkeypatch.setattr(
            relay_mod, "_now",
            lambda: op["expires_unix"] + 1,
        )
        st, _, _ = call("GET", "/api/relay/pairing-operations/r-t")
        assert st == 404
        st, _, _ = call(
            "POST", f"/api/relay/pairing-operations/{op['operation_id']}/commit",
            json={"relay_id": "r-t", "instance_id": "i", "credential": CRED},
        )
        assert st == 410

    def test_per_policy_operation_cap(self, env, monkeypatch):
        call = env["call"]
        monkeypatch.setattr(relay_mod, "MAX_PENDING_OPERATIONS_PER_POLICY", 3)
        for i in range(3):
            st, _, _ = call(
                "POST", f"/api/relay/pairing-operations/cap-{i}",
                policy="beta",
            )
            assert st == 202
        st, _, _ = call(
            "POST", "/api/relay/pairing-operations/cap-overflow",
            policy="beta",
        )
        assert st == 429
        # Another policy is unaffected by beta's cap.
        st, _, _ = call("POST", "/api/relay/pairing-operations/cap-other")
        assert st == 202


class TestHardening:
    def test_commit_non_object_body_is_400(self, env):
        call = env["call"]
        st, _, _ = call(
            "POST", "/api/relay/pairing-operations/x/commit", json=[1, 2]
        )
        assert st == 400

    def test_deny_rule_still_blocks_relay_paths(self, tmp_path):
        """The allow-list bypass must NOT bypass explicit deny rules."""
        import asyncio as _asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from panoptikon_tpu.api.server import AppState, build_app

        reg = tmp_path / "registry"
        reg.mkdir()
        (reg / "00.toml").write_text("")
        state = AppState.create(tmp_path / "data", reg)
        policies = [PolicyConfig(name="d", allow=["* /"],
                                 deny=["* /api/relay/"])]
        loop = _asyncio.new_event_loop()
        app = build_app(state, policies, "d")
        c = TestClient(TestServer(app), loop=loop)
        loop.run_until_complete(c.start_server())
        try:
            resp = loop.run_until_complete(
                c.request("POST", "/api/relay/pairing-operations/r")
            )
            assert resp.status == 403
        finally:
            loop.run_until_complete(c.close())
            state.shutdown()
            loop.close()

    def test_relay_enabled_parses_from_toml(self, tmp_path):
        from panoptikon_tpu.config import Settings

        cfg = tmp_path / "s.toml"
        cfg.write_text(
            'data_root = "x"\n'
            "[[policies]]\n"
            'name = "p"\n'
            "relay_enabled = false\n"
        )
        s = Settings.load(cfg, root=tmp_path)
        assert s.policies[0].relay_enabled is False
