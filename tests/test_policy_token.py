"""SSR policy tokens (reference: src/policy_token.rs): HMAC-signed,
short-lived policy selectors. A verified x-panoptikon-policy header selects
the named policy over listener/host matching; forged/expired/malformed
tokens fall back silently; the proxy mints fresh tokens and strips
client-supplied ones."""

import asyncio

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from panoptikon_tpu.api.policy import PolicyEngine, policy_middleware
from panoptikon_tpu.api.policy_token import (
    POLICY_TOKEN_HEADER,
    TokenError,
    TokenKey,
)
from panoptikon_tpu.config import PolicyConfig


class TestTokenKey:
    def test_mint_verify_round_trip(self):
        key = TokenKey.from_config(None)
        # Dotted policy names must survive the right-split parse.
        for name in ["localhost", "public_demo", "a.b.c", "x"]:
            assert key.verify(key.mint(name)) == name

    def test_expiry_boundary(self):
        key = TokenKey.from_config(None)
        tok = key.sign("demo", 1_000_000)
        assert key.verify_at(tok, 1_000_000) == "demo"
        assert key.verify_at(tok, 999_999) == "demo"
        with pytest.raises(TokenError) as e:
            key.verify_at(tok, 1_000_001)
        assert e.value.kind == "expired"

    def test_tamper_and_wrong_key(self):
        key = TokenKey.from_config(None)
        tok = key.mint("demo")
        name, expiry, tag = tok.rsplit(".", 2)
        with pytest.raises(TokenError) as e:
            key.verify(f"other.{expiry}.{tag}")
        assert e.value.kind == "bad-hmac"
        with pytest.raises(TokenError):
            TokenKey.from_config("ab" * 32).verify(tok)

    def test_malformed(self):
        key = TokenKey.from_config(None)
        for bad in ["", "nodots", "a.b", ".123.deadbeef", "a.xx.deadbeef",
                    "a.123.nothex!"]:
            with pytest.raises(TokenError) as e:
                key.verify(bad)
            assert e.value.kind == "malformed"

    def test_pinned_key_from_hex(self):
        a = TokenKey.from_config("00" * 32)
        b = TokenKey.from_config("00" * 32)
        assert b.verify(a.mint("shared")) == "shared"
        with pytest.raises(ValueError):
            TokenKey.from_config("abcd")  # not 32 bytes
        with pytest.raises(ValueError):
            TokenKey.from_config("zz" * 32)  # not hex


POLICIES = [
    PolicyConfig(name="locked", allow=["GET /health"], index_db="stdtest"),
    PolicyConfig(name="open", allow=["* /"]),
]


def _serve(token_key, listener_policy):
    async def whoami(request):
        return web.json_response({
            "policy": request.get("policy_name"),
            "pinned": request.get("pinned_index_db"),
        })

    app = web.Application(middlewares=[
        policy_middleware(PolicyEngine(POLICIES), listener_policy,
                          token_key=token_key)
    ])
    app.router.add_get("/health", whoami)
    app.router.add_get("/api/other", whoami)
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())

    def call(path, headers=None):
        async def do():
            resp = await client.request("GET", path, headers=headers or {})
            body = (await resp.json()
                    if resp.content_type == "application/json" else None)
            return resp.status, body
        return loop.run_until_complete(do())

    return call, lambda: (loop.run_until_complete(client.close()),
                          loop.close())


class TestMiddlewareSelection:
    def test_token_overrides_listener_policy(self):
        key = TokenKey.from_config(None)
        call, done = _serve(key, "locked")
        try:
            # Listener pin: only /health allowed, DB pinned.
            status, body = call("/health")
            assert status == 200 and body["policy"] == "locked"
            assert body["pinned"] == "stdtest"
            assert call("/api/other")[0] == 403
            # A valid token names the open policy → path now allowed.
            tok = key.mint("open")
            status, body = call("/api/other",
                                {POLICY_TOKEN_HEADER: tok})
            assert status == 200 and body["policy"] == "open"
            assert body["pinned"] is None
        finally:
            done()

    def test_bad_tokens_fall_back(self):
        key = TokenKey.from_config(None)
        forged = TokenKey.from_config(None).mint("open")
        call, done = _serve(key, "locked")
        try:
            for tok in [forged, "garbage", key.sign("open", 1)]:
                assert call("/api/other", {POLICY_TOKEN_HEADER: tok})[0] == 403
            # Valid token naming a nonexistent policy also falls back.
            assert call("/api/other",
                        {POLICY_TOKEN_HEADER: key.mint("ghost")})[0] == 403
        finally:
            done()


class TestProxyMinting:
    def test_proxy_mints_and_strips(self):
        """UI-bound proxied requests carry a fresh token naming the matched
        policy; a client-supplied token header never passes through."""
        key = TokenKey.from_config(None)
        loop = asyncio.new_event_loop()

        seen = {}

        async def upstream_handler(request):
            seen["token"] = request.headers.get(POLICY_TOKEN_HEADER)
            return web.json_response({"ok": True})

        up_app = web.Application()
        up_app.router.add_get("/page", upstream_handler)
        up_client = TestClient(TestServer(up_app), loop=loop)
        loop.run_until_complete(up_client.start_server())
        up_url = str(up_client.make_url(""))

        from panoptikon_tpu.api.proxy import make_upstream_handler

        gw_app = web.Application(middlewares=[
            policy_middleware(PolicyEngine(POLICIES), "open", token_key=key)
        ])
        gw_app.router.add_route(
            "*", "/{tail:.*}", make_upstream_handler(up_url, token_key=key))
        gw_client = TestClient(TestServer(gw_app), loop=loop)
        loop.run_until_complete(gw_client.start_server())

        async def do(headers):
            resp = await gw_client.get("/page", headers=headers)
            return resp.status

        try:
            attacker = TokenKey.from_config(None).mint("locked")
            assert loop.run_until_complete(
                do({POLICY_TOKEN_HEADER: attacker})) == 200
            # The upstream saw OUR minted token for the matched policy —
            # not the attacker-supplied header.
            assert seen["token"] != attacker
            assert key.verify(seen["token"]) == "open"
        finally:
            loop.run_until_complete(gw_client.close())
            loop.run_until_complete(up_client.close())
            loop.close()
