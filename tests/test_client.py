"""Python client library tests: drive the real aiohttp app over a real
socket (ephemeral port, background-thread event loop) with the synchronous
:mod:`panoptikon_tpu.client` — the L8 client surface the reference covers
with its generated TypeScript bindings (SURVEY §1 L8, openapi.rs)."""

import asyncio
import threading

import numpy as np
import pytest

from panoptikon_tpu.api.server import AppState, build_app
from panoptikon_tpu.client import (
    PanoptikonClient,
    PanoptikonError,
    raw_embedding_query,
)

REG_TOML = """
[group.clip]
config.impl_class = "clip"
config.model_arch = "test-tiny"
[group.clip.metadata]
name = "CLIP"
output_type = "clip"
input_mime_types = ["image/"]
default_batch_size = 4
[group.clip.inference_ids.tiny]
metadata.description = "tiny clip"

[group.fixtures]
config.impl_class = "echo_impl"
[group.fixtures.inference_ids.echo]
"""


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    """The real app bound to an ephemeral localhost port, served from a
    dedicated thread's event loop so the sync client can block freely."""
    tmp_path = tmp_path_factory.mktemp("client_env")
    media = tmp_path / "media"
    media.mkdir()
    from PIL import Image

    for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        Image.new("RGB", (40, 40), color).save(media / f"img{i}.png")
    reg = tmp_path / "registry"
    reg.mkdir()
    (reg / "00.toml").write_text(REG_TOML)
    state = AppState.create(tmp_path / "data", reg)
    app = build_app(state)

    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_holder = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            runner = aioweb.AppRunner(app)
            await runner.setup()
            site = aioweb.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            port_holder["port"] = runner.addresses[0][1]
            port_holder["runner"] = runner

        from aiohttp import web as aioweb

        loop.run_until_complete(start())
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)
    yield {"port": port_holder["port"], "media": media, "state": state}
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=10)


@pytest.fixture(scope="module")
def client(live_server):
    with PanoptikonClient(
        f"http://127.0.0.1:{live_server['port']}", timeout=120
    ) as c:
        yield c


@pytest.fixture(scope="module")
def indexed(client, live_server):
    """Scan the media folder once for the read-path tests."""
    client.jobs.set_folders(
        included=[str(live_server["media"])], rescan=False
    )
    job = client.jobs.rescan_folders()
    done = client.jobs.wait(job["job_id"], timeout=120)
    assert done.get("state") in ("completed", "unknown")
    return client.search.pql({"page_size": 10})


class TestClientCore:
    def test_health_and_discovery(self, client):
        assert client.health()["status"] == "ok"
        assert "/api/search/pql" in str(client.openapi())
        assert isinstance(client.client_config(), dict)

    def test_error_mapping(self, client):
        with pytest.raises(PanoptikonError) as err:
            client.items.metadata("0" * 64)
        assert err.value.status == 404
        assert err.value.path.startswith("/api/items/")
        # Bad request bodies surface the server's message, not raw bytes.
        with pytest.raises(PanoptikonError) as err:
            client.request(
                "POST", "/api/jobs/data/extraction", json_body={}
            )
        assert err.value.status == 400
        assert "inference_id" in err.value.message

    def test_keepalive_survives_many_calls(self, client):
        for _ in range(25):
            assert client.health()["status"] == "ok"


class TestClientReadPath:
    def test_scan_search_items(self, client, indexed, live_server):
        assert indexed["count"] == 3
        sha = indexed["results"][0]["sha256"]
        meta = client.items.metadata(sha)
        assert meta["type"] == "image/png"

        whole = client.items.file(sha)
        assert whole.status == 200 and len(whole.body) > 0
        ranged = client.items.file(sha, byte_range=(0, 9))
        assert ranged.status == 206 and len(ranged.body) == 10
        assert ranged.content_range.startswith("bytes 0-9/")

        thumb = client.items.thumbnail(sha)
        assert thumb.status == 200 and thumb.body

    def test_bookmarks_roundtrip(self, client, indexed):
        sha = indexed["results"][0]["sha256"]
        client.bookmarks.put("alice", "favs", sha, metadata={"note": "hi"})
        rows = client.bookmarks.list("alice")
        assert any(r["sha256"] == sha for r in rows)
        client.bookmarks.delete("alice", "favs", sha)
        assert not any(
            r["sha256"] == sha for r in client.bookmarks.list("alice")
        )

    def test_pinboards_roundtrip(self, client, indexed):
        shas = [r["sha256"] for r in indexed["results"][:2]]
        pb = client.pinboards.create("alice", "board-1")
        pid = pb["id"]
        client.pinboards.save_version("alice", pid, layout=shas)
        got = client.pinboards.get("alice", pid)
        assert got["name"] == "board-1"
        assert got["versions"]
        boards = client.pinboards.list("alice")
        assert any(b["id"] == pid for b in boards)
        client.pinboards.delete("alice", pid)
        assert not any(
            b["id"] == pid for b in client.pinboards.list("alice")
        )

    def test_jobs_and_config_surfaces(self, client, indexed):
        status = client.jobs.queue()
        assert set(status) == {"running", "pending", "history"}
        folders = client.jobs.get_folders()
        assert folders  # scanned folder registered
        assert isinstance(client.jobs.quants(), list)
        assert isinstance(client.jobs.history_scans(), list)
        cfg = client.config.get()
        assert isinstance(cfg, dict)
        assert isinstance(client.search.stats(), dict)
        assert isinstance(client.search.cache_stats(), dict)


class TestClientInference:
    def test_metadata_and_predict_echo(self, client):
        meta = client.inference.metadata()
        assert "echo" in meta.get("fixtures", {}).get("inference_ids", {})
        out = client.inference.predict(
            "fixtures/echo",
            [{"x": 1}, {"x": 2}],
            files={1: b"abc"},
        )
        assert len(out) == 2
        client.inference.unload("fixtures/echo")

    def test_cache_surface(self, client):
        assert isinstance(client.inference.cache_list(), (list, dict))


class TestRawVectorSearch:
    def test_raw_vector_query_roundtrip(self, client, live_server):
        """Install a tiny embedding space server-side, quant-build it, then
        run the FULL client path: raw-vector PQL page + order check."""
        index = live_server["state"].index("default")
        rng = np.random.default_rng(3)
        ids = np.arange(1, 4, dtype=np.int64)
        vecs = rng.standard_normal((3, 16)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        if "client/space" not in index.space_names():
            index.add("client/space", ids, ids, vecs)
        index.build_quant("client/space")

        q = raw_embedding_query(vecs[1])
        page = client.search.pql({
            "query": {"text_embeddings": {
                "query": q, "model": "client/space",
                "embed": None, "index": "quant"}},
            "page_size": 3,
        })
        assert page["results"], "semantic page should return rows"
        assert page["results"][0]["item_id"] == 2  # self-match first


class TestCliClientCommands:
    """The client-powered CLI subcommands (scripts/ tooling surface):
    each prints one JSON document to stdout for scripting."""

    def _run(self, capsys, argv):
        from panoptikon_tpu import cli

        rc = cli.main(argv)
        out = capsys.readouterr().out.strip()
        import json as _json

        return rc, _json.loads(out)

    def test_health_and_jobs(self, client, live_server, capsys):
        url = f"http://127.0.0.1:{live_server['port']}"
        rc, doc = self._run(capsys, ["health", "--server", url])
        assert rc == 0 and doc["status"] == "ok"
        rc, doc = self._run(capsys, ["jobs", "--server", url])
        assert rc == 0 and set(doc) == {"running", "pending", "history"}

    def test_scan_wait_merges_folders(self, client, live_server, capsys, tmp_path):
        url = f"http://127.0.0.1:{live_server['port']}"
        extra = tmp_path / "more_media"
        extra.mkdir()
        rc, doc = self._run(
            capsys, ["scan", "--add", str(extra), "--wait", "--server", url]
        )
        assert rc == 0 and doc["result"]["state"] in ("completed", "unknown")
        folders = {f["path"] for f in client.jobs.get_folders()
                   if f.get("included")}
        assert str(extra) in folders
        assert str(live_server["media"]) in folders  # merge kept the old one

    def test_search_pql_body_from_file(self, client, live_server, capsys, tmp_path):
        url = f"http://127.0.0.1:{live_server['port']}"
        body = tmp_path / "q.json"
        body.write_text('{"page_size": 2}')
        rc, doc = self._run(
            capsys, ["search", "--pql", str(body), "--server", url]
        )
        assert rc == 0 and doc["count"] == 3 and len(doc["results"]) == 2

    def test_search_requires_model_or_pql(self, live_server, capsys):
        url = f"http://127.0.0.1:{live_server['port']}"
        rc, doc = self._run(capsys, ["search", "red bike", "--server", url])
        assert rc == 2 and "error" in doc

    def test_extract_wait(self, client, live_server, capsys):
        url = f"http://127.0.0.1:{live_server['port']}"
        rc, doc = self._run(
            capsys, ["extract", "clip/tiny", "--wait", "--server", url]
        )
        assert rc == 0
        assert doc["result"]["state"] in ("completed", "unknown")
        # The extraction populated the device index: semantic search works.
        stats = client.search.stats()
        assert stats["spaces"].get("clip/tiny", {}).get("rows", 0) >= 3


class TestClientCoversOpenApi:
    def test_every_route_has_a_client_mapping(self, client):
        """Rot guard: every (method, path) the server publishes in
        /openapi.json must be reachable through a named client call. New
        routes must extend panoptikon_tpu.client (or be consciously listed
        as spec-only here)."""
        # path template → {METHOD: "resource.method"} on PanoptikonClient.
        covered = {
            "/api/search/pql": {"POST": "search.pql"},
            "/api/search/pql/build": {"POST": "search.pql_build"},
            "/api/search/stats": {"GET": "search.stats"},
            "/api/search/cache": {"GET": "search.cache_stats",
                                  "PUT": "search.cache_resize",
                                  "DELETE": "search.cache_clear"},
            "/api/search/embeddings/cache":
                {"GET": "search.embedding_cache_stats",
                 "DELETE": "search.embedding_cache_clear"},
            "/api/search/tags/top": {"GET": "search.tags_top"},
            "/api/search/tags": {"GET": "search.tags_autocomplete"},
            "/api/accelerator": {"GET": "accelerator"},
            "/api/items/{sha256}": {"GET": "items.metadata"},
            "/api/items/{sha256}/file": {"GET": "items.file"},
            "/api/items/{sha256}/thumbnail": {"GET": "items.thumbnail"},
            "/api/items/text/any": {"GET": "items.texts_any"},
            "/api/open/{sha256}": {"POST": "items.open"},
            "/api/bookmarks/users": {"GET": "bookmarks.users"},
            "/api/bookmarks/{user}/ns": {"GET": "bookmarks.namespaces"},
            "/api/bookmarks/{user}": {"GET": "bookmarks.list"},
            "/api/bookmarks/{user}/{namespace}":
                {"DELETE": "bookmarks.delete_namespace"},
            "/api/bookmarks/{user}/{namespace}/{sha256}":
                {"PUT": "bookmarks.put", "DELETE": "bookmarks.delete"},
            "/api/pinboards/{user}": {"GET": "pinboards.list",
                                      "POST": "pinboards.create"},
            "/api/pinboards/{user}/{pinboard_id}":
                {"GET": "pinboards.get", "DELETE": "pinboards.delete"},
            "/api/pinboards/{user}/{pinboard_id}/versions":
                {"POST": "pinboards.save_version"},
            "/api/pinboards/{user}/{pinboard_id}/versions/{version_id}":
                {"GET": "pinboards.get_version"},
            "/api/pinboards/{user}/{pinboard_id}/versions/{version_id}/preview":
                {"GET": "pinboards.version_preview",
                 "PUT": "pinboards.put_version_preview"},
            "/api/pinboards/search": {"POST": "pinboards.search"},
            "/api/jobs/queue": {"GET": "jobs.queue"},
            "/api/jobs/queue/{job_id}": {"DELETE": "jobs.cancel"},
            "/api/jobs/data/extraction":
                {"POST": "jobs.enqueue_extraction"},
            "/api/jobs/data": {"DELETE": "jobs.delete_setter_data"},
            "/api/jobs/data/deletion": {"POST": "jobs.data_deletion"},
            "/api/jobs/folders": {"GET": "jobs.get_folders",
                                  "PUT": "jobs.set_folders"},
            "/api/jobs/folders/rescan": {"POST": "jobs.rescan_folders"},
            "/api/jobs/folders/update": {"POST": "jobs.update_folders"},
            "/api/jobs/continuous": {"GET": "jobs.continuous_status"},
            "/api/jobs/history/scans": {"GET": "jobs.history_scans"},
            "/api/jobs/history/data": {"GET": "jobs.history_data"},
            "/api/jobs/failures/extraction":
                {"GET": "jobs.failures_extraction",
                 "DELETE": "jobs.clear_failures_extraction"},
            "/api/jobs/failures/scan": {"GET": "jobs.failures_scan"},
            "/api/jobs/quants": {"GET": "jobs.quants"},
            "/api/jobs/quants/reconcile": {"POST": "jobs.reconcile_quants"},
            "/api/jobs/cron": {"GET": "jobs.get_cron",
                               "PUT": "jobs.set_cron"},
            "/api/jobs/cronjob/run": {"POST": "jobs.run_cron"},
            "/api/jobs/cronjob/schedule": {"GET": "jobs.cron_schedule"},
            "/api/jobs/maintenance": {"POST": "jobs.maintenance"},
            "/api/jobs/data/setters/total": {"GET": "jobs.setters_total"},
            "/api/inference/pool": {"GET": "inference.pool"},
            "/api/config/system": {"GET": "config.get",
                                   "PUT": "config.put"},
            "/api/db": {"GET": "databases.list", "POST": "databases.create"},
            "/api/client-config": {"GET": "client_config"},
            "/api/relay/pairings/{relay_id}":
                {"GET": "relay.pairing", "DELETE": "relay.delete_pairing"},
            "/api/relay/pairing-operations/{relay_id}":
                {"GET": "relay.operation", "POST": "relay.begin"},
            "/api/relay/pairing-operations/{operation_id}/commit":
                {"POST": "relay.commit"},
            "/api/relay/pairing-operations/{operation_id}/cancel":
                {"POST": "relay.cancel"},
            "/api/desktop/update-status": {"GET": "desktop.update_status"},
            "/api/desktop/update-ribbon/snooze":
                {"POST": "desktop.snooze_ribbon"},
            "/api/desktop/update-ribbon/dismiss":
                {"POST": "desktop.dismiss_ribbon"},
            "/api/desktop/external-inputs":
                {"GET": "desktop.external_inputs"},
            "/api/desktop/external-inputs/{variable}":
                {"PUT": "desktop.set_external_input"},
            "/api/desktop/setup-status": {"GET": "desktop.setup_status"},
            "/api/desktop/setup-folders/validate":
                {"POST": "desktop.validate_setup_folders"},
            "/api/desktop/setup-continuous/validate":
                {"POST": "desktop.validate_setup_continuous"},
            "/api/desktop/setup-schedule/preview":
                {"POST": "desktop.preview_setup_schedule"},
            "/api/desktop/setup/complete":
                {"POST": "desktop.complete_setup"},
            "/api/desktop/update-window/open":
                {"POST": "desktop.open_update_window"},
            "/predict/{group}/{inference_id}": {"POST": "inference.predict"},
            "/load/{group}/{inference_id}": {"PUT": "inference.load",
                                             "DELETE": "inference.unload"},
            "/metadata": {"GET": "inference.metadata"},
            # Nested aliases (reference main.rs nest_service) — same calls
            # via an HttpInferenceBackend pointed at base_url +
            # "/api/inference".
            "/api/inference/predict/{group}/{inference_id}":
                {"POST": "inference.predict"},
            "/api/inference/load/{group}/{inference_id}":
                {"PUT": "inference.load", "DELETE": "inference.unload"},
            "/api/inference/metadata": {"GET": "inference.metadata"},
            "/api/inference/cache": {"GET": "inference.cache_list"},
            "/api/inference/cache/{cache_key}":
                {"DELETE": "inference.cache_clear"},
            "/api/inference/health": {"GET": "health"},
            "/cache": {"GET": "inference.cache_list"},
            "/cache/{cache_key}": {"DELETE": "inference.cache_clear"},
            "/health": {"GET": "health"},
            "/openapi.json": {"GET": "openapi"},
        }
        # Browser-facing pages with no programmatic client mapping.
        spec_only = {"/docs", "/redoc", "/ui"}

        spec = client.openapi()
        missing = []
        for path, ops in spec.get("paths", {}).items():
            if path in spec_only:
                continue
            for method in ops:
                m = method.upper()
                if m not in covered.get(path, {}):
                    missing.append(f"{m} {path}")
        assert not missing, f"routes without client mapping: {missing}"

        # Every mapping points at a real attribute on the client.
        for path, ops in covered.items():
            for dotted in ops.values():
                obj = client
                for part in dotted.split("."):
                    obj = getattr(obj, part)
                assert callable(obj), dotted


class TestExamples:
    def test_build_and_search_example_runs(self, live_server, tmp_path,
                                           capsys, monkeypatch):
        """examples/build_and_search.py must execute end-to-end against a
        live server (scan → extract → typed-builder search)."""
        import runpy
        import sys as _sys

        url = f"http://127.0.0.1:{live_server['port']}"
        monkeypatch.setattr(_sys, "argv", [
            "build_and_search.py", str(live_server["media"]),
            "--server", url, "--model", "clip/tiny",
            "--query", "a red image",
        ])
        runpy.run_path("examples/build_and_search.py", run_name="__main__")
        out = capsys.readouterr().out
        assert "scan: completed" in out or "scan: unknown" in out
        assert "extract:" in out and "results" in out

    def test_fusion_example_runs(self, live_server, monkeypatch, capsys):
        import runpy
        import sys as _sys

        url = f"http://127.0.0.1:{live_server['port']}"
        monkeypatch.setattr(_sys, "argv", [
            "fusion_search.py", "--server", url, "--clip", "clip/tiny",
            "--query", "a colorful photo",
        ])
        runpy.run_path("examples/fusion_search.py", run_name="__main__")
        assert "fusion:" in capsys.readouterr().out


class TestAsyncClient:
    def test_async_surface_matches_sync(self, client, live_server, indexed):
        """The async twin drives the same live server: core reads, raw
        file/range, mutations, inference predict, error mapping."""
        import asyncio

        from panoptikon_tpu.aclient import AsyncPanoptikonClient

        url = f"http://127.0.0.1:{live_server['port']}"

        async def run():
            async with AsyncPanoptikonClient(url, timeout=120) as c:
                assert (await c.health())["status"] == "ok"
                page = await c.search.pql({"page_size": 5})
                assert page["count"] == 3
                sha = page["results"][0]["sha256"]
                meta = await c.items.metadata(sha)
                assert meta["type"] == "image/png"
                ranged = await c.items.file(sha, byte_range=(0, 9))
                assert ranged.status == 206 and len(ranged.body) == 10
                await c.bookmarks.put("bob", "favs", sha)
                rows = await c.bookmarks.list("bob")
                assert any(r["sha256"] == sha for r in rows)
                await c.bookmarks.delete("bob", "favs", sha)
                out = await c.inference.predict(
                    "fixtures/echo", [{"x": 1}], files={0: b"zz"})
                assert len(out) == 1
                try:
                    await c.items.metadata("0" * 64)
                    raise AssertionError("expected 404")
                except PanoptikonError as err:
                    assert err.status == 404
                status = await c.jobs.queue()
                assert set(status) == {"running", "pending", "history"}

        asyncio.run(run())

    def test_async_wait_and_folders(self, client, live_server, tmp_path):
        import asyncio

        from panoptikon_tpu.aclient import AsyncPanoptikonClient

        url = f"http://127.0.0.1:{live_server['port']}"
        extra = tmp_path / "async_media"
        extra.mkdir()

        async def run():
            async with AsyncPanoptikonClient(url, timeout=120) as c:
                await c.jobs.set_folders(
                    included=[str(extra)], rescan=False)
                job = await c.jobs.rescan_folders()
                done = await c.jobs.wait(job["job_id"], timeout=120)
                assert done.get("state") in ("completed", "unknown")

        asyncio.run(run())
