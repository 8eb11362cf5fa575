"""CLI subcommands (main.rs:77-113 analog) and the OpenAPI/schema surface."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from panoptikon_tpu import cli
from panoptikon_tpu.api.server import AppState, build_app
from panoptikon_tpu.pql import model as pql
from panoptikon_tpu.utils.schema_gen import collect_schemas


class TestCli:
    def test_setup_materializes_and_is_idempotent(self, tmp_path, capsys):
        rc = cli.main(["setup", "--root", str(tmp_path)])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert any(p.endswith("default.toml") for p in out["materialized"])
        assert (tmp_path / "config" / "server" / "default.toml").exists()
        assert (tmp_path / ".env").exists()
        # Second run never clobbers.
        marker = tmp_path / "config" / "server" / "default.toml"
        marker.write_text("# user edit")
        rc = cli.main(["setup", "--root", str(tmp_path)])
        out = json.loads(capsys.readouterr().out)
        assert out["materialized"] == []
        assert marker.read_text() == "# user edit"

    def test_version(self, capsys):
        assert cli.main(["version"]) == 0
        import panoptikon_tpu

        assert capsys.readouterr().out.strip() == panoptikon_tpu.__version__

    def test_accelerator_report(self, capsys):
        assert cli.main(["accelerator"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["device_count"] >= 1
        assert out["devices"][0]["platform"]


class TestSchemaGen:
    def test_pql_query_schema(self):
        schemas = collect_schemas([pql.PqlQuery])
        assert "PqlQuery" in schemas
        props = schemas["PqlQuery"]["properties"]
        assert "page_size" in props and "order_by" in props
        # Private fields never leak.
        for name, schema in schemas.items():
            for p in schema.get("properties", {}):
                assert not p.startswith("_"), (name, p)

    def test_nested_refs_resolved(self):
        schemas = collect_schemas([pql.SemanticImageSearch])
        assert "SemanticImageArgs" in schemas
        ref = schemas["SemanticImageSearch"]["properties"]["image_embeddings"]
        assert "$ref" in json.dumps(ref)


class TestOpenApiSurface:
    @pytest.fixture
    def client(self, tmp_path):
        state = AppState.create(tmp_path / "data")
        app = build_app(state)
        loop = asyncio.new_event_loop()
        client = TestClient(TestServer(app), loop=loop)
        loop.run_until_complete(client.start_server())

        def call(method, path):
            async def do():
                resp = await client.request(method, path)
                if resp.content_type == "application/json":
                    return resp.status, await resp.json()
                return resp.status, await resp.text()

            return loop.run_until_complete(do())

        yield call
        loop.run_until_complete(client.close())
        state.shutdown()
        loop.close()

    def test_openapi_has_schemas_and_request_body(self, client):
        status, doc = client("GET", "/openapi.json")
        assert status == 200
        assert "PqlQuery" in doc["components"]["schemas"]
        body = doc["paths"]["/api/search/pql"]["post"]["requestBody"]
        assert body["content"]["application/json"]["schema"]["$ref"].endswith(
            "PqlQuery"
        )

    def test_docs_page_served(self, client):
        status, html = client("GET", "/docs")
        assert status == 200
        assert "openapi.json" in html and "<html" in html


class TestTraceMiddleware:
    def test_response_time_header(self, tmp_path):
        state = AppState.create(tmp_path / "data")
        app = build_app(state)
        loop = asyncio.new_event_loop()
        client = TestClient(TestServer(app), loop=loop)
        loop.run_until_complete(client.start_server())

        async def do():
            resp = await client.get("/health")
            return resp

        resp = loop.run_until_complete(do())
        assert resp.status == 200
        assert resp.headers["X-Response-Time"].endswith("ms")
        loop.run_until_complete(client.close())
        state.shutdown()
        loop.close()


class TestEmbeddedResources:
    def test_registry_defaults_to_packaged_builtin(self):
        from panoptikon_tpu.models.registry import Registry, packaged_builtin_dir

        assert packaged_builtin_dir() is not None
        reg = Registry(None)
        reg.load()
        meta = reg.metadata()
        # The bundled catalog must expose the core groups.
        assert "clip" in meta and "tags" in meta

    def test_setup_materializes_from_package(self, tmp_path):
        from panoptikon_tpu import cli

        rc = cli.main(["setup", "--root", str(tmp_path)])
        assert rc == 0
        assert (tmp_path / "config" / "server" / "default.toml").exists()
        assert (tmp_path / "config" / "inference" / "00_builtin.toml").exists()


class TestSelfUpdate:
    def test_reports_newer_version_from_manifest(self, tmp_path, capsys):
        import json

        from panoptikon_tpu import cli

        manifest = tmp_path / "release.json"
        manifest.write_text(json.dumps(
            {"name": "panoptikon-tpu", "version": "99.0.0"}))
        rc = cli.main(["self-update", "--manifest", manifest.as_uri()])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["update_available"] is True
        assert out["plan"][-1] == "panoptikon-tpu==99.0.0"
        assert out["applied"] is False  # no --apply: dry-run only

    def test_up_to_date_is_a_no_op(self, tmp_path, capsys):
        import json

        import panoptikon_tpu
        from panoptikon_tpu import cli

        manifest = tmp_path / "release.json"
        manifest.write_text(json.dumps(
            {"version": panoptikon_tpu.__version__}))
        rc = cli.main(["self-update", "--manifest", manifest.as_uri()])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["update_available"] is False and out["plan"] is None

    def test_no_manifest_is_an_error(self, capsys):
        from panoptikon_tpu import cli

        rc = cli.main(["self-update"])
        assert rc == 2


class TestAcceleratorEnvMatrix:
    def test_env_matrix_reports_generation(self, capsys):
        import json

        from panoptikon_tpu import cli

        rc = cli.main(["accelerator", "--env"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["generation"] in ("v4", "v5e", "v5p", "v6e")
        assert "JAX_COMPILATION_CACHE_DIR" in out["recommended"]
        assert "JAX_COORDINATOR_ADDRESS" in out["multihost"]


class TestSelfUpdateVersionCompare:
    def test_prerelease_and_padding_semantics(self, tmp_path, capsys):
        import json

        from panoptikon_tpu import cli

        def verdict(latest):
            manifest = tmp_path / "m.json"
            manifest.write_text(json.dumps({"version": latest}))
            rc = cli.main(["self-update", "--manifest", manifest.as_uri()])
            assert rc == 0
            out = json.loads(
                capsys.readouterr().out.strip().splitlines()[-1])
            return out["update_available"]

        import panoptikon_tpu
        cur = panoptikon_tpu.__version__  # 0.1.0
        assert verdict(cur) is False
        assert verdict(cur + ".0") is False       # zero-padding == same
        assert verdict("0.1.1rc1") is True        # pre-release of newer
        assert verdict("0.1.0rc1") is False       # pre-release of SAME

    def test_unreachable_manifest_is_a_json_error(self, capsys):
        from panoptikon_tpu import cli

        rc = cli.main(["self-update", "--manifest",
                       "http://127.0.0.1:9/manifest.json"])
        assert rc == 2
        assert "manifest fetch failed" in capsys.readouterr().out
