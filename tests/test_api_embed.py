"""API-backed embedding impl (reference impl/jina_clip.py family): wire
format against a local stub server, blocked semantics without an endpoint."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from panoptikon_tpu.models.base import PredictionInput, is_error_slot, parse_error_slot
from panoptikon_tpu.models.impls import ApiEmbedImpl
from panoptikon_tpu.utils import npy


@pytest.fixture
def stub_server():
    """A deterministic /embeddings endpoint: vector = f(len(text))."""
    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["content-length"])))
            seen["body"] = body
            seen["auth"] = self.headers.get("authorization")
            data = []
            for item in body["input"]:
                seedlen = len(item.get("text") or item.get("image") or "")
                vec = (np.arange(8, dtype=np.float64) + seedlen).tolist()
                data.append({"embedding": vec})
            out = json.dumps({"data": data}).encode()
            self.send_response(200)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}/embeddings", seen
    server.shutdown()


class TestApiEmbed:
    def test_round_trip_normalized(self, stub_server, monkeypatch):
        url, seen = stub_server
        monkeypatch.setenv("EMBED_API_KEY", "sk-test")
        impl = ApiEmbedImpl(endpoint=url, model="jina-clip-v1")
        out = impl.predict([
            PredictionInput(data={"text": "hello"}),
            PredictionInput(file=b"\x89PNGfake"),
        ])
        v0 = npy.parse_npy(out[0])
        assert v0.shape == (8,)
        np.testing.assert_allclose(np.linalg.norm(v0), 1.0, atol=1e-5)
        assert seen["body"]["model"] == "jina-clip-v1"
        assert seen["body"]["input"][0] == {"text": "hello"}
        assert "image" in seen["body"]["input"][1]
        assert seen["auth"] == "Bearer sk-test"

    def test_no_endpoint_is_blocked_transient(self):
        impl = ApiEmbedImpl()
        out = impl.predict([PredictionInput(data={"text": "x"})])
        assert is_error_slot(out[0])
        cls, msg = parse_error_slot(out[0])
        assert cls == "transient" and "embed-api" in msg

    def test_unreachable_endpoint_is_transient(self):
        impl = ApiEmbedImpl(endpoint="http://127.0.0.1:9/embeddings", timeout=2)
        out = impl.predict([PredictionInput(data={"text": "x"})])
        cls, _ = parse_error_slot(out[0])
        assert cls == "transient"


@pytest.fixture
def tag_stub_server():
    """A deterministic tag-lookup endpoint: tags keyed by request md5."""
    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["content-length"])))
            seen["body"] = body
            results = {}
            for i, h in enumerate(body.get("md5", [])):
                if i == 0:
                    results[h] = {"tags": {"1girl": 0.9, "outdoors": None}}
                # later hashes: no match → omitted
            out = json.dumps({"results": results}).encode()
            self.send_response(200)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}/tags", seen
    server.shutdown()


class TestTagApi:
    def test_lookup_hit_miss_and_shapes(self, tag_stub_server):
        import hashlib

        from panoptikon_tpu.models.impls import TagApiImpl

        url, seen = tag_stub_server
        impl = TagApiImpl(endpoint=url, namespace="remote",
                          default_confidence=0.5)
        blob = b"imagebytes"
        out = impl.predict([
            PredictionInput(file=blob),                       # hit
            PredictionInput(data={"md5": "deadbeef" * 4}),    # miss
            PredictionInput(),                                # no hash
        ])
        hit, miss, bad = out
        assert seen["body"]["md5"][0] == hashlib.md5(blob).hexdigest()
        general = dict(hit["tags"])["general"]
        assert general == {"1girl": 0.9, "outdoors": 0.5}
        assert hit["metadata"]["matched"] is True
        assert dict(miss["tags"])["general"] == {}
        assert miss["metadata"]["matched"] is False
        assert is_error_slot(bad)
        assert parse_error_slot(bad)[0] == "input"

    def test_blocked_without_endpoint(self):
        from panoptikon_tpu.models.impls import TagApiImpl

        impl = TagApiImpl()
        out = impl.predict([PredictionInput(file=b"x")])
        cls, msg = parse_error_slot(out[0])
        assert cls == "transient" and "blocker=tag-api" in msg
        assert TagApiImpl.available({"endpoint": "http://x"}) is True
        assert TagApiImpl.available({}) is False

    def test_transport_failure_is_transient(self):
        from panoptikon_tpu.models.impls import TagApiImpl

        impl = TagApiImpl(endpoint="http://127.0.0.1:9/nope", timeout=0.5)
        out = impl.predict([PredictionInput(file=b"x")])
        assert parse_error_slot(out[0])[0] == "transient"
