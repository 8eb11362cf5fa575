"""Reverse proxy for UI / external upstreams.

The reference fronts its Next.js UI and remote inference servers with a
hyper-based reverse proxy (src/proxy.rs): any path not claimed by the API
forwards to the configured upstream, with hop-by-hop headers stripped and
a loop guard. WebSocket bridging is deferred (the API itself has no WS
surface); everything the web UI needs — documents, assets, XHR — proxies.
"""

from __future__ import annotations

from aiohttp import ClientSession, ClientTimeout, web

HOP_HEADERS = {
    "connection", "keep-alive", "proxy-authenticate", "proxy-authorization",
    "te", "trailers", "transfer-encoding", "upgrade", "host",
    "content-length",
}
LOOP_GUARD_HEADER = "X-Panoptikon-Proxy-Hop"
MAX_HOPS = 3


def make_upstream_handler(upstream: str):
    """A catch-all handler forwarding to ``upstream`` (e.g. the UI server).

    Mount with ``app.router.add_route('*', '/{tail:.*}', handler)`` AFTER
    the API routes so the API always wins.
    """
    upstream = upstream.rstrip("/")

    async def handler(request: web.Request) -> web.StreamResponse:
        hops = int(request.headers.get(LOOP_GUARD_HEADER, "0"))
        if hops >= MAX_HOPS:
            return web.json_response({"error": "proxy loop detected"}, status=508)
        target = f"{upstream}{request.rel_url}"
        headers = {
            k: v for k, v in request.headers.items()
            if k.lower() not in HOP_HEADERS
        }
        headers[LOOP_GUARD_HEADER] = str(hops + 1)
        body = await request.read() if request.can_read_body else None
        timeout = ClientTimeout(total=120)
        async with ClientSession(timeout=timeout, auto_decompress=False) as session:
            try:
                async with session.request(
                    request.method, target, headers=headers, data=body,
                    allow_redirects=False,
                ) as resp:
                    out_headers = {
                        k: v for k, v in resp.headers.items()
                        if k.lower() not in HOP_HEADERS
                    }
                    payload = await resp.read()
                    return web.Response(
                        status=resp.status, headers=out_headers, body=payload
                    )
            except Exception as exc:
                return web.json_response(
                    {"error": f"upstream unavailable: {exc}"}, status=502
                )

    return handler
