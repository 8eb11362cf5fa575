"""Eager prewarm loop.

The reference keeps search-usable embedding models warm via a minute-tick
loop plus cron preload (``inferio/prewarm.rs`` ``run_eager_prewarm_loop``,
``main.rs:330-341``): without it, the first query after a restart pays the
full model load + compile stall. The TPU analog: every tick enumerates each
database's embedding spaces (space name == embedding setter == inference
id), filters to ids the model registry actually knows, and (re)loads each
through the federation pool with ``prewarm=True`` under the ``"search"``
cache key — ``prepare()`` compiles the batch-bucket ladders at load, and
each tick renews the TTL so an idle-but-searchable model never falls out
of cache between queries.

Beyond models, each tick also compiles the SERVING scan programs (solo +
coalesced batch) for every quant-ready space whose generation has been
stable for a full tick — the first query per space geometry otherwise
pays a ~30-60 s jit stall on a tunneled chip (see warm_scan_programs).
"""

from __future__ import annotations

import logging
import threading

log = logging.getLogger(__name__)

DEFAULT_INTERVAL_S = 60.0
# TTL renewed every tick; 3 intervals of slack tolerates a slow tick.
DEFAULT_TTL_S = 3 * DEFAULT_INTERVAL_S


class EagerPrewarm:
    """Minute-tick warmer over the AppState's databases/pool."""

    def __init__(
        self,
        state,
        interval_s: float = DEFAULT_INTERVAL_S,
        ttl_seconds: float = DEFAULT_TTL_S,
    ):
        self.state = state
        self.interval_s = interval_s
        self.ttl_seconds = ttl_seconds
        self._stop: threading.Event | None = None
        self._thread: threading.Thread | None = None
        # (db, space, generation) triples whose serving scan programs have
        # been compiled this process; last generation seen per space for
        # the stability damping.
        self._scan_warmed: set[tuple] = set()
        self._last_gen: dict[tuple, int] = {}
        self._scan_thread: threading.Thread | None = None

    def warm_ids(self) -> list[str]:
        """Search-usable inference ids: embedding spaces present in any
        database's device index AND resolvable in the model registry
        (unknown setters — renamed models, fixture leftovers — are
        skipped, never marked as pool failures)."""
        ids: list[str] = []
        try:
            known = set(self.state.model_registry.all_ids())
        except Exception:
            known = set()
        for name in self.state.databases.names():
            try:
                index = self.state.index(name)
            except Exception:
                continue
            for space in index.space_names():
                if space in known and space not in ids:
                    ids.append(space)
        return ids

    def warm_scan_programs(self) -> list[str]:
        """Compile each quant-ready space's SERVING programs before the
        first real query pays the jit stall (~30-60 s per geometry on a
        tunneled chip): the solo (1, d) candidate scan and the coalesced
        (SCAN_COALESCE_MAX, d) batch, via real executor queries (which
        also warms the base snapshot and the item-slot LUT). One warm per
        (db, space, generation); index writes re-warm on the next tick."""
        import base64

        import numpy as np

        from panoptikon_tpu.pql import model as pql
        from panoptikon_tpu.pql.executor import SCAN_COALESCE_MAX
        from panoptikon_tpu.utils import npy

        warmed = []
        for name in self.state.databases.names():
            try:
                index = self.state.index(name)
                ex = self.state.executor(name)
            except Exception:
                continue
            for space, st in index.stats().items():
                if not st.get("quant_ready") or not st.get("rows"):
                    continue
                key = (name, space, st["generation"])
                if key in self._scan_warmed:
                    continue
                # Damping: warm only generations STABLE across a full tick
                # — during an extraction burst every batch bumps the
                # generation and each warm would re-upload the codes slab.
                prev = self._last_gen.get((name, space))
                self._last_gen[(name, space)] = st["generation"]
                if prev != st["generation"]:
                    continue
                try:
                    vec = np.zeros(st["dim"], np.float32)
                    vec[0] = 1.0
                    q = base64.standard_b64encode(
                        npy.serialize_npy(vec)
                    ).decode()
                    payload = {
                        "query": {"text_embeddings": {
                            "query": q, "model": space,
                            "embed": None, "index": "quant"}},
                        "page_size": 1, "count": False,
                    }

                    errors: list[BaseException] = []

                    def one():
                        try:
                            ex.execute(pql.PqlQuery.from_json(payload))
                        except BaseException as e:  # noqa: BLE001
                            errors.append(e)

                    one()  # solo (1, d) program + base snapshot + LUT
                    if errors:
                        raise errors[0]
                    threads = [
                        threading.Thread(target=one, daemon=True)
                        for _ in range(SCAN_COALESCE_MAX)
                    ]
                    for t in threads:
                        t.start()
                    for t in threads:
                        t.join()  # coalesced (B, d) program
                    if errors:
                        # Worker-thread failures must not be swallowed: the
                        # coalesced program was NOT compiled — leave the key
                        # unwarmed so the next tick retries, and surface why.
                        raise errors[0]
                    self._scan_warmed.add(key)
                    warmed.append(f"{name}:{space}")
                except Exception as exc:  # keep the loop alive
                    log.warning("scan prewarm of %s failed: %s", space, exc)
        return warmed

    def tick(self) -> list[str]:
        warmed = []
        # The scan warm dispatches device ops, which block FOREVER if the
        # accelerator transport is down (dead tunnel relay — see
        # docs/operations.md "hung accelerator runbook"). Run it on a
        # bounded-join daemon thread so a wedged transport cannot freeze
        # model warming, and never stack a second warm while one is stuck
        # (stacking processes/ops against a wedged claim makes it worse).
        if self._scan_thread is None or not self._scan_thread.is_alive():
            out: list[str] = []

            def run_warm():
                try:
                    out.extend(self.warm_scan_programs())
                except Exception:
                    log.exception("scan-program prewarm failed")

            t = threading.Thread(
                target=run_warm, name="scan-prewarm", daemon=True
            )
            self._scan_thread = t
            t.start()
            t.join(min(self.interval_s, 60.0))
            if t.is_alive():
                log.warning(
                    "scan prewarm still running after %.0fs — slow compile "
                    "or wedged device transport; not stacking another warm",
                    min(self.interval_s, 60.0),
                )
            else:
                warmed.extend(out)
        else:
            log.warning(
                "previous scan prewarm still running; skipping this tick"
            )
        ids = self.warm_ids()
        for inference_id in ids:
            try:
                # Own cache key, wide LRU: the query path's "search" key
                # runs lru_size=1 (EmbedArgs default) and would evict the
                # other warmed models; the shared-refs discipline keeps a
                # model loaded while EITHER key references it.
                self.state.pool.load_model_all(
                    inference_id,
                    prewarm=True,
                    cache_key="prewarm",
                    lru_size=max(len(ids), 1),
                    ttl_seconds=self.ttl_seconds,
                )
                warmed.append(inference_id)
            except Exception as exc:  # keep the loop alive
                log.warning("prewarm of %s failed: %s", inference_id, exc)
        return warmed

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop = threading.Event()

        stop = self._stop

        def run():
            # Warm immediately at startup, then on the tick. The loop
            # holds its OWN reference to the stop event: stop() may null
            # the attribute while a slow tick (bounded scan-warm join) is
            # still in flight.
            while True:
                try:
                    self.tick()
                except Exception:
                    log.exception("prewarm tick failed")
                if stop.wait(self.interval_s):
                    return

        self._thread = threading.Thread(
            target=run, name="eager-prewarm", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
        if self._thread is not None:
            # tick() can legitimately block up to min(interval, 60)s in
            # the scan-warm join — don't stall shutdown for it (the loop
            # holds its own stop-event reference and exits after the
            # in-flight tick). Forget the thread only once it really died,
            # so a quick stop()/start() can't stack a second loop.
            self._thread.join(timeout=2)
            if not self._thread.is_alive():
                self._thread = None
                self._stop = None
