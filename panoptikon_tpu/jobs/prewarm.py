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

    def tick(self) -> list[str]:
        warmed = []
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

        def run():
            # Warm immediately at startup, then on the tick.
            while True:
                try:
                    self.tick()
                except Exception:
                    log.exception("prewarm tick failed")
                if self._stop.wait(self.interval_s):
                    return

        self._thread = threading.Thread(
            target=run, name="eager-prewarm", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
            self._thread = None
            self._stop = None
