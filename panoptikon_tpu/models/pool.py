"""Inference endpoint pool: smooth weighted round-robin with failover.

The federation tier (reference jobs/inference_pool.rs:10-66): several
inference upstreams (local in-process manager and/or remote HTTP servers)
share load by smooth weighted round-robin; a failing upstream is skipped
and the next candidate tried; ``load_model_all``/``unload_model_all`` fan
out to every upstream. This is the instance-level distribution mechanism —
multi-chip scaling inside one host rides the mesh, not this pool.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Optional, Protocol, Sequence

from panoptikon_tpu.models.base import PredictionInput


class InferenceBackend(Protocol):
    def predict(self, inference_id: str, inputs: Sequence[PredictionInput], **kw) -> list[Any]: ...

    def load_model(self, inference_id: str, **kw) -> None: ...

    def unload_model(self, inference_id: str, cache_key: Optional[str] = None) -> bool: ...


@dataclass
class _Upstream:
    backend: InferenceBackend
    weight: int = 1
    name: str = "local"
    current: int = 0  # smooth WRR state
    healthy: bool = True


class InferencePool:
    def __init__(self) -> None:
        self._upstreams: list[_Upstream] = []
        self._lock = threading.Lock()

    def add(self, backend: InferenceBackend, weight: int = 1, name: str = "local") -> None:
        with self._lock:
            self._upstreams.append(
                _Upstream(backend=backend, weight=max(1, weight), name=name)
            )

    def _pick(self) -> list[_Upstream]:
        """Smooth WRR order: pick the highest current, subtract total —
        yields the classic nginx-style interleave; the full candidate list
        supports failover."""
        with self._lock:
            candidates = [u for u in self._upstreams if u.healthy] or list(self._upstreams)
            if not candidates:
                raise RuntimeError("no inference upstreams configured")
            total = sum(u.weight for u in candidates)
            for u in candidates:
                u.current += u.weight
            best = max(candidates, key=lambda u: u.current)
            best.current -= total
            rest = [u for u in candidates if u is not best]
            return [best, *rest]

    def predict(
        self, inference_id: str, inputs: Sequence[PredictionInput], **kw
    ) -> list[Any]:
        errors = []
        for upstream in self._pick():
            try:
                out = upstream.backend.predict(inference_id, inputs, **kw)
                upstream.healthy = True
                return out
            except Exception as exc:
                upstream.healthy = False
                errors.append(f"{upstream.name}: {exc}")
        raise RuntimeError("all inference upstreams failed: " + "; ".join(errors))

    def load_model_all(self, inference_id: str, **kw) -> None:
        for upstream in list(self._upstreams):
            try:
                upstream.backend.load_model(inference_id, **kw)
                upstream.healthy = True
            except Exception:
                upstream.healthy = False

    def unload_model_all(self, inference_id: str) -> None:
        for upstream in list(self._upstreams):
            try:
                upstream.backend.unload_model(inference_id)
            except Exception:
                pass

    @property
    def registry(self):
        """The first upstream's model registry, when one is local — lets
        preprocess resolve registry metadata (distance_func overrides)
        through the pool exactly as through a bare manager."""
        for u in self._upstreams:
            r = getattr(u.backend, "registry", None)
            if r is not None:
                return r
        return None

    def stats(self) -> list[dict]:
        with self._lock:
            return [
                {"name": u.name, "weight": u.weight, "healthy": u.healthy}
                for u in self._upstreams
            ]
