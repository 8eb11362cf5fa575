"""panoptikon_tpu — a TPU-native multimodal media search framework.

A ground-up rebuild of the capabilities of reasv/panoptikon (a local
multimodal media search engine) designed for TPU hardware: batched JAX
inference with static shapes, a device-sharded int8-quantized vector index
queried by a Pallas int8-GEMM + fused-top-k kernel, and PQL multi-model rank
fusion executed as a fused on-device scoring pass.

Layer map (mirrors SURVEY.md §1 of the reference analysis):

- ``ops``      — device compute: codecs, exact scorer, Pallas kernels, fusion.
- ``index``    — the device-resident sharded vector index + reconcile logic.
- ``pql``      — the PQL query language: AST model, preprocessing, executor.
- ``db``       — host-side SQLite storage (items, files, text, tags, ledgers).
- ``models``   — JAX model implementations (CLIP, text embedding, taggers)
                 plus the registry/manager lifecycle.
- ``jobs``     — scanning, extraction pipelines, reconcile, cron.
- ``api``      — HTTP serving surface + result caches.
- ``parallel`` — mesh construction and sharding helpers.
- ``utils``    — npy codec, splitmix64 mixer, misc host utilities.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy convenience exports: `from panoptikon_tpu import
    # PanoptikonClient` must not drag the JAX engine into an ingest
    # script (client and builder are stdlib-only).
    if name in ("PanoptikonClient", "PanoptikonError"):
        from panoptikon_tpu import client

        return getattr(client, name)
    if name == "AsyncPanoptikonClient":
        from panoptikon_tpu.aclient import AsyncPanoptikonClient

        return AsyncPanoptikonClient
    if name == "Q":
        from panoptikon_tpu.pql import build

        return build
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
