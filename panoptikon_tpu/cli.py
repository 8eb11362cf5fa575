"""CLI entry: subcommands mirroring the reference binary (main.rs:77-113).

``panoptikon-tpu [serve]``      — run the server (default subcommand).
``panoptikon-tpu setup``        — first-run materialization: write the
                                  default config templates into --root
                                  (reference resources.rs
                                  materialize_first_run; idempotent, never
                                  overwrites user edits).
``panoptikon-tpu accelerator``  — print the device report as JSON
                                  (reference accelerator_report.rs).
``panoptikon-tpu version``      — print the package version.

``panoptikon-tpu self-update``  — check a release manifest for a newer
                                  version and (with --apply) upgrade the
                                  package via pip (reference main.rs
                                  ``update`` → GitHub releases; the
                                  Python-deploy analog is a pip upgrade
                                  from a configured index/manifest).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

def _bundled_config() -> Path:
    """Default config templates embedded in the package
    (panoptikon_tpu/resources/config — reference resources.rs bundles
    its first-run defaults in the binary)."""
    from panoptikon_tpu import resources as _res

    return _res.config_dir()


BUNDLED_CONFIG = _bundled_config()


def cmd_setup(args) -> int:
    root = Path(args.root)
    wrote = []
    for sub in ("server", "inference"):
        src_dir = BUNDLED_CONFIG / sub
        dst_dir = root / "config" / sub
        dst_dir.mkdir(parents=True, exist_ok=True)
        if src_dir.is_dir():
            for src in sorted(src_dir.glob("*.toml")):
                dst = dst_dir / src.name
                if dst.exists():
                    continue  # never clobber user edits
                shutil.copyfile(src, dst)
                wrote.append(str(dst))
    (root / "data").mkdir(parents=True, exist_ok=True)
    env = root / ".env"
    if not env.exists():
        env.write_text("# panoptikon_tpu environment overrides\n")
        wrote.append(str(env))
    print(json.dumps({"root": str(root), "materialized": wrote}))
    return 0


TPU_ENV_MATRIX = {
    # Per-generation recommended environment (the reference's
    # accelerator_env.rs injects ROCm/CUDA env per accelerator; the
    # TPU-native matrix covers the knobs this framework actually consumes
    # plus the standard JAX runtime ones).
    "common": {
        "JAX_COMPILATION_CACHE_DIR": "~/.cache/jax_compilation",
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1",
    },
    "multihost": {
        # Consumed by parallel.multihost.initialize() (also set
        # automatically by TPU pod runtimes).
        "JAX_COORDINATOR_ADDRESS": "<host0>:8476",
        "JAX_NUM_PROCESSES": "<n_hosts>",
        "JAX_PROCESS_ID": "<0..n_hosts-1>",
    },
    "v4": {"notes": "megacore: 2 TensorCores per chip present as 1 device"},
    "v5e": {"notes": "serving-optimized; bf16 197/int8 394 TFLOP/s nominal"},
    "v5p": {"notes": "training-optimized; higher HBM BW than v5e"},
    "v6e": {"notes": "serving-optimized successor to v5e"},
}


def cmd_accelerator(args) -> int:
    import jax

    if getattr(args, "env", False):
        kind = ""
        try:
            kind = jax.devices()[0].device_kind.lower()
        except Exception:
            pass
        # Real device_kind strings: "TPU v4", "TPU v5 lite", "TPU v5p",
        # "TPU v6 lite" (generation names v5e/v6e never appear verbatim).
        flat = kind.replace(" ", "")
        if "v6" in flat:
            gen = "v6e"
        elif "v5p" in flat:
            gen = "v5p"
        elif "v5" in flat:
            gen = "v5e"  # "v5 lite" == v5e
        elif "v4" in flat:
            gen = "v4"
        else:
            gen = "v5e"
        print(json.dumps({
            "generation": gen,
            "recommended": {**TPU_ENV_MATRIX["common"],
                            **{k: v for k, v in TPU_ENV_MATRIX[gen].items()
                               if k != "notes"}},
            "multihost": TPU_ENV_MATRIX["multihost"],
            "notes": TPU_ENV_MATRIX[gen].get("notes", ""),
        }))
        return 0

    devices = [
        {
            "id": d.id,
            "kind": d.device_kind,
            "platform": d.platform,
            "process": d.process_index,
        }
        for d in jax.devices()
    ]
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "device_count": len(devices),
                "devices": devices,
            }
        )
    )
    return 0


def cmd_self_update(args) -> int:
    """Version check + optional pip upgrade.

    The manifest is a JSON document {"name": ..., "version": "X.Y.Z",
    "requirement": "panoptikon-tpu==X.Y.Z"} at --manifest (any URL
    urllib can open, file:// included — this deploy model has no
    assumption of GitHub egress). Without --apply it only reports; with
    --apply it runs ``pip install --upgrade <requirement>`` in this
    interpreter's environment.
    """
    import json as _json

    import panoptikon_tpu

    if not args.manifest:
        print(_json.dumps({
            "error": "no release manifest configured (--manifest URL)",
            "current": panoptikon_tpu.__version__,
        }))
        return 2
    from panoptikon_tpu.utils.version import fetch_manifest, newer_than

    try:
        manifest = fetch_manifest(args.manifest)
    except Exception as exc:
        print(_json.dumps({
            "error": f"manifest fetch failed: {exc}",
            "current": panoptikon_tpu.__version__,
        }))
        return 2
    latest = str(manifest.get("version", ""))
    current = panoptikon_tpu.__version__
    newer = bool(latest) and newer_than(latest, current)
    plan = manifest.get("requirement") or f"panoptikon-tpu=={latest}"
    out = {"current": current, "latest": latest, "update_available": newer,
           "plan": ["pip", "install", "--upgrade", plan] if newer else None,
           "applied": False}
    if newer and args.apply:
        import subprocess

        rc = subprocess.call(
            [sys.executable, "-m", "pip", "install", "--upgrade", plan]
        )
        out["applied"] = rc == 0
        print(_json.dumps(out))
        return rc
    print(_json.dumps(out))
    return 0


def cmd_version(args) -> int:
    import panoptikon_tpu

    print(panoptikon_tpu.__version__)
    return 0


def cmd_serve(args) -> int:
    from panoptikon_tpu.api import server

    server.main(args)
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="panoptikon-tpu")
    sub = parser.add_subparsers(dest="command")

    serve = sub.add_parser("serve", help="run the server (default)")
    for p in (parser, serve):
        p.add_argument("--config", default=None, help="server TOML path")
        p.add_argument("--port", type=int, default=None)
        p.add_argument("--host", default=None)
        p.add_argument("--data-root", default=None)
        p.add_argument("--registry-dir", default=None)
        p.add_argument("--root", default=".", help="working root (chdir)")

    setup = sub.add_parser("setup", help="materialize default configs")
    setup.add_argument("--root", default=".", help="target root directory")

    acc = sub.add_parser("accelerator", help="print the device report")
    acc.add_argument("--env", action="store_true",
                     help="print the recommended env matrix for this generation")
    sub.add_parser("version", help="print the version")
    upd = sub.add_parser("self-update", help="check/apply a package update")
    upd.add_argument("--manifest", default=None,
                     help="release manifest URL (json: {version, requirement})")
    upd.add_argument("--apply", action="store_true",
                     help="run the pip upgrade when newer")
    return parser


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    cmd = args.command or "serve"
    if cmd == "setup":
        return cmd_setup(args)
    if cmd == "accelerator":
        return cmd_accelerator(args)
    if cmd == "version":
        return cmd_version(args)
    if cmd == "self-update":
        return cmd_self_update(args)
    return cmd_serve(args)


if __name__ == "__main__":
    sys.exit(main())
