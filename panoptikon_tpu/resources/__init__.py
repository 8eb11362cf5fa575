"""Resources embedded in the package (default configs, built-in model
registry) — the reference bundles its equivalents in the binary
(resources.rs)."""

from __future__ import annotations

from pathlib import Path


def config_dir() -> Path:
    """The packaged default-config tree (…/resources/config)."""
    from importlib import resources

    return Path(str(resources.files("panoptikon_tpu.resources"))) / "config"
