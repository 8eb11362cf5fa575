"""Per-DB config file mirror (VERDICT r2 row 13: the lossless TOML editor
had no production caller): programmatic writes land in the system_config
table AND patch <db_dir>/config.toml comment-preservingly; hand edits to
the file win at next boot."""

import numpy as np
import pytest

from panoptikon_tpu.db import config_file, store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter


@pytest.fixture()
def env(tmp_path):
    db = Database(tmp_path, "cfg")
    writer = IndexWriter(db)
    return db, writer


class TestMirror:
    def test_write_key_creates_and_patches(self, env):
        db, writer = env
        config_file.write_key(db, "continuous_scan", {"enabled": True, "interval": 30})
        path = config_file.config_path(db)
        text = path.read_text()
        assert "[continuous_scan]" in text and "enabled = true" in text
        # A hand comment survives the next programmatic write.
        path.write_text(text.replace(
            "enabled = true", "enabled = true  # keep on for the NAS"
        ))
        config_file.write_key(db, "continuous_scan", {"enabled": True, "interval": 60})
        text2 = path.read_text()
        assert "# keep on for the NAS" in text2
        assert "interval = 60" in text2

    def test_hand_edit_wins_at_import(self, env):
        db, writer = env
        writer.call(
            lambda c: store.set_config(c, "continuous_scan", {"enabled": False})
        )
        config_file.config_path(db).write_text(
            "# my config\n[continuous_scan]\nenabled = true\ninterval = 15\n"
        )
        imported = config_file.import_file(db, writer)
        assert imported == ["continuous_scan"]
        got = store.get_config(db.reader(), "continuous_scan", None)
        assert got == {"enabled": True, "interval": 15}

    def test_import_noop_when_equal_or_missing(self, env):
        db, writer = env
        assert config_file.import_file(db, writer) == []
        writer.call(
            lambda c: store.set_config(c, "continuous_scan", {"enabled": True})
        )
        config_file.config_path(db).write_text(
            "[continuous_scan]\nenabled = true\n"
        )
        assert config_file.import_file(db, writer) == []

    def test_malformed_file_is_ignored(self, env):
        db, writer = env
        config_file.config_path(db).write_text("[broken\nnope")
        assert config_file.import_file(db, writer) == []

    def test_unmirrored_key_not_written(self, env):
        db, writer = env
        config_file.write_key(db, "vector_quants", {"profiles": {}})
        assert not config_file.config_path(db).exists()
