"""Config cascade parity with the reference loader
(/root/reference/config.py:5-15): later dotenv layers override earlier ones
and all layers override the process environment."""

import os

from vectordb_cloud_spark.config import create_config, dotenv_values


def test_dotenv_parser(tmp_path):
    p = tmp_path / ".env"
    p.write_text(
        "# comment\n"
        "PLAIN=value\n"
        "export EXPORTED=yes\n"
        'QUOTED="with spaces"\n'
        "SINGLE='sq'\n"
        "EMPTY=\n"
        "broken-line-no-eq\n"
    )
    got = dotenv_values(str(p))
    assert got == {
        "PLAIN": "value",
        "EXPORTED": "yes",
        "QUOTED": "with spaces",
        "SINGLE": "sq",
        "EMPTY": "",
    }


def test_missing_file_is_empty(tmp_path):
    assert dotenv_values(str(tmp_path / "nope.env")) == {}


def test_cascade_precedence(tmp_path, monkeypatch):
    app = tmp_path / "app"
    app.mkdir()
    (tmp_path / ".env").write_text("A=parent\nB=parent\nC=parent\n")
    (app / ".env").write_text("B=cwd\nC=cwd\n")
    (app / ".env.local").write_text("C=cwd-local\n")
    monkeypatch.setenv("A", "process")
    monkeypatch.setenv("D", "process")
    cfg = create_config(base_dir=str(app))
    # every dotenv layer overrides process env; later files override earlier
    assert cfg["A"] == "parent"
    assert cfg["B"] == "cwd"
    assert cfg["C"] == "cwd-local"
    assert cfg["D"] == "process"
