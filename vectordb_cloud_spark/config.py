"""Layered env/.env configuration cascade.

Mirrors the reference's config loader (/root/reference/config.py:5-15):
process env first, then a fixed cascade of dotenv files where LATER files
override EARLIER ones (parent-dir files before cwd files, plain before
.local before .development.local). The reference uses python-dotenv; the
same observable semantics are implemented here with a small parser so the
engine has no extra dependency.

Engine-relevant keys (all optional):
- ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` — session shuffle fan-out
- ``SPARK_GRAFT_CPUS`` / ``SPARK_GRAFT_SF_DIR`` — bench knobs
- ``VECTORDB_CATALOG_ROOT`` — default CollectionCatalog root
"""

from __future__ import annotations

import os

# reference cascade order, lowest precedence first (config.py:7-13)
DOTENV_CASCADE = (
    "../.env",
    "../.env.local",
    "../.env.development.local",
    ".env",
    ".env.local",
    ".env.development.local",
)


def dotenv_values(path: str) -> dict[str, str]:
    """Minimal .env parser: KEY=VALUE lines, ``#`` comments, optional
    ``export`` prefix, single/double quote stripping. Missing file -> {}
    (the reference's dotenv_values contract)."""
    out: dict[str, str] = {}
    try:
        with open(path, encoding="utf-8") as f:
            lines = f.readlines()
    except OSError:
        return out
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export "):]
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip()
        if len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
            val = val[1:-1]
        if key:
            out[key] = val
    return out


def create_config(base_dir: str | None = None) -> dict[str, str]:
    """Process env overlaid by the dotenv cascade — later layers win,
    exactly the reference's ``{**os.environ, **dotenv_values(...), ...}``
    merge order."""
    root = base_dir or os.getcwd()
    config: dict[str, str] = {**os.environ}
    for rel in DOTENV_CASCADE:
        config.update(dotenv_values(os.path.join(root, rel)))
    return config
