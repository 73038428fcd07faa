"""CLI wrappers mirroring the reference's argparse entry points.

The reference ships two standalone scripts — insert
(/root/reference/insert.py:87-98: --text_id --user_id --text
[--index_name --emb_size]) and search (/root/reference/search.py:58-86:
--user_id --text --limit [--index_name --emb_size]) — plus service-only
delete endpoints. This module exposes the same surface as subcommands of
``python -m vectordb_cloud_spark``:

    python -m vectordb_cloud_spark insert --text_id 1 --user_id 7 --text "..."
    python -m vectordb_cloud_spark search --user_id 7 --text "..." --limit 5
    python -m vectordb_cloud_spark remove-by-user  --user_id 7
    python -m vectordb_cloud_spark remove-by-word  --user_id 7 --word spark
    python -m vectordb_cloud_spark remove-by-regex --user_id 7 --regex "^a"
    python -m vectordb_cloud_spark classify --user_id 7 --cats "a\\nb" --title t

Output parity: ``insert`` prints the True/False insertion status
(insert.py:98), ``search`` prints the list of {id, string, score} dicts
(search.py:72,86). The collection root comes from --root or the
``VECTORDB_CATALOG_ROOT`` config key (config.py cascade). ``run()`` takes an
injected SparkSession so tests don't pay a JVM per invocation; ``main()``
builds one.
"""

from __future__ import annotations

import argparse
import os
from typing import Sequence

from vectordb_cloud_spark.config import create_config

DEFAULT_INDEX = "EverGrowingVDB"  # /root/reference/insert.py:94
DEFAULT_DIM = 64  # engine default (mock embedder); reference default is 384


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m vectordb_cloud_spark",
        description="Handles insert and search",  # reference wording
    )
    # shared flags are accepted BOTH before and after the subcommand — the
    # reference scripts use one flat parser, so `insert ... --index_name X`
    # must work. The root parser carries the real defaults; the per-sub
    # copies default to SUPPRESS so an omitted flag never clobbers a value
    # given before the subcommand.
    p.add_argument("--root", type=str, default=None,
                   help="collection catalog root (default: $VECTORDB_CATALOG_ROOT)")
    p.add_argument("--index_name", type=str, default=DEFAULT_INDEX,
                   help="Name of Vector DB collection/index")
    p.add_argument("--emb_size", type=int, default=DEFAULT_DIM,
                   help="Vector dimensionality")
    shared = argparse.ArgumentParser(add_help=False)
    shared.add_argument("--root", type=str, default=argparse.SUPPRESS)
    shared.add_argument("--index_name", type=str, default=argparse.SUPPRESS)
    shared.add_argument("--emb_size", type=int, default=argparse.SUPPRESS)
    sub = p.add_subparsers(dest="cmd", required=True)

    ins = sub.add_parser("insert", parents=[shared],
                         help="insert one text (insert.py contract)")
    ins.add_argument("--text_id", type=int, required=True,
                     help="ID associated with the text.")
    ins.add_argument("--user_id", type=int, required=True,
                     help="User ID that will be used for filtering")
    ins.add_argument("--text", type=str, required=True,
                     help="Text string to insert into VDB")
    ins.add_argument("--site", type=str, default="")
    ins.add_argument("--lang", type=str, default="")

    srch = sub.add_parser("search", parents=[shared],
                          help="tenant-filtered kNN (search.py contract)")
    srch.add_argument("--user_id", type=int, required=True)
    srch.add_argument("--text", type=str, required=True)
    srch.add_argument("--limit", type=int, required=True, help="Number of results")
    srch.add_argument("--site", type=str, default=None)
    srch.add_argument("--lang", type=str, default=None)

    rbu = sub.add_parser("remove-by-user", parents=[shared],
                         help="/remove_by_user endpoint")
    rbu.add_argument("--user_id", type=int, required=True)

    rbw = sub.add_parser("remove-by-word", parents=[shared],
                         help="/remove_all_by_word endpoint")
    rbw.add_argument("--user_id", type=int, required=True)
    rbw.add_argument("--word", type=str, required=True)

    rbr = sub.add_parser("remove-by-regex", parents=[shared],
                         help="/remove_all_by_regex endpoint")
    rbr.add_argument("--user_id", type=int, required=True)
    rbr.add_argument("--regex", type=str, required=True)

    cls = sub.add_parser("classify", parents=[shared],
                         help="/get_category_for_title endpoint")
    cls.add_argument("--user_id", type=int, required=True)
    cls.add_argument("--cats", type=str, required=True,
                     help="candidate categories, literal-\\n separated (reference quirk)")
    cls.add_argument("--title", type=str, required=True)

    srv = sub.add_parser("serve", parents=[shared],
                         help="run the HTTP service (/root/reference/app.py:173-178)")
    srv.add_argument("--host", type=str, default="0.0.0.0")
    srv.add_argument("--port", type=int, default=8000)

    sub.add_parser("collection-info", parents=[shared],
                   help="Qdrant GET /collections/{name}")

    cix = sub.add_parser("create-index", parents=[shared],
                         help="Qdrant PUT /collections/{name}/index")
    cix.add_argument("--field", type=str, required=True)
    cix.add_argument("--schema", type=str, default="keyword")

    dix = sub.add_parser("delete-index", parents=[shared],
                         help="Qdrant DELETE /collections/{name}/index/{field}")
    dix.add_argument("--field", type=str, required=True)

    return p


def run(argv: Sequence[str], spark) -> str:
    """Parse argv, execute against an injected SparkSession, return the
    printed output line (printing stays in main for parity)."""
    from vectordb_cloud_spark.api import VectorService

    args = build_parser().parse_args(list(argv))
    root = args.root or create_config().get("VECTORDB_CATALOG_ROOT") or os.path.join(
        os.getcwd(), "vectordb_catalog"
    )
    svc = VectorService(spark, root, index_name=args.index_name, dim=args.emb_size)

    if args.cmd == "insert":
        status = svc.insert(args.text_id, args.user_id, args.text, args.site, args.lang)
        return f"{bool(status)}"  # insert.py:98 prints the bool
    if args.cmd == "search":
        hits = svc.search(args.user_id, args.text, args.limit, args.site, args.lang)
        rows = [
            {"id": r["id"], "string": r["string"], "score": r["score"]}
            for r in hits.collect()
        ]
        return repr(rows)  # search.py:86 prints the list of dicts
    if args.cmd == "remove-by-user":
        return str(svc.remove_by_user(args.user_id))
    if args.cmd == "remove-by-word":
        return str(svc.remove_all_by_word(args.user_id, args.word))
    if args.cmd == "remove-by-regex":
        return str(svc.remove_all_by_regex(args.user_id, args.regex))
    if args.cmd == "classify":
        return svc.get_category_for_title(args.user_id, args.cats, args.title)
    if args.cmd == "collection-info":
        import json as _json

        return _json.dumps(svc.info())
    if args.cmd == "create-index":
        import json as _json

        return _json.dumps(svc.create_index(args.field, args.schema))
    if args.cmd == "delete-index":
        import json as _json

        return _json.dumps(svc.delete_index(args.field))
    if args.cmd == "serve":  # pragma: no cover - blocking server loop
        from vectordb_cloud_spark.http_app import serve

        serve(svc, host=args.host, port=args.port)
        return ""
    raise AssertionError(f"unhandled subcommand {args.cmd!r}")  # pragma: no cover


def main(argv: Sequence[str] | None = None) -> None:  # pragma: no cover - JVM
    import sys

    from vectordb_cloud_spark.session import get_spark

    print(run(sys.argv[1:] if argv is None else argv, get_spark("cli")))


if __name__ == "__main__":  # pragma: no cover
    main()
