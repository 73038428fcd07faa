"""CLI wrappers (cli.py) — the reference's argparse surface
(/root/reference/insert.py:87-98, search.py:58-86) as subcommands. Tests
inject the shared session fixture via run() so no JVM is paid per call."""

import ast

import pytest

from vectordb_cloud_spark.cli import build_parser, run


def _base(tmp_path, extra):
    return ["--root", str(tmp_path / "cat"), "--emb_size", "16", *extra]


def test_insert_then_search_roundtrip(spark, tmp_path):
    out = run(_base(tmp_path, [
        "insert", "--text_id", "1", "--user_id", "7", "--text", "hello vector world",
    ]), spark)
    assert out == "True"
    run(_base(tmp_path, [
        "insert", "--text_id", "2", "--user_id", "8", "--text", "other tenant row",
    ]), spark)
    hits = ast.literal_eval(run(_base(tmp_path, [
        "search", "--user_id", "7", "--text", "hello vector world", "--limit", "5",
    ]), spark))
    # tenant filter: only user 7's row; exact text match -> distance 0
    assert [h["id"] for h in hits] == [1]
    assert hits[0]["string"] == "hello vector world"
    assert hits[0]["score"] == pytest.approx(0.0, abs=1e-6)


def test_remove_by_word_scoped_to_tenant(spark, tmp_path):
    for tid, uid, text in [(1, 7, "spark rocks"), (2, 7, "plain"), (3, 8, "spark too")]:
        run(_base(tmp_path, [
            "insert", "--text_id", str(tid), "--user_id", str(uid), "--text", text,
        ]), spark)
    assert run(_base(tmp_path, ["remove-by-word", "--user_id", "7", "--word", "spark"]), spark) == "1"
    hits7 = ast.literal_eval(run(_base(tmp_path, [
        "search", "--user_id", "7", "--text", "anything", "--limit", "10",
    ]), spark))
    assert [h["id"] for h in hits7] == [2]
    hits8 = ast.literal_eval(run(_base(tmp_path, [
        "search", "--user_id", "8", "--text", "anything", "--limit", "10",
    ]), spark))
    assert [h["id"] for h in hits8] == [3]  # other tenant untouched


def test_classify_subcommand(spark, tmp_path):
    cat = run(_base(tmp_path, [
        "classify", "--user_id", "7", "--cats", "sports\\nmusic", "--title", "sports",
    ]), spark)
    assert cat in ("sports", "music")


def test_parser_matches_reference_flags():
    """The reference's exact flag names parse (insert.py:89-95, search.py:75-83)."""
    p = build_parser()
    a = p.parse_args(["insert", "--text_id", "5", "--user_id", "2", "--text", "t"])
    assert (a.text_id, a.user_id, a.text) == (5, 2, "t")
    assert a.index_name == "EverGrowingVDB"
    a = p.parse_args(["search", "--user_id", "2", "--text", "t", "--limit", "3"])
    assert a.limit == 3
    with pytest.raises(SystemExit):  # required flag missing
        p.parse_args(["insert", "--user_id", "2", "--text", "t"])


def test_shared_flags_accepted_after_subcommand():
    """The reference scripts use one flat parser, so flag order is free —
    --index_name/--emb_size must parse after the subcommand too, without an
    omitted flag clobbering a value given before it."""
    p = build_parser()
    a = p.parse_args(["insert", "--text_id", "1", "--user_id", "2",
                      "--text", "t", "--index_name", "MyIdx", "--emb_size", "128"])
    assert a.index_name == "MyIdx" and a.emb_size == 128
    a = p.parse_args(["--index_name", "Pre", "search", "--user_id", "2",
                      "--text", "t", "--limit", "3"])
    assert a.index_name == "Pre"  # pre-subcommand value survives
    a = p.parse_args(["--index_name", "Pre", "search", "--user_id", "2",
                      "--text", "t", "--limit", "3", "--index_name", "Post"])
    assert a.index_name == "Post"  # post-subcommand wins when both given


def test_collection_info_and_index_subcommands(spark, tmp_path):
    import json

    run(_base(tmp_path, [
        "insert", "--text_id", "1", "--user_id", "7", "--text", "hello",
        "--site", "s1",
    ]), spark)
    info = json.loads(run(_base(tmp_path, ["collection-info"]), spark))
    assert info["points_count"] == 1 and info["payload_schema"] == {}
    out = json.loads(run(_base(tmp_path, [
        "create-index", "--field", "site", "--schema", "keyword"]), spark))
    assert out["payload_indexes"] == {"site": "keyword"}
    info = json.loads(run(_base(tmp_path, ["collection-info"]), spark))
    assert info["payload_schema"]["site"]["data_type"] == "keyword"
    out = json.loads(run(_base(tmp_path, [
        "delete-index", "--field", "site"]), spark))
    assert out["payload_indexes"] == {}
