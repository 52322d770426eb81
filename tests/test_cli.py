"""CLI surface: synth → build → query → extend → stats, in-process
(get_spark getOrCreate reuses the test session, so each subcommand is
cheap). Reference analog: the commander CLI entry src/index.ts:17-58."""

import json

from mantic_sh_spark.cli import main


def test_cli_end_to_end(spark, tmp_path, capsys):
    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")

    assert main(["synth", "--out", pages, "--n-docs", "300", "--vocab", "500", "--partitions", "3"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 300

    assert main(["build", "--pages", pages, "--index", idx, "--segments", "3"]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_docs"] == 300 and st["segments"] == 3 and st["postings"] > 0

    assert main(["query", "--index", idx, "--q", "w1x w5x", "--k", "5"]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert "w1x w5x" in res and 1 <= len(res["w1x w5x"]) <= 5
    assert res["w1x w5x"][0]["rank"] == 1 and res["w1x w5x"][0]["url"].startswith("https://")

    # exhaustive engine agrees through the CLI too
    assert main(["query", "--index", idx, "--q", "w1x w5x", "--k", "5", "--engine", "exhaustive"]) == 0
    res2 = json.loads(capsys.readouterr().out.strip())
    assert [(r["doc_id"], r["score"]) for r in res2["w1x w5x"]] == [
        (r["doc_id"], r["score"]) for r in res["w1x w5x"]
    ]

    assert main(["stats", "--index", idx]) == 0
    st2 = json.loads(capsys.readouterr().out.strip())
    assert st2["segments"] == 3


def test_cli_refs_and_defs(spark, tmp_path, capsys):
    """refs/defs subcommands: serving-plane positional lookups with no
    Spark job (beyond the build), value-consistent with the reader."""
    import pandas as pd

    from mantic_sh_spark.operators.index_build import build_index

    pages = spark.createDataFrame(pd.DataFrame({
        "url": ["https://x/a", "https://x/b"],
        "warc_ts": pd.to_datetime(["2026-01-01"] * 2),
        "html": [b""] * 2,
        "text": ["def alpha does things alpha again", "alpha used here"],
        "lang": ["en"] * 2,
    }))
    idx = str(tmp_path / "idx")
    build_index(spark, pages, idx, n_segments=1, store_positions=True)

    assert main(["refs", "--index", idx, "--symbol", "alpha", "--k", "5"]) == 0
    refs = json.loads(capsys.readouterr().out.strip())
    assert {r["url"]: r["positions"] for r in refs} == {
        "https://x/a": [1, 4], "https://x/b": [0]}

    assert main(["defs", "--index", idx, "--symbol", "alpha"]) == 0
    defs = json.loads(capsys.readouterr().out.strip())
    assert [(d["url"], d["keyword"], d["position"]) for d in defs] == [
        ("https://x/a", "def", 1)]


def test_cli_extend_and_merge(spark, tmp_path, capsys):
    pages = str(tmp_path / "pages")
    more = str(tmp_path / "more")
    idx = str(tmp_path / "idx")

    main(["synth", "--out", pages, "--n-docs", "200", "--vocab", "400"])
    main(["build", "--pages", pages, "--index", idx, "--segments", "2"])
    main(["synth", "--out", more, "--n-docs", "80", "--vocab", "400", "--seed", "77"])
    capsys.readouterr()

    assert main(["extend", "--index", idx, "--pages", more, "--new-segments", "2"]) == 0
    ext = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ext["n_docs"] == 280 and len(ext["new_segments"]) == 2

    segs = ",".join(str(s) for s in ext["new_segments"])
    assert main(["merge", "--index", idx, "--segments", segs]) == 0
    merged = json.loads(capsys.readouterr().out.strip())
    # crash-safe merges always fold into a FRESH segment id (above every
    # existing docs/postings id), never in-place into a source
    assert merged["merged_into"] not in ext["new_segments"]
    assert merged["merged_into"] > max(ext["new_segments"])

    assert main(["query", "--index", idx, "--q", "w2x", "--k", "3"]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert len(res.get("w2x", [])) == 3


def test_cli_heal_rolls_back_crashed_merge(spark, tmp_path, capsys, monkeypatch):
    """`heal` runs the GC passes on demand — a serving deployment can
    clear a crashed fold without waiting for the next mutation (readers
    gate the partial segments out either way)."""
    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    main(["synth", "--out", pages, "--n-docs", "150", "--vocab", "300"])
    main(["build", "--pages", pages, "--index", idx, "--segments", "2"])
    capsys.readouterr()

    from mantic_sh_spark.operators import merge as merge_mod
    from mantic_sh_spark.operators.merge import merge_segments

    calls = {"n": 0}
    real = merge_mod.append_manifest

    def crashing(s, p, rows):
        calls["n"] += 1
        if calls["n"] == 2:  # the 'committed' barrier append
            raise RuntimeError("injected merge crash")
        return real(s, p, rows)

    monkeypatch.setattr(merge_mod, "append_manifest", crashing)
    import pytest

    with pytest.raises(RuntimeError, match="injected merge crash"):
        merge_segments(spark, idx, [0, 1], dst_segment=9)
    monkeypatch.undo()

    assert main(["stats", "--index", idx]) == 0
    assert json.loads(capsys.readouterr().out.strip())["gated_segments"] == [9]
    assert main(["heal", "--index", idx]) == 0  # default min-age skips the fresh fold
    assert json.loads(capsys.readouterr().out.strip()) == {
        "healed_extends": [], "healed_merges": []}
    assert main(["heal", "--index", idx, "--min-age-seconds", "0"]) == 0
    healed = json.loads(capsys.readouterr().out.strip())
    assert healed == {"healed_extends": [], "healed_merges": [9]}
    assert main(["stats", "--index", idx]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert "gated_segments" not in st and st["segments"] == 2
    assert main(["heal", "--index", idx, "--min-age-seconds", "0"]) == 0  # idempotent
    assert json.loads(capsys.readouterr().out.strip()) == {
        "healed_extends": [], "healed_merges": []}
    assert main(["query", "--index", idx, "--q", "w1x", "--k", "3"]) == 0
    assert len(json.loads(capsys.readouterr().out.strip())["w1x"]) == 3


def test_cli_exhaustive_respects_delete(spark, tmp_path, capsys):
    """`query --engine exhaustive` must exclude tombstoned docs just
    like wand/phrase (ADVICE r1, medium)."""
    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    main(["synth", "--out", pages, "--n-docs", "150", "--vocab", "300"])
    main(["build", "--pages", pages, "--index", idx, "--segments", "2"])
    capsys.readouterr()

    assert main(["query", "--index", idx, "--q", "w1x", "--k", "3"]) == 0
    before = json.loads(capsys.readouterr().out.strip())["w1x"]
    victim_url = before[0]["url"]

    assert main(["delete", "--index", idx, "--urls", victim_url]) == 0
    assert json.loads(capsys.readouterr().out.strip())["tombstoned"] == 1

    for engine in ("wand", "exhaustive"):
        assert main(["query", "--index", idx, "--q", "w1x", "--k", "3", "--engine", engine]) == 0
        after = json.loads(capsys.readouterr().out.strip())["w1x"]
        assert all(r["url"] != victim_url for r in after), engine


def test_cli_bm25f_engine(spark, tmp_path, capsys):
    """Opt-in field-weighted scoring (R4): a doc whose URL matches the
    query must outrank equals under --engine bm25f."""
    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    main(["synth", "--out", pages, "--n-docs", "120", "--vocab", "300"])
    main(["build", "--pages", pages, "--index", idx, "--segments", "2"])
    capsys.readouterr()

    assert main(["query", "--index", idx, "--q", "doc w2x", "--k", "5", "--engine", "bm25f"]) == 0
    res = json.loads(capsys.readouterr().out.strip())["doc w2x"]
    assert len(res) == 5 and res[0]["rank"] == 1
    # every synth url contains 'doc' → the url field contributes; scores
    # must differ from plain exhaustive BM25 on the same query
    assert main(["query", "--index", idx, "--q", "doc w2x", "--k", "5", "--engine", "exhaustive"]) == 0
    res2 = json.loads(capsys.readouterr().out.strip())["doc w2x"]
    assert [r["score"] for r in res] != [r["score"] for r in res2]
