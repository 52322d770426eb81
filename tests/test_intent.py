"""Query intent analysis + entity extraction (T6; reference
src/intent-analyzer.ts / src/entity-extractor.ts analogs) and the
CLI auto-routing built on them."""

import json

from mantic_sh_spark.functions.intent import expand_fuzzy_term, extract_entities, parse_query


def test_parse_query_kinds():
    p = parse_query('"spark join" extra words')
    assert p.kind == "phrase" and p.phrase == "spark join" and p.slop == 0
    assert p.engine == "phrase"

    p = parse_query('"spark join"~3')
    assert p.kind == "phrase" and p.slop == 3

    p = parse_query("url:site11 router")
    assert p.kind == "field" and p.fields == {"url": "site11"}
    assert p.engine == "bm25f" and "router" in p.terms and "site11" in p.terms

    p = parse_query("routr~ server")
    assert p.kind == "fuzzy" and p.fuzzy_terms == ["routr"]
    assert p.engine == "wand" and "server" in p.terms

    p = parse_query("plain bag of words")
    assert p.kind == "terms" and p.engine == "wand"
    assert p.terms == ["plain", "bag", "of", "words"]


def test_extract_entities():
    ents = extract_entities(
        "see https://site1.example/a?x=1 mail bob@x.io v2.3.1 build 12345 parseHtml snake_case"
    )
    assert ents["url"] == ["https://site1.example/a?x=1"]
    assert ents["email"] == ["bob@x.io"]
    assert "v2.3.1" in ents["version"]
    assert "12345" in ents["number"]
    assert "parseHtml" in ents["identifier"] and "snake_case" in ents["identifier"]
    # url span is not re-reported as number/identifier (non-overlap rule)
    assert all("site1" not in x for x in ents.get("identifier", []))


def test_fuzzy_expansion_finds_close_terms(spark, small_corpus):
    import pytest

    from mantic_sh_spark.operators.index_build import build_term_dictionary

    # fuzzy needs the on-demand vocabulary sidecar (the core index has
    # no term strings); a missing dictionary must say so, not crash
    import shutil
    from mantic_sh_spark.sources.catalog import IndexPaths

    shutil.rmtree(IndexPaths(small_corpus["index_dir"]).term_dict, ignore_errors=True)
    with pytest.raises(FileNotFoundError, match="term_dictionary"):
        expand_fuzzy_term(small_corpus["index_dir"], "w1y")
    n = build_term_dictionary(spark, small_corpus["index_dir"])
    assert n > 500  # vocab_size=600 synthetic corpus
    # vocab contains w1x..w599x — a 1-edit typo must resolve to real terms
    got = expand_fuzzy_term(small_corpus["index_dir"], "w1y", max_dist=1, limit=3)
    assert got and all(t.startswith("w1") for t in got)
    # exact term ranks first when present
    got2 = expand_fuzzy_term(small_corpus["index_dir"], "w12x", max_dist=2, limit=3)
    assert got2[0] == "w12x"
    # ADVICE r2: a correction differing in the FIRST letter must be
    # reachable when it is the query term's first-char deletion
    got3 = expand_fuzzy_term(small_corpus["index_dir"], "ww9x", max_dist=1, limit=3)
    assert "w9x" in got3


def test_fuzzy_rebuilds_dictionary_after_upsert(spark, tmp_path):
    """An upsert deletes the term_dictionary sidecar (stale dictionaries
    silently miss terms); the FIRST fuzzy query after it must succeed by
    rebuilding inline (rebuild_if_missing=True) — and see the upserted
    vocabulary (r3 verdict task)."""
    import os

    from pyspark.sql import functions as F

    from mantic_sh_spark.operators.index_build import build_index, build_term_dictionary
    from mantic_sh_spark.sources.catalog import IndexPaths
    from mantic_sh_spark.sources.synth import SynthConfig, gen_pages
    from mantic_sh_spark.streaming.incremental import upsert_pages

    cfg = SynthConfig(n_docs=120, vocab_size=150, seed=41)
    pages = gen_pages(spark, cfg, partitions=2)
    idx = str(tmp_path / "idx")
    build_index(spark, pages, idx, n_segments=2)
    build_term_dictionary(spark, idx)

    # modify one page to carry a brand-new vocabulary term
    victim = pages.select("url").orderBy("url").limit(1).collect()[0].url
    modified = pages.filter(F.col("url") == victim).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzfreshterm zzfreshterm"))
    )
    res = upsert_pages(spark, idx, modified, n_new_segments=1)
    assert res["modified"] == 1
    assert not os.path.isdir(IndexPaths(idx).term_dict)  # mutation dropped it

    # immediately-following fuzzy query: rebuilds the sidecar inline and
    # resolves a typo of the NEW term
    got = expand_fuzzy_term(idx, "zzfreshtern", max_dist=1, limit=3,
                            spark=spark, rebuild_if_missing=True)
    assert got == ["zzfreshterm"]
    assert os.path.isdir(IndexPaths(idx).term_dict)


def test_cli_auto_routing(spark, small_corpus, capsys):
    from mantic_sh_spark.cli import main

    idx = small_corpus["index_dir"]
    assert main(["query", "--index", idx, "--engine", "auto", "--k", "3",
                 "--q", "w1x w5x", "w2x~ w3x"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["w1x w5x"]["intent"] == "terms" and out["w1x w5x"]["engine"] == "wand"
    assert len(out["w1x w5x"]["results"]) == 3
    assert out["w2x~ w3x"]["intent"] == "fuzzy"
    assert len(out["w2x~ w3x"]["results"]) == 3
