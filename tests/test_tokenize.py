"""Three-way tokenizer lock-step: pure Python == Spark Column == DuckDB SQL."""

import duckdb
import numpy as np
import pandas as pd

from mantic_sh_spark.functions.tokenize import TOKENIZE_SQL, tokenize, tokenize_query, tokens_col


def test_pure_cases():
    assert tokenize("HelloWorld") == ["hello", "world"]
    assert tokenize("foo_bar-baz qux") == ["foo", "bar", "baz", "qux"]
    assert tokenize("Router99Server") == ["router99", "server"]
    assert tokenize("") == []
    assert tokenize("  --  ") == []
    assert tokenize_query("spark spark JOIN Spark") == ["spark", "join"]


def _random_strings(n=60, seed=5):
    rng = np.random.default_rng(seed)
    alpha = list("abcXYZ019 _-./") + ["Camel", "snake_case", "W9x"]
    return ["".join(rng.choice(alpha, size=rng.integers(0, 20))) for _ in range(n)]


def test_spark_matches_pure(spark):
    strs = _random_strings()
    sdf = spark.createDataFrame(pd.DataFrame({"s": strs}))
    got = [r.toks for r in sdf.select(tokens_col("s").alias("toks")).collect()]
    want = [tokenize(s) for s in strs]
    assert got == want


def test_count_form_matches_array_form(spark):
    """token_count_col (the allocation-free doc_len path) must equal
    size(tokens_col(...)) AND len(tokenize(...)) on arbitrary input —
    norms doc_len and the postings stage's re-derived token stream
    come from these two forms respectively."""
    from pyspark.sql import functions as F

    from mantic_sh_spark.functions.tokenize import token_count_col

    strs = _random_strings(n=80, seed=7) + ["", "  --  ", "HelloWorld", "FOOBar9x"]
    sdf = spark.createDataFrame(pd.DataFrame({"s": strs}))
    rows = sdf.select(
        F.size(tokens_col("s")).alias("arr"), token_count_col("s").alias("cnt")
    ).collect()
    for s, r in zip(strs, rows):
        assert r.arr == r.cnt == len(tokenize(s)), (s, r.arr, r.cnt)


def test_duckdb_matches_pure():
    # DuckDB fragment covers the lowercase corpora (no camel step);
    # compare against pure tokenizer on already-lowercase inputs.
    strs = [s.lower() for s in _random_strings(seed=6)]
    con = duckdb.connect()
    frag = TOKENIZE_SQL.format(col="s")
    got = con.execute(f"SELECT {frag} FROM (SELECT unnest(?) AS s)", [strs]).fetchall()
    want = [tokenize(s) for s in strs]
    assert [g[0] for g in got] == want
