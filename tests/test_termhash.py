"""Lock-step guarantee for the term-id hash: the pure-Python xxhash64
(functions/termhash.py — what query clients and the JVM-free serving
reader use) must be bit-identical to Spark's Catalyst `F.xxhash64`
(what the build uses) — the same ×N-implementations discipline as the
tokenizer. A drift here would silently make every query miss."""

import random
import string

import pandas as pd
from pyspark.sql import functions as F

from mantic_sh_spark.functions.termhash import term_tid, xxhash64


def test_python_xxhash64_matches_spark(spark):
    random.seed(7)
    cases = ["", "a", "ab", "spark", "hello world", "ü€漢字", "ßñé", "→←"]
    # every length across the 8/4/1-byte tail boundaries and the 32-byte
    # stripe loop
    cases += ["x" * n for n in range(1, 70)]
    cases += [
        "".join(random.choices(string.ascii_lowercase + string.digits + "éßñ漢", k=random.randint(1, 48)))
        for _ in range(3000)
    ]
    pdf = pd.DataFrame({"s": cases})
    rows = spark.createDataFrame(pdf).select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert term_tid(r.s) == r.h, repr(r.s)


def test_xxhash64_reference_vectors():
    # xxHash64 reference test vectors (seed 0): public xxhsum values
    assert xxhash64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxhash64(b"a", seed=0) == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc", seed=0) == 0x44BC2CF5AD770999
