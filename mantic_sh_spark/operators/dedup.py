"""Deduplication suite for web-scale training data: exact, MinHash+LSH,
SimHash, n-gram Jaccard. (Reference analog: Set-based dedup A11 and the
canonical-duplicate grouping of src/canonical-analyzer.ts:27-113 — J8 —
generalized to content-level near-dup detection.)

Scale notes (the part that matters at 100 TB):
  * exact dedup is one hash-groupBy — the md5 shuffle key is 16 bytes
    regardless of document size, and Catalyst does map-side partial
    aggregation.
  * MinHash signatures are Catalyst-only (md5 → hex → bigint), so
    signature computation never leaves the JVM. LSH banding turns the
    O(n²) pair space into an equi-join on band keys — the only join is
    |candidate pairs|, not |docs|².
  * n-gram Jaccard here is the VERIFICATION stage run on LSH candidate
    pairs (bounded), or on explicitly bounded subsets for tests; never
    run the all-pairs form on a full corpus.
  * duplication skew: near_dup_pairs collapses exact duplicates to one
    representative BEFORE banding (web corpora are ~30% exact dups — a
    10⁷-doc identical cluster would otherwise emit ~5×10¹³ band-join
    rows), and caps residual band-bucket width with a counted drop
    surfaced by lsh_bucket_audit.

The md5→bigint hash family is chosen for cross-engine reproducibility:
DuckDB computes the identical values ('0x'||substr(md5(..),1,15))::BIGINT,
which is what makes the signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

# 32 hashes / bands of 4 → 8 bands: detection threshold ≈ (1/8)^(1/4) ≈ 0.59,
# P(candidate | jaccard 0.85) ≈ 1 - (1 - 0.85^4)^8 ≈ 0.994
N_HASHES = 32
BAND_SIZE = 4


def _toks() -> F.Column:
    return tokens_col("text", camel=False)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, n_dupes): one keeper (min doc_id) per distinct text.
    Hash-groupBy on md5(text) — the canonical exact pass."""
    return (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).cast("long").alias("n_dupes"))
        .select("doc_id", "n_dupes")
    )


def exact_clusters(docs: DataFrame) -> DataFrame:
    """(doc_id, rep_id, cluster_size): exact-duplicate clusters keyed by
    md5(text); representative = min doc_id (the same keeper rule as
    exact_dedup). Two map-side-combinable shuffles on the 16-byte hash
    key — never a doc-count window or a collect_list that would
    materialize a 10⁷-member cluster on one task."""
    h = docs.select(F.md5("text").alias("h"), "doc_id")
    reps = h.groupBy("h").agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )
    return h.join(reps, "h").select("doc_id", "rep_id", "cluster_size")


def hash64(col: F.Column, salt: F.Column | str) -> F.Column:
    """Deterministic 60-bit hash reproducible in ANSI SQL:
    int(first 15 hex chars of md5(col || '#' || salt))."""
    s = F.lit(salt) if isinstance(salt, (str, int)) else salt
    return F.conv(F.substring(F.md5(F.concat(col, F.lit("#"), s.cast("string"))), 1, 15), 16, 10).cast("long")


def doc_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, term) distinct — the set representation used by
    MinHash/Jaccard."""
    return docs.select("doc_id", F.explode(F.array_distinct(_toks())).alias("term"))


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig_id, minhash): n_hashes permutations approximated by
    salted hashes; min per (doc, sig). Pure Catalyst and DOC-LOCAL
    (r6, guide §2.4): one generated row per (doc, sig_id) with the
    signature as array_min over the doc's bound distinct-term array —
    zero exchanges, where the old crossJoin × n_hashes + groupBy
    shuffled one row per (distinct term, sig) and re-aggregated. The
    md5 count per doc is unchanged (n_hashes passes over the distinct
    terms); only the shuffle is gone, and the minhash column stays
    prunable for consumers that never read it. Docs with no tokens
    emit no rows, matching the relational form."""
    base = docs.select("doc_id", F.array_distinct(_toks()).alias("_dt")).filter(
        F.size("_dt") > 0
    )
    sig_ids = F.array(*[F.lit(i).cast("int") for i in range(n_hashes)])
    rows = base.select("doc_id", "_dt", F.explode(sig_ids).alias("sig_id"))
    minhash = F.array_min(
        F.transform(F.col("_dt"), lambda t: hash64(t, F.col("sig_id")))
    )
    return rows.select("doc_id", "sig_id", minhash.alias("minhash"))


def lsh_bands(signatures: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band, band_key): concat each band's minhashes → md5 key.
    Docs agreeing on any full band become candidates."""
    banded = signatures.withColumn("band", (F.col("sig_id") / F.lit(band_size)).cast("int"))
    return (
        banded.groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("sig_id", "minhash"))).alias("ms"))
        .select(
            "doc_id",
            "band",
            F.md5(F.concat_ws(",", F.transform(F.col("ms"), lambda x: x["minhash"].cast("string")))).alias(
                "band_key"
            ),
        )
    )


def _capped_bands(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """Band rows annotated with bucket width and, when max_bucket is
    set, restricted to buckets of width ≤ max_bucket. One count-only
    window (no sort frame) — a single shuffle on the band key."""
    from pyspark.sql import Window

    if max_bucket is None:
        return bands
    w = Window.partitionBy("band", "band_key")
    return (
        bands.withColumn("width", F.count(F.lit(1)).over(w))
        .filter(F.col("width") <= int(max_bucket))
        .drop("width")
    )


def lsh_bucket_audit(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket: int = 256,
    collapse_exact: bool = True,
) -> DataFrame:
    """(band, band_key, width) of the band buckets a max_bucket cap
    DROPS from lsh_candidate_pairs — the counted, surfaced audit of
    what the skew guard skipped. A capped bucket is a pathological
    near-identical cluster: at width d it would emit d(d-1)/2 candidate
    pairs per band, so the pipeline drops it and reports it here
    instead of silently attempting the quadratic join.

    collapse_exact must MATCH the near_dup_pairs call being audited
    (both default True): near_dup_pairs bands the exact-collapsed
    representatives, so auditing the raw docs would report exact-dup
    clusters as dropped buckets when nothing was dropped — and could
    mis-state the width of genuinely capped buckets (review r5
    finding)."""
    base = docs
    if collapse_exact:
        reps = (
            exact_clusters(docs)
            .filter(F.col("doc_id") == F.col("rep_id"))
            .select("doc_id")
        )
        base = docs.join(reps, "doc_id")
    bands = lsh_bands(minhash_signatures(base, n_hashes), band_size)
    return (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).cast("long").alias("width"))
        .filter(F.col("width") > int(max_bucket))
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = None,
) -> DataFrame:
    """(a, b) candidate near-dup pairs (a < b): equi-join on band keys —
    the scale path that replaces the O(n²) comparison. max_bucket caps
    the width of any one band bucket (a bucket of d docs self-joins to
    d(d-1)/2 pairs — one mega-bucket of near-identical docs is the
    remaining quadratic hazard once exact duplicates are collapsed);
    capped buckets are dropped from the join and surfaced by
    lsh_bucket_audit. None (the oracle-checked default) keeps the
    uncapped semantics."""
    bands = _capped_bands(lsh_bands(minhash_signatures(docs, n_hashes), band_size), max_bucket)
    l = bands.select(F.col("band").alias("band_l"), F.col("band_key").alias("key_l"), F.col("doc_id").alias("a"))
    r = bands.select(F.col("band").alias("band_r"), F.col("band_key").alias("key_r"), F.col("doc_id").alias("b"))
    pairs = l.join(
        r,
        (F.col("band_l") == F.col("band_r")) & (F.col("key_l") == F.col("key_r")) & (F.col("a") < F.col("b")),
    )
    return pairs.select("a", "b").distinct()


def ngram_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams."""
    t = docs.withColumn("toks", _toks()).filter(F.size("toks") >= n)
    idx = F.sequence(F.lit(1), F.size("toks") - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at("toks", i + j) for j in range(n)]))
    return t.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))


def _candidate_intersections(l: DataFrame, r: DataFrame, candidates: DataFrame) -> DataFrame:
    """Pre-aggregation intersection rows, candidate-bounded: route the
    shingle match THROUGH the (a, b) pair key — candidates ⋈ shingles(a)
    ⋈ shingles(b) on (b, shingle) — so the row count is
    Σ_pairs |shingles(a)| at the probe and Σ_pairs |shingles(a) ∩
    shingles(b)| at the output. The co-shingle self-join fanout (one hot
    shingle → quadratic pairs) never materializes, which is the whole
    point of running LSH first."""
    pairs = candidates.filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    return pairs.join(l, "a").join(r, ["b", "shingle"])


def jaccard_pairs(shingles: DataFrame, threshold: float, candidates: DataFrame | None = None) -> DataFrame:
    """(a, b, jac): exact Jaccard over shingle sets; restricted to a
    candidate-pair DataFrame when given (the LSH→verify pattern — the
    shingle join is candidate-bounded BEFORE any aggregation),
    otherwise all pairs a<b (BOUNDED INPUTS ONLY)."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    l = shingles.select(F.col("doc_id").alias("a"), "shingle")
    r = shingles.select(F.col("doc_id").alias("b"), "shingle")
    if candidates is not None:
        joined = _candidate_intersections(l, r, candidates)
    else:
        joined = l.join(r, "shingle").filter(F.col("a") < F.col("b"))
    inter = joined.groupBy("a", "b").agg(F.count(F.lit(1)).alias("ix"))
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    out = (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn("jac", F.round(F.col("ix") / (F.col("sza") + F.col("szb") - F.col("ix")), 4))
        .filter(F.col("jac") >= threshold)
    )
    return out.select("a", "b", "jac")


def near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    collapse_exact: bool = True,
    max_bucket: int | None = 256,
) -> DataFrame:
    """End-to-end near-dup: exact-duplicate collapse → MinHash → LSH
    bands → candidate pairs → exact-Jaccard verification.

    Duplication-skew safety (the 100-TB design constraint — web corpora
    run ~30% exact duplicates): with collapse_exact (default), docs
    first collapse to one representative per distinct text
    (exact_clusters), so a cluster of d identical docs contributes ONE
    row to banding instead of d(d-1)/2 candidate pairs per band — at
    d=10⁷ the uncollapsed form is ~5×10¹³ rows from a single cluster.
    Output pairs are therefore between cluster REPRESENTATIVES; every
    member inherits its representative's near-dup relations through
    exact_clusters (the member-pair expansion is left to the consumer
    precisely because it is quadratic in cluster size — the exact-dup
    relation itself is already fully described by (doc_id, rep_id)).

    max_bucket then caps the residual hazard — near-identical but not
    byte-identical mega-clusters sharing a band key; capped buckets are
    dropped with the counted audit in lsh_bucket_audit (run it with the
    same parameters to see what was skipped). collapse_exact=False +
    max_bucket=None recovers the historical all-member semantics for
    bounded inputs."""
    base = docs
    if collapse_exact:
        reps = (
            exact_clusters(docs)
            .filter(F.col("doc_id") == F.col("rep_id"))
            .select("doc_id")
        )
        base = docs.join(reps, "doc_id")
    cands = lsh_candidate_pairs(base, n_hashes, band_size, max_bucket=max_bucket)
    return jaccard_pairs(doc_terms(base).withColumnRenamed("term", "shingle"), threshold, candidates=cands)


def simhash16(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash from tf-weighted term-hash bits.
    Catalyst-only formulation (bit j of the term hash votes ±tf).

    DOC-LOCAL (r6, guide §2.4): the per-doc (term, tf) pairs come from
    the _term_tf_pairs HOF, each term is md5-hashed ONCE into a bound
    intermediate array, and the 16 bit votes are integer folds over it
    — zero exchanges, where the old plan shuffled (doc, term) tf rows,
    multiplied them ×16 through a crossJoin, and paid two more
    hash-aggregate shuffles. Docs with no tokens emit no rows."""
    from .index_build import _term_tf_pairs

    def _vote_fold(j: int):
        # factory, not a default arg: PySpark inspects lambda arity and
        # a (acc, x, jj=j) signature would be read as a 3-arg lambda
        return lambda acc, x: acc + (
            F.shiftright(x["h"], j).bitwiseAND(F.lit(1)) * 2 - 1
        ) * x["tf"]

    def _with_hashed(hp):
        sim = None
        for j in range(16):
            vote = F.aggregate(hp, F.lit(0).cast("long"), _vote_fold(j))
            bitval = F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            sim = bitval if sim is None else sim + bitval
        return sim

    def _with_pairs(ps):
        hashed = F.transform(
            ps, lambda p: F.struct(hash64(p["term"], "sim").alias("h"), p["tf"].alias("tf"))
        )
        return F.get(F.transform(F.array(hashed), _with_hashed), 0)

    sim = F.get(F.transform(F.array(_term_tf_pairs(_toks())), _with_pairs), 0)
    # filter on the cheap token count, project the expensive fold: a
    # consumer that only counts rows never evaluates the hash work
    return docs.filter(F.size(_toks()) > 0).select("doc_id", sim.alias("simhash"))
