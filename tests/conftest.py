import pytest


@pytest.fixture(scope="session")
def spark():
    from mantic_sh_spark.session import get_spark

    s = get_spark(cores=4, app_name="mantic-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_corpus(spark, tmp_path_factory):
    """One shared small synthetic corpus + built index for query tests."""
    from mantic_sh_spark.operators.index_build import build_index
    from mantic_sh_spark.sources.synth import SynthConfig, gen_pages

    cfg = SynthConfig(n_docs=400, vocab_size=600, seed=42, needle_every=97)
    pages = gen_pages(spark, cfg, partitions=4)
    idx = str(tmp_path_factory.mktemp("index") / "idx")
    build_index(spark, pages, idx, n_segments=4)
    return {"cfg": cfg, "pages": pages, "index_dir": idx}
