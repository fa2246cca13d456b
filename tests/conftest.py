from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "planaudit: live physical-plan invariant audits (pytest -m planaudit)",
    )


@pytest.fixture(scope="session")
def spark():
    from curatorhadoopinterface_spark.session import get_spark

    s = get_spark("tests", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


# texts shaped like the reference's samplejob fixtures (doc1-4.txt):
# multi-sentence English prose, entities from the gazetteer.
SAMPLE_TEXTS = [
    "The fast Spark job runs quickly. Hadoop customers merged data!",
    "A small hash join is running on the vector table.",
    "Lorem ipsum dolor sit amet. The customer said nothing?",
    "Numbers like 42 and 7 appeared. Spark and Hadoop clusters scaled.",
]


@pytest.fixture(scope="session")
def corpus(spark):
    from curatorhadoopinterface_spark.io import records_from_texts

    return records_from_texts(spark, SAMPLE_TEXTS)
