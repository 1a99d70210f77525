from __future__ import annotations

import pytest

from feature_engineering_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fes-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def pages_pdf():
    from feature_engineering_spark.sources.pages import generate_pages

    return generate_pages(5000, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf)


@pytest.fixture(scope="session")
def labels_pdf():
    from feature_engineering_spark.sources.pages import generate_labels

    return generate_labels(5000, seed=42)


@pytest.fixture(scope="session")
def labels_df(spark, labels_pdf):
    return spark.createDataFrame(labels_pdf)
