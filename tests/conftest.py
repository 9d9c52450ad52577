import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("goose-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf0001_fixtures():
    """(pages_path, expected_path) for the sf0.001 corpus (cached in /tmp)."""
    from goose_spark.fixtures import ensure_pages

    return ensure_pages("/root/testdata/sf0.001")
