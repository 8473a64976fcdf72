import pytest

from spork_spark import Engine, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="spork-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4",
                              "spark.ui.enabled": "false",
                              # long fuzz soaks run tens of thousands of
                              # stages in one JVM; headroom over the 1g
                              # default keeps the session alive
                              "spark.driver.memory": "4g"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def eng(spark):
    return Engine(spark)


@pytest.fixture(scope="session")
def students(spark):
    """studentnulltab10k-shaped fixture (FIXTURES.md §B): embedded nulls in
    every column — the reference e2e corpus's null-semantics carrier."""
    rows = [
        ("alice", 20, 3.5),
        ("bob", 25, 2.5),
        ("alice", 22, 3.9),
        (None, 30, 1.0),
        ("carol", None, 2.0),
        ("dave", 35, None),
        (None, None, None),
        ("bob", 25, 2.5),
    ]
    return spark.createDataFrame(rows, "name string, age int, gpa double")
