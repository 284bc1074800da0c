import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from etl_btc_spark.session import get_spark
from etl_btc_spark.tables import TABLE_NAMES, table_path

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl-btc-spark-tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_SMOKE, t)}')"
        )
    yield con
    con.close()
