import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# __ray_entry__.oracle_sql() keys its token-fixture scale off this var; pin
# it so query and oracle agree when pytest runs at the default sf0.001
os.environ.setdefault("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    ctx.enable_tensor_extension_casting = False  # ragged list cols stay Arrow lists
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    d = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"create view {t} as select * from read_parquet('{d}/{t}.parquet')")
    return con
