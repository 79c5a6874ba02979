from __future__ import annotations

import shutil
import tempfile

import pytest

from rkts_migration_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_ckpt():
    d = tempfile.mkdtemp(prefix="kg_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
