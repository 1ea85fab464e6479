"""Shared Spark fixtures.

Mirrors the reference conftest (tests/conftest.py:13-15 seeds numpy;
:73-123 define the label fixtures) but as Spark DataFrames.
"""

from __future__ import annotations

import numpy as np
import pytest

from geococo_spark.session import get_spark


@pytest.fixture(scope="session", autouse=True)
def set_seed():
    np.random.seed(0)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="geococo-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
