import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daily_journal_dataflow_qc_spark.config import PipelineConfig
from daily_journal_dataflow_qc_spark.datagen import generate, write_parquet
from daily_journal_dataflow_qc_spark.session import get_spark

CACHE_DIR = "/tmp/djdq_testdata_n50_s42"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="djdq-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def cfg():
    return PipelineConfig()


@pytest.fixture(scope="session")
def synth_pdfs():
    return generate(n_convs=50, seed=42)


@pytest.fixture(scope="session")
def synth_dir(synth_pdfs):
    write_parquet(CACHE_DIR, n_convs=50, seed=42)
    return CACHE_DIR
