import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
REF_JSON_DIR = "/root/reference/tests/workspace/textract_responses"

FIXTURE_IDS = sorted(
    os.path.basename(p)[:-5] for p in glob.glob(os.path.join(GOLDEN_DIR, "*.json"))
)


def load_golden(doc_id: str) -> dict:
    with open(os.path.join(GOLDEN_DIR, f"{doc_id}.json"), encoding="utf-8") as f:
        return json.load(f)


def load_textract_json(doc_id: str) -> dict:
    with open(os.path.join(REF_JSON_DIR, f"{doc_id}.json"), encoding="utf-8") as f:
        return json.load(f)


def load_textract_text(doc_id: str) -> str:
    with open(os.path.join(REF_JSON_DIR, f"{doc_id}.json"), encoding="utf-8") as f:
        return f.read()


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("t2p-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.default.parallelism", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .getOrCreate()
    )
    yield spark
    spark.stop()
