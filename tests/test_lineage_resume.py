"""Checkpoint-resume orchestration tests (plans.lineage)."""

import pytest
from pyspark.sql import functions as F

from posextract_spark.pipeline import pages_to_triples
from posextract_spark.plans.lineage import BucketedRun
from posextract_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, 60, seed=11, n_partitions=4).persist()
    df.count()
    return df


def _stage(part):
    return pages_to_triples(part, provider="template", use_stored_text=True)


def test_resume_equals_single_run(spark, pages, tmp_path):
    # single uninterrupted run
    full = BucketedRun(spark, str(tmp_path / "full"), n_buckets=4)
    assert full.run(pages, _stage) == 4

    # crashed run: 2 buckets then simulated failure, then resume
    resumed = BucketedRun(spark, str(tmp_path / "resumed"), n_buckets=4)
    with pytest.raises(RuntimeError, match="simulated crash"):
        resumed.run(pages, _stage, fail_after=2)
    assert len(resumed.completed_buckets()) == 2
    # resume processes exactly the remaining buckets
    assert resumed.run(pages, _stage) == 2

    key = ["url", "sent_pos", "sent_id", "subject", "verb", "object"]
    a = sorted(map(tuple, full.read_output().select(*key).collect()))
    b = sorted(map(tuple, resumed.read_output().select(*key).collect()))
    assert a == b and len(a) > 0


def test_metrics_and_idempotent_rerun(spark, pages, tmp_path):
    run = BucketedRun(spark, str(tmp_path / "m"), n_buckets=3)
    run.run(pages, _stage)
    m = run.metrics()
    assert m["buckets_done"] == 3
    assert m["input_rows"] == pages.count()
    assert m["output_rows"] == run.read_output().count()
    # second call is a no-op
    assert run.run(pages, _stage) == 0
