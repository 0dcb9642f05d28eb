"""Round-10 pins: the ADVICE r9 fixes.

- strict-mode decontamination threads the env knob into the ORACLE too
- PSI group totals ride a window, so NULL-keyed groups stay monitored
- PQ subvector width derives from EMB_DIM (loud failure on a bad pair)
- the gated-publish drain cleans up its scratch directory
"""

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

SF = "/root/testdata/sf0.001"


def test_decon_strict_env_threads_into_oracle(monkeypatch):
    """ADVICE r9 (medium): with ETL_SCHEMA_SPARK_DECON_STRICT=1 the oracle
    must drop the eval-bucket cap exactly as the Spark plan does."""
    from etl_schema_spark.operators import similarity

    monkeypatch.delenv("ETL_SCHEMA_SPARK_DECON_STRICT", raising=False)
    capped = similarity.embedding_decontaminate_oracle()
    assert "QUALIFY row_number() OVER (PARTITION BY band, key" in capped
    monkeypatch.setenv("ETL_SCHEMA_SPARK_DECON_STRICT", "1")
    strict = similarity.embedding_decontaminate_oracle()
    assert "QUALIFY row_number() OVER (PARTITION BY band, key" not in strict
    # the witness-cap QUALIFY (train_id partition) must survive strict mode
    assert "PARTITION BY train_id" in strict
    # explicit args override the env in both directions
    monkeypatch.delenv("ETL_SCHEMA_SPARK_DECON_STRICT", raising=False)
    assert similarity.embedding_decontaminate_oracle(strict=True) == strict


def test_decon_strict_spark_oracle_parity(spark, duck, monkeypatch):
    """Strict Spark plan vs strict oracle hash-match on the test corpus."""
    from etl_schema_spark.operators import similarity

    monkeypatch.setenv("ETL_SCHEMA_SPARK_DECON_STRICT", "1")
    sdf = similarity.embedding_decontaminate(spark, SF)
    assert_matches_oracle(sdf, duck, similarity.embedding_decontaminate_oracle())


def test_psi_null_group_is_monitored(spark):
    """ADVICE r9: a NULL group key must appear in psi_between output as its
    own stream (the old equi-join recombination silently dropped it)."""
    from etl_schema_spark.operators import drift

    ref = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 5.0), ("a", 9.0)],
        "event_type string, value double",
    )
    cur = spark.createDataFrame(
        [(None, 100.0), (None, 2.0), ("a", 5.0)],
        "event_type string, value double",
    )
    out = {r.event_type: r for r in drift.psi_between(ref, cur, by="event_type").collect()}
    assert set(out) == {None, "a"}
    assert out[None].n_ref == 2 and out[None].n_cur == 2
    assert out["a"].n_ref == 2 and out["a"].n_cur == 1


def test_pq_sub_d_follows_emb_dim(monkeypatch):
    """ADVICE r9: sub_d derives from EMB_DIM; a non-divisible pair fails
    loudly instead of producing truncated subvectors."""
    from etl_schema_spark.operators import similarity

    assert similarity._pq_sub_d() == similarity.EMB_DIM // similarity.PQ_M
    monkeypatch.setattr(similarity, "EMB_DIM", 60)
    with pytest.raises(ValueError, match="not divisible"):
        similarity._pq_sub_d()


def test_gated_publish_cleans_scratch_dir(spark):
    """ADVICE r9: the drain must not leak its mkdtemp scratch directory."""
    from etl_schema_spark.streaming import jobs

    pattern = os.path.join(tempfile.gettempdir(), "sq_gated_pub_*")
    before = set(glob.glob(pattern))
    out = jobs.streaming_quality_gated_publish(spark, SF)
    assert out.count() > 0
    assert set(glob.glob(pattern)) == before
