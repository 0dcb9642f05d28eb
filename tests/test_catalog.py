"""Source-catalog behavior: the cpu_parallel config gate."""

from etl_schema_spark.sources.catalog import cpu_parallel, load_table


def test_cpu_parallel_off_is_identity(spark, sf_dir):
    df = load_table(spark, sf_dir, "region")
    spark.conf.set("spark.etlSchemaSpark.cpuParallel", "off")
    try:
        assert cpu_parallel(df) is df  # no RDD probe, no repartition
    finally:
        spark.conf.unset("spark.etlSchemaSpark.cpuParallel")


def test_cpu_parallel_auto_probes_local(spark, sf_dir):
    df = load_table(spark, sf_dir, "region")
    out = cpu_parallel(df)  # local[...] master → probe allowed
    n = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() >= min(n, df.rdd.getNumPartitions())
