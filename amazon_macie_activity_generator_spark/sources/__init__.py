from amazon_macie_activity_generator_spark.sources import real_series  # noqa: F401
