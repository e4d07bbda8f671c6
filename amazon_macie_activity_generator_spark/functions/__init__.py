from amazon_macie_activity_generator_spark.functions import rng  # noqa: F401
