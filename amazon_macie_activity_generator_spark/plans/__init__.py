from amazon_macie_activity_generator_spark.plans import generate  # noqa: F401
