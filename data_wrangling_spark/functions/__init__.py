from data_wrangling_spark.functions import cleaning, text, vectors  # noqa: F401
