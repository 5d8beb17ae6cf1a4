from spark_ml_spark.io.sources import TABLES, documents_csv_path, load

__all__ = ["TABLES", "documents_csv_path", "load"]
