"""spark_ml_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``iagooteroc/spark_ml`` (surveyed in
SURVEY.md), plus the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) mandated by BASELINE.json — every operator
designed for 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst pushdown/pruning/codegen apply)
- broadcast joins for dimension tables, partial (map-side) aggregation
- no row-at-a-time Python UDFs in any hot path; Arrow-vectorized
  ``mapInPandas`` only where built-ins cannot express the semantics
- approximate variants (HLL distinct, LSH similarity) as the scale path
  next to their exact siblings
"""

__version__ = "0.1.0"

#: public composable surface (lazy import to keep bare-package import
#: free of a SparkSession requirement):
#:   from spark_ml_spark import api           — operators over any DataFrame
#:   from spark_ml_spark.session import get_spark
#:   from spark_ml_spark.registry import collect — the driver contract
