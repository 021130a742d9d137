"""PySpark-native analytics engine with the query/data-processing surface of
dxzielinski/big-data-crypto-sentiment, rebuilt Spark-first.

The reference is a GCP lambda architecture (Beam/Dataflow speed layer,
PySpark batch layer, BigQuery/MongoDB at rest). This package re-expresses
its operator inventory (SURVEY.md §2) as declarative DataFrame plans so
Catalyst/Tungsten/AQE pick the physical strategy, plus the LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.
"""

__version__ = "0.1.0"
