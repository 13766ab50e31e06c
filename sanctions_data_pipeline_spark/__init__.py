"""PySpark-native analytics engine with the query and data-processing
capabilities of the sanctions-data-pipeline reference, re-expressed
Spark-first (DataFrame/SQL/Catalyst) and extended with large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

See SURVEY.md for the blueprint and the reference behavior map.
"""

__version__ = "0.1.0"
