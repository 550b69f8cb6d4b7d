"""PySpark-native analytics engine with the query and data-processing
capabilities of pubkey/javascript-vector-database (a browser-local RxDB
vector database), re-expressed Spark-first.

The reference (read-only snapshot at /root/reference) stores 10k documents,
embeds them into unit-L2 384-dim vectors, indexes each vector by its distance
to 5 pivot vectors, and answers k-NN queries with three strategies (exact
full scan, pivot-range ANN, pivot-neighborhood ANN); an incremental
checkpointed pipeline keeps the vector table derived from the items table.
See SURVEY.md for the full blueprint with file:line citations.

This package is NOT a port: the reference's query planner / IndexedDB
cursor machinery is subsumed by Catalyst + Parquet pushdown.  Custom code
here is only the semantic layer: vector distance expressions, the pivot
index builder, the ANN plan builders, a Mango-selector -> Column translator,
the checkpointed pipeline, and the LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing).
"""

from javascript_vector_database_spark.session import get_spark  # noqa: F401
from javascript_vector_database_spark.tables import TABLES, load_table, load_tables, register_views  # noqa: F401

__version__ = "0.1.0"
