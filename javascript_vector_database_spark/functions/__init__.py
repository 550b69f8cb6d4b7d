from javascript_vector_database_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    euclidean_distance,
    index_nr_to_string,
    l2_norm,
    l2_normalize,
)
