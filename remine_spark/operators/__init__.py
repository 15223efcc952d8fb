"""Extended operator layer: training-data pipeline operators (dedup,
similarity search, text statistics, multimodal plumbing) plus additional
SURVEY §2 relational rows. Importing this package registers every operator
in remine_spark.catalog.QUERIES."""

from remine_spark.operators import (  # noqa: F401
    dedup,
    graph,
    multimodal,
    relational,
    similarity,
    textstats,
)
