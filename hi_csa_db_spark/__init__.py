"""hi_csa_db_spark — a PySpark-native analytics engine.

Re-expresses the operator semantics of the reference pipeline
(ecoFw/hi-csa-db, an R-Markdown crawl->scrape->classify->merge->publish
ETL; see SURVEY.md) as an idiomatic Spark SQL / DataFrame engine, plus
the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).

Design rules (SURVEY.md section 7):
- declare plans with the DataFrame/SQL API; let Catalyst/AQE optimize
- every ingested table that needs ordered semantics carries an explicit
  order column (Spark has no implicit row order)
- UDFs only at the edges (HTML parse, multimodal decode); everything
  else is built-in Catalyst expressions
- broadcast small dimensions; shingle/token equi-joins instead of
  nested-loop contains-joins at scale
"""

__version__ = "0.3.0"

from hi_csa_db_spark.session import get_spark  # noqa: F401
from hi_csa_db_spark.catalog import (  # noqa: F401
    load_table,
    load_tables,
    publish,
    register_tables,
)
