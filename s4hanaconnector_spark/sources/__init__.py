"""Sources: fixture loaders, deterministic synthetic CDC feeds, and the
partitioned JDBC source (reference: parallel initial load over N JDBC
connections, S4HanaProducer.java:533-580)."""

from s4hanaconnector_spark.sources.derby import (  # noqa: F401
    qident,
    stage_table,
)
from s4hanaconnector_spark.sources.jdbc import (  # noqa: F401
    DEFAULT_NUM_PARTITIONS,
    JdbcSourceConfig,
    prepare_pushdown_query,
)
from s4hanaconnector_spark.sources.pklog import (  # noqa: F401
    synthetic_pklog,
    synthetic_transactions,
)
