from .partitions import (  # noqa: F401
    discover_partitions,
    partition_predicate,
    remaining_partitions,
)
