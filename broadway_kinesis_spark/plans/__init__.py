"""Physical-plan introspection and audit helpers."""

from broadway_kinesis_spark.plans.audit import (  # noqa: F401
    assert_plan,
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    shuffle_count,
    wholestage_codegen_spans,
)
