from buskafkasparkstreaming_spark.cdc.envelope import (  # noqa: F401
    parse_envelopes,
    route_ops,
    synthesize_envelopes,
)
from buskafkasparkstreaming_spark.cdc.upsert import (  # noqa: F401
    UpsertTable,
    latest_state,
)
