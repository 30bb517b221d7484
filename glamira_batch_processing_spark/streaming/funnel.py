"""Stateful streaming funnel: per-user stage machines via
applyInPandasWithState.

The batch twin is operators/behavior.py::funnel_user_flags (stacked
running-max windows). The streaming form keeps ONE small integer per
user — the number of funnel stages completed so far — and advances it
greedily: an event advances the machine iff its type is the next
uncompleted stage. Greedy earliest-advance computes exactly the batch
semantics ("a stage counts only at-or-after the first qualified
previous-stage event"), because the running-max flags in the batch form
mark precisely the first qualified occurrence of each stage.

Same event-time caveat as the sessionizer: events are ordered by
(ts_us, event_id) WITHIN a micro-batch; cross-batch reordering older
than the previous batch is not replayed (use the batch operator for
full out-of-order corrections).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FUNNEL_STATE_SCHEMA = StructType([StructField("stage_reached", IntegerType())])

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage_reached", IntegerType()),
    ]
)


def funnel_stateful(grouped, stages: Sequence[str]):
    """Per-user funnel progress for a stream grouped by user.

    Emits (user_id, stage_reached) for every user touched in each
    micro-batch (update semantics); ``stage_reached`` is the count of
    completed stages (len(stages) = full conversion). State is one int
    per user — bounded regardless of event volume.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stage_list = list(stages)

    def fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        reached = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for etype in pdf["event_type"]:
                if reached < len(stage_list) and etype == stage_list[reached]:
                    reached += 1
        state.update((reached,))
        yield pd.DataFrame(
            [(int(user_id), reached)], columns=["user_id", "stage_reached"]
        )

    return grouped.applyInPandasWithState(
        fn,
        FUNNEL_OUTPUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
