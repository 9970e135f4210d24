from .planner import (
    BloomJoinPlan,
    BloomJoinReport,
    choose_prefilter_target,
    resolve_join_columns,
    should_skip_prefilter,
    validate_join_inputs,
)

__all__ = [
    "BloomJoinPlan",
    "BloomJoinReport",
    "choose_prefilter_target",
    "resolve_join_columns",
    "should_skip_prefilter",
    "validate_join_inputs",
]
