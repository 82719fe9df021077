from fastmlframework_spark.functions.horizontal import (
    hard_vote_long,
    horizontal_mean,
    mode_agg,
    soft_vote,
)

__all__ = ["hard_vote_long", "horizontal_mean", "mode_agg", "soft_vote"]
