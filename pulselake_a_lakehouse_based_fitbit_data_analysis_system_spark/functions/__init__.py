from .expressions import (
    age_bins,
    bucketize,
    epoch_millis_to_ts,
    epoch_seconds_to_ts,
    minutes_between,
    portable_hash64,
    validity_flag,
)

__all__ = [
    "age_bins",
    "bucketize",
    "epoch_millis_to_ts",
    "epoch_seconds_to_ts",
    "minutes_between",
    "portable_hash64",
    "validity_flag",
]
