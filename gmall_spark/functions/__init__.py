from gmall_spark.functions.columns import (
    age_from_birthday,
    date_hour,
    epoch_millis,
    money,
    shingles,
    stable_hash_hex,
    tokens,
    window_bounds,
)

__all__ = [
    "age_from_birthday",
    "date_hour",
    "epoch_millis",
    "money",
    "shingles",
    "stable_hash_hex",
    "tokens",
    "window_bounds",
]
