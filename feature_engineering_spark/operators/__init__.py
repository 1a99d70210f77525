from feature_engineering_spark.operators.sessionize import sessionize  # noqa: F401
from feature_engineering_spark.operators.lagging import (  # noqa: F401
    lag_lead_delta,
    rolling_causal_stats,
)
