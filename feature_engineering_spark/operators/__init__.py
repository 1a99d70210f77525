from feature_engineering_spark.operators.asof import (  # noqa: F401
    asof_join,
    backfill_asof,
)
from feature_engineering_spark.operators.contamination import (  # noqa: F401
    contamination_report,
    decontaminate,
)
from feature_engineering_spark.operators.dedup import (  # noqa: F401
    dedup_batch_against_corpus,
    dedup_exact,
    minhash_lsh_dedup,
    minhash_lsh_incremental,
)
from feature_engineering_spark.operators.graph import (  # noqa: F401
    connected_components,
    dedup_clusters,
    dedup_keep_canonical,
)
from feature_engineering_spark.operators.lagging import (  # noqa: F401
    lag_lead_delta,
    rolling_causal_stats,
)
from feature_engineering_spark.operators.repetition import (  # noqa: F401
    filter_repetitive,
    repetition_signals,
)
from feature_engineering_spark.operators.resample import resample_to_grid  # noqa: F401
from feature_engineering_spark.operators.sessionize import (  # noqa: F401
    session_bounds,
    sessionize,
)
from feature_engineering_spark.operators.skew import (  # noqa: F401
    salted_window_features,
)
from feature_engineering_spark.operators.split import (  # noqa: F401
    causal_split,
    clean_nan_columns,
    composite_target,
    variance_prune,
)
from feature_engineering_spark.operators.windows import (  # noqa: F401
    derive_text_signals,
    sliding_window_features,
)
