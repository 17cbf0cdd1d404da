from electricity_forecast_pipeline_airflow_k8s_spark.operators.profile import quality_profile  # noqa: F401
from electricity_forecast_pipeline_airflow_k8s_spark.operators.validation import (  # noqa: F401
    ValidationReport,
    validate,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (  # noqa: F401
    chronological_split,
    fill_gaps_hourly,
    ks_drift,
    psi_drift,
    resample,
    sequence_windows,
    tail_window,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.scaling import (  # noqa: F401
    apply_minmax,
    apply_standard,
    fit_minmax,
    fit_standard,
    inverse_minmax,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.dedup import (  # noqa: F401
    connected_components,
    dedup_keep_canonical,
    exact_dedup,
    minhash_lsh_dedup_pairs,
    simhash_codes,
    tokenset_dup_groups,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.multimodal import (  # noqa: F401
    decode_and_featurize,
    sample_frames,
    sniff_metadata,
)
