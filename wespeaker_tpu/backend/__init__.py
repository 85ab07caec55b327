from wespeaker_tpu.backend.calibration import QMFCalibrator, build_factors, cllr  # noqa: F401
from wespeaker_tpu.backend.embedding_processing import (  # noqa: F401
    EmbeddingProcessingChain,
)
from wespeaker_tpu.backend.metrics import (  # noqa: F401
    compute_metrics,
    eer,
    labels_from_strings,
    min_dcf,
    pmiss_pfa,
)
from wespeaker_tpu.backend.plda import TwoCovPLDA  # noqa: F401
from wespeaker_tpu.backend.scoring import (  # noqa: F401
    TrialScorer,
    asnorm_scores,
    cohort_mean_std,
    compute_mean_vec,
    cosine_scores,
    read_trials,
)
