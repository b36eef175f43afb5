from .metric import METRICS, Metric, MetricSet
from .disentanglement import (GroundTruthSampler, metric_dci,
                              metric_factor_vae, metric_mig, metric_sap)
