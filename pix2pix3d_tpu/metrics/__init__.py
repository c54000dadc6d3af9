from .metric_main import calc_metric, register_metric, is_valid_metric, \
    list_valid_metrics
from .metric_utils import FeatureStats, MetricOptions
