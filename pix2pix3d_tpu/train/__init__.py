from .stats import StatsAccumulator, Collector
from .ema import ema_update, ema_beta
from .lpips import LPIPS
