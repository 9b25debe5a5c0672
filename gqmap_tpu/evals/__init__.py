from .metrics import aepe, MetricsLogger
