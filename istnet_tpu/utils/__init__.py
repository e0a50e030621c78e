from istnet_tpu.utils.config import Config
from istnet_tpu.utils.logging import LogBuffer, MetricWriter, get_logger

__all__ = ["Config", "LogBuffer", "MetricWriter", "get_logger"]
