from istnet_tpu.utils.config import Config
from istnet_tpu.utils.io import write_obj
from istnet_tpu.utils.logging import LogBuffer, MetricWriter, get_logger
from istnet_tpu.utils.profiling import timed, trace

__all__ = ["Config", "LogBuffer", "MetricWriter", "get_logger", "timed",
           "trace", "write_obj"]
