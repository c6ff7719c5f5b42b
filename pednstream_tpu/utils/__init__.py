from .logging_utils import setup_logger
from .profiling import StepTimer, trace_profile
from .checkpoint import save_engine_state, load_engine_state

__all__ = ["setup_logger", "StepTimer", "trace_profile",
           "save_engine_state", "load_engine_state"]
