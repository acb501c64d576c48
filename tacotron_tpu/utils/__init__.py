"""Cross-cutting utilities: logging, moving averages, run-dir management,
plotting, parallel map (reference ``/root/reference/utils/``)."""

from .infolog import init as init_log, log
from .metrics import MetricsLogger, read_metrics
from .misc import (ValueWindow, parallel_run, prepare_dirs, str2bool,
                   get_git_revision_hash, get_git_diff)
from .tb_events import TBEventWriter, read_tb_scalars

__all__ = [
    "MetricsLogger", "TBEventWriter", "ValueWindow", "get_git_diff",
    "get_git_revision_hash", "init_log", "log", "parallel_run",
    "prepare_dirs", "read_metrics", "read_tb_scalars", "str2bool",
]
