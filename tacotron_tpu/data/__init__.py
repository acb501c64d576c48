"""Data layer: offline .npz corpus builder + bucketed host-sharded feeder."""

from .builder import (BuildStats, build_from_path, process_utterance,
                      read_metadata, resolve_loss_coeffs)
from .feeder import DataFeeder, Example, scan_data_dirs

__all__ = [
    "BuildStats", "DataFeeder", "Example", "build_from_path",
    "process_utterance", "read_metadata", "resolve_loss_coeffs",
    "scan_data_dirs",
]
