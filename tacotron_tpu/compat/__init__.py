"""Interchange with the reference's TF1 checkpoint format."""

from .bundle import read_checkpoint, write_checkpoint
from .tf1 import import_tf1_checkpoint, map_tf1_variables

__all__ = ["import_tf1_checkpoint", "map_tf1_variables", "read_checkpoint",
           "write_checkpoint"]
