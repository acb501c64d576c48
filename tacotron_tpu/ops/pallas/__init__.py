"""Pallas TPU kernels for the hot ops."""

from .gru import gru_sequence, gru_sequence_ntd

__all__ = ["gru_sequence", "gru_sequence_ntd"]
