"""Pallas TPU kernels for the hot detection ops (the native layer replacing the TF
C++ kernels the reference called, SURVEY.md §2 / §7)."""
