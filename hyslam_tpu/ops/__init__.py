"""Batched compute kernels (XLA + Pallas): feature extraction, descriptor
distances, matching, stereo — the [native-perf] components of SURVEY.md §2.5.
"""
