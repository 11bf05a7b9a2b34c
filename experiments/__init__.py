"""Closed-negative kernel research, kept OUT of the shipping package.

Nothing in ``glfusion_tpu/`` imports from here (pinned by
tests/test_utils.py::test_experiments_not_imported_by_package). See
experiments/README.md and BASELINE.md "stem kernel book" for the measured
verdicts that closed these designs.
"""
