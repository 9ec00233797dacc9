"""First-class benchmarking/profiling harness
(SURVEY.md §5: the reference has no profiler hooks, only wall-clock
timing in examples/python/basic/benchmarks.py; here per-op timing and
jax.profiler traces are a library module).

Run: ``python -m cupoch_tpu.bench [--trace DIR] [--pcd PATH]``.
"""
from .harness import BenchResult, run_benchmarks, time_op

__all__ = ["BenchResult", "run_benchmarks", "time_op"]
