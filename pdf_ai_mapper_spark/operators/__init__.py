"""Spark DataFrame operators. Kernels stay in ``..kernels``; this layer
owns partitioning, UDF vectorization, and plan shape."""
