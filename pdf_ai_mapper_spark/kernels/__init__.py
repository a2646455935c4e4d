"""Pure per-row kernels. No Spark imports here — every function takes and
returns plain Python values so the same code is unit-testable standalone
and callable from Arrow pandas UDFs in ``..operators``."""
