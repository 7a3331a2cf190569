"""Column-expression library. Everything here returns pyspark Columns built
from JVM-side builtins (whole-stage codegen) — no Python UDFs in hot paths."""
