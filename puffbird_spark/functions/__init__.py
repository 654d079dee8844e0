"""Column-expression libraries: text analysis and vector math, all built on
native ``pyspark.sql.functions`` (JVM-side, codegen-friendly) — no Python
UDFs in these hot paths."""
