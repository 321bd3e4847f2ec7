"""DataFrame-level operators (Spark-first; Python kernels only where the
built-in operators genuinely can't express the semantics)."""
