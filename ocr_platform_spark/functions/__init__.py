"""Column-expression function libraries (JVM-side, codegen-friendly)."""
