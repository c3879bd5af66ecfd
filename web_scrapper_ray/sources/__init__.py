"""Sources & sinks: synthetic content store, format readers/writers."""
