"""Sources & sinks: file readers, table registry, state stores."""
