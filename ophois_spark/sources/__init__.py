"""Sources and sinks: synthetic pages, line-record graph IO."""
