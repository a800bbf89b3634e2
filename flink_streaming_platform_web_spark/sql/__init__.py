"""SQL-script surface: splitter, statement classifier, validation —
the platform layer the reference implements itself (SURVEY §2.4)."""
