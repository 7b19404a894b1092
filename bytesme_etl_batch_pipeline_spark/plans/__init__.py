"""Query catalog + config-driven pipeline runner."""
