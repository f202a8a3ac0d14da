"""Host-side utilities: process logging, visualization, QA tools."""
