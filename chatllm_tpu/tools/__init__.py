"""Offline tooling: perplexity harness, model inspection."""
