"""Utilities: args/config, rollout collection, plotting."""
